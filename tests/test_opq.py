"""OPQ (learned-rotation PQ) tests — ops/opq.py + the rotation plumbing in
models/pq.py and parallel/sharded.py. Not a reference feature
(encoded_vectors_pq.rs has plain PQ only); the oracle bounds mirror
quantization/tests/test_pq.rs (dim * 0.05) because rotation leaves dot/L2
scores invariant, and the quality tests pin the reason OPQ exists: lower
reconstruction error and higher recall on anisotropic (low-rank) data."""

import json

import numpy as np
import pytest

from quantization_tpu.core.distances import pairwise_score
from quantization_tpu.core.types import (
    ArgumentsError,
    DistanceType,
    VectorParameters,
)
from quantization_tpu.models.pq import ProductQuantizer
from quantization_tpu.ops.opq import pca_allocation_init, train_opq
from quantization_tpu.ops import pq as pq_ops

COUNT = 513
DIM = 65
ERROR = DIM * 0.05


def lowrank_data(rng, count, dim, rank=8, noise=0.05):
    lat = rng.standard_normal((count, rank)).astype(np.float32)
    proj = rng.standard_normal((rank, dim)).astype(np.float32)
    return lat @ proj + noise * rng.standard_normal((count, dim)).astype(
        np.float32
    )


def reconstruction_mse(enc, data):
    rot = enc.metadata.rotation
    xr = data @ rot if rot is not None else data
    cc = np.asarray(enc._c_chunks)
    codes = np.asarray(enc.codes[: enc.count, : enc.num_chunks])
    rec = np.concatenate(
        [cc[c][codes[:, c]] for c in range(enc.num_chunks)], axis=1
    )[:, : data.shape[1]]
    return float(np.mean((xr - rec) ** 2))


@pytest.mark.parametrize("dt", [DistanceType.DOT, DistanceType.L2])
@pytest.mark.parametrize("invert", [False, True])
def test_opq_score_vs_oracle(rng, dt, invert):
    # Rotation leaves dot/L2 invariant, so the reference's PQ bound
    # (test_pq.rs:18) applies unchanged to rotated codes.
    data = rng.random((COUNT, DIM), dtype=np.float32)
    query = rng.random((1, DIM), dtype=np.float32)
    params = VectorParameters(DIM, COUNT, dt, invert)
    enc = ProductQuantizer.encode(data, params, chunk_size=1, rotation="opq")
    got = np.asarray(enc.score_batch(enc.encode_query(query)))[0]
    want = np.asarray(pairwise_score(query, data, dt, invert))[0]
    np.testing.assert_allclose(got, want, atol=ERROR)


def test_opq_rotation_is_orthogonal_and_serialized(rng, tmp_path):
    data = lowrank_data(rng, COUNT, DIM)
    params = VectorParameters(DIM, COUNT, DistanceType.DOT, False)
    enc = ProductQuantizer.encode(data, params, chunk_size=8, rotation="opq")
    rot = enc.metadata.rotation
    assert rot is not None and rot.shape == (DIM, DIM)
    np.testing.assert_allclose(rot @ rot.T, np.eye(DIM), atol=1e-4)
    enc.save(tmp_path / "d.bin", tmp_path / "m.json")
    meta = json.loads((tmp_path / "m.json").read_text())
    assert "rotation" in meta
    # Plain PQ stays byte-compatible with reference-written metadata: no
    # rotation key at all.
    plain = ProductQuantizer.encode(data, params, chunk_size=8)
    plain.save(tmp_path / "p.bin", tmp_path / "p.json")
    assert "rotation" not in json.loads((tmp_path / "p.json").read_text())


def test_opq_save_load_roundtrip(rng, tmp_path):
    data = lowrank_data(rng, COUNT, DIM)
    queries = lowrank_data(rng, 8, DIM)
    params = VectorParameters(DIM, COUNT, DistanceType.L2, True)
    enc = ProductQuantizer.encode(data, params, chunk_size=8, rotation="opq")
    enc.save(tmp_path / "d.bin", tmp_path / "m.json")
    back = ProductQuantizer.load(tmp_path / "d.bin", tmp_path / "m.json", params)
    np.testing.assert_array_equal(
        np.asarray(enc.codes), np.asarray(back.codes)
    )
    a = np.asarray(enc.score_batch(enc.encode_query(queries)))
    b = np.asarray(back.score_batch(back.encode_query(queries)))
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-5)


def test_opq_improves_lowrank_quantization(rng):
    # The reason OPQ exists: on low-effective-rank data the learned
    # rotation concentrates correlated variance inside chunks. Measured
    # ratio on this config is ~0.01-0.1; assert a conservative 0.5.
    data = lowrank_data(rng, 4000, 64)
    queries = lowrank_data(rng, 64, 64)
    params = VectorParameters(64, 4000, DistanceType.DOT, False)
    pq = ProductQuantizer.encode(data, params, chunk_size=8)
    opq = ProductQuantizer.encode(data, params, chunk_size=8, rotation="opq")
    assert reconstruction_mse(opq, data) < 0.5 * reconstruction_mse(pq, data)
    k = 10
    gt = np.argsort(-(queries @ data.T), axis=1)[:, :k]

    def recall(enc):
        _, ids = enc.top_k(enc.encode_query(queries), k)
        ids = np.asarray(ids)
        return np.mean(
            [len(set(ids[r]) & set(gt[r])) / k for r in range(len(gt))]
        )

    assert recall(opq) >= recall(pq)


def test_opq_l1_rejected(rng):
    data = rng.random((COUNT, DIM), dtype=np.float32)
    params = VectorParameters(DIM, COUNT, DistanceType.L1, False)
    with pytest.raises(ArgumentsError):
        ProductQuantizer.encode(data, params, chunk_size=8, rotation="opq")


def test_explicit_rotation_matrix(rng):
    data = rng.random((COUNT, DIM), dtype=np.float32)
    query = rng.random((1, DIM), dtype=np.float32)
    params = VectorParameters(DIM, COUNT, DistanceType.DOT, False)
    q, _ = np.linalg.qr(rng.standard_normal((DIM, DIM)))
    rot = q.astype(np.float32)
    enc = ProductQuantizer.encode(data, params, chunk_size=1, rotation=rot)
    np.testing.assert_allclose(enc.metadata.rotation, rot)
    got = np.asarray(enc.score_batch(enc.encode_query(query)))[0]
    want = np.asarray(
        pairwise_score(query, data, DistanceType.DOT, False)
    )[0]
    np.testing.assert_allclose(got, want, atol=ERROR)
    with pytest.raises(ArgumentsError):
        ProductQuantizer.encode(
            data, params, chunk_size=1, rotation=rot[:, :-1]
        )
    with pytest.raises(ArgumentsError):
        ProductQuantizer.encode(
            data, params, chunk_size=1, rotation=rot * 2.0
        )
    with pytest.raises(ArgumentsError):
        ProductQuantizer.encode(data, params, chunk_size=1, rotation="nope")


def test_opq_count_le_k_fallback(rng):
    # count <= 256: centroids are the points themselves (rs:290-297) and
    # quantization is lossless, so "opq" has nothing to learn — it degrades
    # to identity; an explicit matrix still applies (rotated points stored).
    data = rng.random((100, 16), dtype=np.float32)
    params = VectorParameters(16, 100, DistanceType.DOT, False)
    enc = ProductQuantizer.encode(data, params, chunk_size=4, rotation="opq")
    assert enc.metadata.rotation is None
    q, _ = np.linalg.qr(rng.standard_normal((16, 16)))
    enc2 = ProductQuantizer.encode(
        data, params, chunk_size=4, rotation=q.astype(np.float32)
    )
    assert enc2.metadata.rotation is not None
    query = rng.random((1, 16), dtype=np.float32)
    got = np.asarray(enc2.score_batch(enc2.encode_query(query)))[0]
    want = np.asarray(
        pairwise_score(query, data, DistanceType.DOT, False)
    )[0]
    np.testing.assert_allclose(got, want, atol=1e-2)


def test_pca_allocation_init_orthogonal(rng):
    data = lowrank_data(rng, 500, 32)
    division = pq_ops.get_vector_division(32, 4)
    rot = pca_allocation_init(data, division)
    np.testing.assert_allclose(rot @ rot.T, np.eye(32), atol=1e-5)


def test_train_opq_reduces_objective(rng):
    # The alternating refinement must not end worse than its PCA init:
    # compare ||XR - Xhat||^2 of the trained (R, centroids) against a
    # plain-PQ fit of the same sample.
    data = lowrank_data(rng, 1000, 32)
    division = pq_ops.get_vector_division(32, 4)
    rot, cents = train_opq(data, division, 16, seed=0)
    xr = data @ rot
    cc = pq_ops.centroids_to_chunks(cents, division)
    codes = np.asarray(
        pq_ops.encode_batch(pq_ops.chunk_tensor(xr, division), cc)
    )
    rec = np.concatenate(
        [cc[c][codes[:, c]] for c in range(len(division))], axis=1
    )
    opq_err = float(np.mean((xr - rec) ** 2))

    from quantization_tpu.ops.kmeans import kmeans_batched

    plain_cc = np.asarray(
        kmeans_batched(pq_ops.chunk_tensor(data, division), 16, seed=0)
    )
    plain_codes = np.asarray(
        pq_ops.encode_batch(pq_ops.chunk_tensor(data, division), plain_cc)
    )
    plain_rec = np.concatenate(
        [plain_cc[c][plain_codes[:, c]] for c in range(len(division))], axis=1
    )
    plain_err = float(np.mean((data - plain_rec) ** 2))
    assert opq_err < plain_err


def test_sharded_opq_matches_single_device(rng, tmp_path):
    # Same data + seed => identical rotation/centroids/codes on the
    # sharded-native path, and the sharded blob round-trips into the
    # single-device class with the rotation intact.
    import jax
    from quantization_tpu.parallel.sharded import ShardedProductQuantizer

    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device mesh")
    dim, count = 32, 1200
    data = lowrank_data(rng, count, dim)
    queries = lowrank_data(rng, 16, dim)
    params = VectorParameters(dim, count, DistanceType.DOT, False)
    single = ProductQuantizer.encode(
        data, params, chunk_size=4, rotation="opq", seed=3
    )
    shard = ShardedProductQuantizer.encode(
        data, params, chunk_size=4, rotation="opq", seed=3
    )
    np.testing.assert_allclose(
        shard.metadata.rotation, single.metadata.rotation, atol=1e-6
    )
    k = 10
    sv, si = single.top_k(single.encode_query(queries), k)
    hv, hi = shard.top_k(shard.encode_query(queries), k)
    np.testing.assert_allclose(np.asarray(sv), np.asarray(hv), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(si), np.asarray(hi))

    shard.save(tmp_path / "d.bin", tmp_path / "m.json")
    back = ProductQuantizer.load(tmp_path / "d.bin", tmp_path / "m.json", params)
    assert back.metadata.rotation is not None
    bv, bi = back.top_k(back.encode_query(queries), k)
    np.testing.assert_array_equal(np.asarray(bi), np.asarray(si))

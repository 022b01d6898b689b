"""Distributed scoring tests on the 8-device virtual CPU mesh — the
fake-cluster testing the reference has no equivalent of (SURVEY.md §4)."""

import jax
import numpy as np
import pytest

from quantization_tpu import DistanceType, ScalarQuantizerU8, VectorParameters
from quantization_tpu.core.distances import pairwise_score
from quantization_tpu.models.bq import BinaryQuantizer
from quantization_tpu.models.pq import ProductQuantizer
from quantization_tpu.parallel.sharded import (
    ShardedBinaryQuantizer,
    ShardedProductQuantizer,
    ShardedScalarQuantizer,
    make_mesh,
)


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device platform")
    return make_mesh()


@pytest.mark.parametrize("dt", [DistanceType.DOT, DistanceType.L1, DistanceType.L2])
def test_sharded_topk_matches_single_device(rng, mesh, dt):
    n, dim, q, k = 333, 40, 3, 7  # n deliberately not divisible by 8
    data = rng.random((n, dim), dtype=np.float32)
    queries = rng.random((q, dim), dtype=np.float32)
    invert = dt != DistanceType.DOT
    params = VectorParameters(dim, n, dt, invert)
    enc = ScalarQuantizerU8.encode(data, params)
    sharded = ShardedScalarQuantizer(enc, mesh)

    eq = enc.encode_query(queries)
    s_ref, i_ref = enc.top_k(eq, k)
    s_got, i_got = sharded.top_k(eq, k)
    np.testing.assert_allclose(s_got, s_ref, rtol=1e-5, atol=1e-4)
    # Indices may differ on exact ties; scores must match rank-for-rank.


def test_sharded_bq_matches_single_device(rng, mesh):
    n, dim, k = 333, 70, 9
    data = np.sign(rng.random((n, dim), dtype=np.float32) - 0.5)
    queries = np.sign(rng.random((3, dim), dtype=np.float32) - 0.5)
    params = VectorParameters(dim, n, DistanceType.L2, True)
    enc = BinaryQuantizer.encode(data, params)
    sharded = ShardedBinaryQuantizer(enc, mesh)
    eq = enc.encode_query(queries)
    s_ref, _ = enc.top_k(eq, k)
    s_got, i_got = sharded.top_k(eq, k)
    np.testing.assert_allclose(s_got, s_ref, atol=1e-5)
    assert i_got.max() < n


def test_sharded_pq_matches_single_device(rng, mesh):
    n, dim, k = 300, 32, 7
    data = rng.random((n, dim), dtype=np.float32)
    queries = rng.random((2, dim), dtype=np.float32)
    params = VectorParameters(dim, n, DistanceType.L2, True)
    enc = ProductQuantizer.encode(data, params, chunk_size=4)
    sharded = ShardedProductQuantizer(enc, mesh)
    eq = enc.encode_query(queries)
    s_ref, _ = enc.top_k(eq, k)
    s_got, i_got = sharded.top_k(eq, k)
    np.testing.assert_allclose(s_got, s_ref, rtol=1e-5, atol=1e-4)
    assert i_got.max() < n


def test_sharded_topk_quality(rng, mesh):
    n, dim = 1000, 64
    data = rng.random((n, dim), dtype=np.float32)
    queries = rng.random((2, dim), dtype=np.float32)
    params = VectorParameters(dim, n, DistanceType.L2, True)
    enc = ScalarQuantizerU8.encode(data, params)
    sharded = ShardedScalarQuantizer(enc, mesh)
    s, i = sharded.top_k(enc.encode_query(queries), 10)
    want = np.asarray(pairwise_score(queries, data, DistanceType.L2, True))
    exact = np.argsort(-want, axis=1)[:, :10]
    for row in range(2):
        assert len(set(i[row]) & set(exact[row])) >= 8
    # No padded (out-of-range) indices may leak out.
    assert i.max() < n

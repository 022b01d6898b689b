"""End-to-end quantizer-level parity: the model score path with the Pallas
backend forced (interpreted off-TPU) must match the XLA path bit-for-bit
(dot/BQ) or within bf16 LUT tolerance (PQ)."""

import numpy as np
import pytest

from quantization_tpu.core.types import DistanceType, VectorParameters
from quantization_tpu.models.bq import BinaryQuantizer
from quantization_tpu.models.pq import ProductQuantizer
from quantization_tpu.models.sq import ScalarQuantizerU8


@pytest.fixture
def force_pallas(monkeypatch):
    monkeypatch.setenv("QTPU_FORCE_PALLAS", "1")
    yield
    monkeypatch.delenv("QTPU_FORCE_PALLAS", raising=False)


@pytest.mark.parametrize("dt", [DistanceType.DOT, DistanceType.L1])
def test_sq_model_pallas_path(rng, force_pallas, monkeypatch, dt):
    n, dim = 600, 65
    data = rng.random((n, dim), dtype=np.float32)
    q = rng.random((3, dim), dtype=np.float32)
    enc = ScalarQuantizerU8.encode(data, VectorParameters(dim, n, dt, False))
    eq = enc.encode_query(q)
    got = np.asarray(enc.score_batch(eq))
    monkeypatch.setenv("QTPU_DISABLE_PALLAS", "1")
    monkeypatch.delenv("QTPU_FORCE_PALLAS", raising=False)
    want = np.asarray(enc.score_batch(eq))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-4)


def test_bq_model_pallas_path(rng, force_pallas, monkeypatch):
    n, dim = 500, 130
    data = np.sign(rng.random((n, dim), dtype=np.float32) - 0.5)
    q = np.sign(rng.random((2, dim), dtype=np.float32) - 0.5)
    enc = BinaryQuantizer.encode(
        data, VectorParameters(dim, n, DistanceType.L2, True)
    )
    eq = enc.encode_query(q)
    got = np.asarray(enc.score_batch(eq))
    monkeypatch.setenv("QTPU_DISABLE_PALLAS", "1")
    monkeypatch.delenv("QTPU_FORCE_PALLAS", raising=False)
    want = np.asarray(enc.score_batch(eq))
    np.testing.assert_array_equal(got, want)


def test_pq_model_pallas_path(rng, force_pallas, monkeypatch):
    n, dim = 400, 32
    data = rng.random((n, dim), dtype=np.float32)
    q = rng.random((2, dim), dtype=np.float32)
    enc = ProductQuantizer.encode(
        data, VectorParameters(dim, n, DistanceType.L2, True), chunk_size=2
    )
    eq = enc.encode_query(q)
    got = np.asarray(enc.score_batch(eq))
    monkeypatch.setenv("QTPU_DISABLE_PALLAS", "1")
    monkeypatch.delenv("QTPU_FORCE_PALLAS", raising=False)
    want = np.asarray(enc.score_batch(eq))
    np.testing.assert_allclose(got, want, atol=np.abs(want).max() * 1e-2 + 1e-3)

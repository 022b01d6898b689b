"""Native C++ ingestion helper tests: build via g++, parity vs the device
encoder (codes bit-identical, offsets within float-sum tolerance)."""

import numpy as np
import pytest

from quantization_tpu.core.types import DistanceType, VectorParameters
from quantization_tpu.models.sq import ScalarQuantizerU8
from quantization_tpu.native import loader
from quantization_tpu.ops import bq as bq_ops

needs_native = pytest.mark.skipif(
    not loader.available(), reason="native toolchain unavailable"
)


@needs_native
@pytest.mark.parametrize("dt", [DistanceType.DOT, DistanceType.L1, DistanceType.L2])
def test_native_quantize_matches_device(rng, dt):
    # The native encoder is the IEEE-exact reference-interop path; the
    # device encoder uses a reciprocal multiply (XLA's divide is not
    # correctly rounded either way), so codes may differ by one at exact
    # quantization boundaries — everywhere else they must agree.
    n, dim = 257, 65
    data = rng.random((n, dim), dtype=np.float32) * 3 - 1
    params = VectorParameters(dim, n, dt, False)
    dev = ScalarQuantizerU8.encode(data, params)
    nat = ScalarQuantizerU8.encode(data, params, use_native=True)
    diff = np.abs(
        np.asarray(dev.codes, np.int32) - np.asarray(nat.codes, np.int32)
    )
    assert diff.max() <= 1
    assert (diff != 0).mean() < 0.01
    np.testing.assert_allclose(
        np.asarray(dev.voffsets), np.asarray(nat.voffsets), rtol=1e-5, atol=1e-2
    )


@needs_native
def test_native_pack_bits_matches_numpy(rng):
    n, dim = 100, 197
    data = rng.standard_normal((n, dim)).astype(np.float32)
    row_bytes = bq_ops.storage_bytes(dim)
    np.testing.assert_array_equal(
        loader.pack_bits(data, row_bytes), bq_ops.pack_rows(data, row_bytes)
    )


@needs_native
def test_native_min_max(rng):
    data = rng.standard_normal((50, 20)).astype(np.float32)
    mn, mx = loader.min_max(data)
    assert mn == data.min() and mx == data.max()


@needs_native
def test_native_cpu_scan_matches_device(rng):
    n, dim = 300, 64
    data = rng.random((n, dim), dtype=np.float32)
    q = rng.random((dim,), dtype=np.float32)
    params = VectorParameters(dim, n, DistanceType.DOT, False)
    enc = ScalarQuantizerU8.encode(data, params)
    eq = enc.encode_query(q)
    want = np.asarray(enc.score_batch(eq))[0]
    got = loader.cpu_scan_dot_u8(
        np.asarray(eq.codes)[0].view(np.uint8),
        np.asarray(enc.codes[: enc.count]).view(np.uint8),
        enc.metadata.multiplier,
        float(np.asarray(eq.offsets)[0]),
        np.asarray(enc.voffsets[: enc.count]),
    )
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-4)

    f32 = loader.cpu_scan_dot_f32(q, data)
    np.testing.assert_allclose(f32, data @ q, rtol=1e-5, atol=1e-4)


@needs_native
def test_native_xor_popcount(rng):
    a = rng.integers(0, 256, 37, dtype=np.uint8)
    b = rng.integers(0, 256, 37, dtype=np.uint8)
    want = int(np.unpackbits(np.bitwise_xor(a, b)).sum())
    assert loader.xor_popcount(a, b) == want

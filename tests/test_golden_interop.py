"""Golden-file interop: byte-level on-disk compatibility with the reference.

Cargo is unavailable in this image, so the "reference-written" fixtures are
produced by independent numpy re-implementations of the reference's encode
paths, written directly from the Rust sources:

  * SQ rows  [f32 voffset | u8 codes to 16-aligned actual_dim]
    (encoded_vectors_u8.rs:78-117, ALIGNMENT=16 at :12)
  * BQ rows  LE-bit-packed sign bits at the word-tier row size
    (encoded_vectors_binary.rs:99-116,193-208)
  * PQ rows  one u8 code per chunk (encoded_vectors_pq.rs:136-164), with
    the count<=256 centroid fallback (:290-297)

Each fixture is loaded through the public ``load`` API and checked against
the exact f32 oracle; the write direction is pinned by asserting our
``save`` produces byte-identical blobs / size-exact rows for the same data.
"""

from __future__ import annotations

import json

import numpy as np
import pytest

from quantization_tpu import (
    BinaryQuantizer,
    DistanceType,
    ProductQuantizer,
    ScalarQuantizerU8,
    VectorParameters,
)
from quantization_tpu.core.distances import pairwise_score


# ---------------------------------------------------------------------------
# Reference-semantics writers (numpy, independent of the package under test)
# ---------------------------------------------------------------------------

REF_ALIGNMENT = 16  # encoded_vectors_u8.rs:12


def ref_sq_write(data: np.ndarray, dt: DistanceType, invert: bool):
    """encoded_vectors_u8.rs:34-140 in numpy: returns (blob bytes, meta dict)."""
    count, dim = data.shape
    actual_dim = dim + (REF_ALIGNMENT - dim % REF_ALIGNMENT) % REF_ALIGNMENT
    mn = np.float32(data.min())
    mx = np.float32(data.max())
    alpha = np.float32((mx - mn) / np.float32(127.0))
    offset = mn

    def f32_to_u8(v):
        q = (np.float32(v) - offset) / alpha
        return np.uint8(np.clip(q, 0.0, 127.0))  # trunc toward zero, `as u8`

    placeholder = np.float32(0.0) if dt == DistanceType.DOT else offset
    rows = bytearray()
    for r in range(count):
        codes = [f32_to_u8(v) for v in data[r]]
        codes += [f32_to_u8(placeholder)] * (actual_dim - dim)
        codes = np.asarray(codes, np.uint8)
        # f32 sequential sums, like the Rust iterator fold
        if dt == DistanceType.DOT:
            s = np.float32(0.0)
            for c in codes:
                s += np.float32(c)
            voff = np.float32(actual_dim) * offset * offset + s * alpha * offset
        elif dt == DistanceType.L1:
            voff = np.float32(0.0)
        else:
            s = np.float32(0.0)
            for c in codes:
                s += np.float32(c) * np.float32(c)
            voff = np.float32(actual_dim) * offset * offset + s * alpha * alpha
        if invert:
            voff = -voff
        rows += np.float32(voff).tobytes() + codes.tobytes()
    if dt == DistanceType.DOT:
        mult = alpha * alpha
    elif dt == DistanceType.L1:
        mult = alpha
    else:
        mult = np.float32(-2.0) * alpha * alpha
    if invert:
        mult = -mult
    meta = {
        "actual_dim": actual_dim,
        "alpha": float(alpha),
        "offset": float(offset),
        "multiplier": float(mult),
        "vector_parameters": {
            "dim": dim,
            "count": count,
            "distance_type": dt.to_json(),
            "invert": invert,
        },
    }
    return bytes(rows), meta


def ref_bq_row_bytes(dim: int, store_type: str) -> int:
    """encoded_vectors_binary.rs:99-116 (u8 tier) / :152-159 (u128)."""
    if store_type == "u8":
        word = 16 if dim > 128 else 8 if dim > 64 else 4 if dim > 32 else 1
    else:
        word = 16
    bits = 8 * word
    return (dim // bits + (1 if dim % bits else 0)) * word


def ref_bq_write(data: np.ndarray, store_type: str) -> bytes:
    """LE bit order sign packing (encoded_vectors_binary.rs:193-208)."""
    count, dim = data.shape
    row_bytes = ref_bq_row_bytes(dim, store_type)
    rows = np.zeros((count, row_bytes), np.uint8)
    for r in range(count):
        for j in range(dim):
            if data[r, j] > 0.0:
                rows[r, j // 8] |= np.uint8(1 << (j % 8))
    return rows.tobytes()


# ---------------------------------------------------------------------------
# SQ
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("dt", [DistanceType.DOT, DistanceType.L2])
@pytest.mark.parametrize("dim", [10, 65, 128])
def test_sq_load_reference_written_file(tmp_path, rng, dt, dim):
    count = 33
    data = rng.random((count, dim), dtype=np.float32) - 0.25
    blob, meta = ref_sq_write(data, dt, invert=False)
    (tmp_path / "golden.bin").write_bytes(blob)
    (tmp_path / "golden.json").write_text(json.dumps(meta))

    params = VectorParameters(dim, count, dt, False)
    enc = ScalarQuantizerU8.load(
        tmp_path / "golden.bin", tmp_path / "golden.json", params
    )
    q = rng.random((4, dim), dtype=np.float32)
    scores = np.asarray(enc.score_batch(enc.encode_query(q)))
    exact = np.asarray(pairwise_score(q, data, dt, False))
    assert np.max(np.abs(scores - exact)) < dim * 0.1


@pytest.mark.parametrize("dt", [DistanceType.DOT, DistanceType.L1, DistanceType.L2])
@pytest.mark.parametrize("invert", [False, True])
@pytest.mark.parametrize("dim", [10, 65])
@pytest.mark.parametrize("use_native", [False, True])
def test_sq_save_matches_reference_layout(
    tmp_path, rng, dt, invert, dim, use_native
):
    """Write direction (VERDICT r1 #4): a blob written by our save() must use
    the reference's exact layout — 16-aligned rows, count*(actual_dim+4)
    bytes — so the reference load()'s exact-size check passes. The native
    host encoder (IEEE division, sequential f32 folds) must additionally be
    BYTE-IDENTICAL to the reference writer; the device encoder may differ
    by one code at exact quantization boundaries (XLA's divide is not
    correctly rounded) and by f32 reduction order in voffsets."""
    if use_native:
        from quantization_tpu.native import loader

        if not loader.available():
            pytest.skip("native toolchain unavailable")
    count = 17
    data = rng.random((count, dim), dtype=np.float32) - 0.25
    ref_blob, ref_meta = ref_sq_write(data, dt, invert)

    params = VectorParameters(dim, count, dt, invert)
    enc = ScalarQuantizerU8.encode(data, params, use_native=use_native)
    enc.save(tmp_path / "ours.bin", tmp_path / "ours.json")
    ours = (tmp_path / "ours.bin").read_bytes()

    actual_dim = dim + (-dim) % REF_ALIGNMENT
    assert len(ours) == count * (actual_dim + 4)  # reference size check
    assert enc.metadata.actual_dim == actual_dim

    ours_rows = np.frombuffer(ours, np.uint8).reshape(count, actual_dim + 4)
    ref_rows = np.frombuffer(ref_blob, np.uint8).reshape(count, actual_dim + 4)
    if use_native:
        assert ours == ref_blob  # byte-for-byte, voffsets included
    else:
        diff = np.abs(
            ours_rows[:, 4:].astype(np.int32) - ref_rows[:, 4:].astype(np.int32)
        )
        assert diff.max() <= 1  # boundary-tie codes only
        assert (diff != 0).mean() < 0.02
        ours_voff = ours_rows[:, :4].copy().view(np.float32).ravel()
        ref_voff = ref_rows[:, :4].copy().view(np.float32).ravel()
        # Each allowed boundary-tie code flip moves the row's voffset by
        # up to alpha*|offset| (DOT: code*alpha*offset term) or
        # alpha^2*(2*127+1) (L2: code^2*alpha^2 term) — the tolerance
        # must cover the flips this test explicitly permits above.
        alpha = enc.metadata.alpha
        off = enc.metadata.offset
        per_flip = alpha * max(abs(off), 255.0 * alpha)
        flips = (diff != 0).sum(axis=1).astype(np.float64)
        allowed = flips * per_flip + 1e-2 + 1e-5 * np.abs(ref_voff)
        assert np.all(np.abs(ours_voff - ref_voff) <= allowed), (
            np.abs(ours_voff - ref_voff) - allowed
        )

    our_meta = json.loads((tmp_path / "ours.json").read_text())
    assert our_meta["actual_dim"] == ref_meta["actual_dim"]
    assert our_meta["vector_parameters"] == ref_meta["vector_parameters"]
    np.testing.assert_allclose(our_meta["alpha"], ref_meta["alpha"], rtol=1e-6)
    np.testing.assert_allclose(
        our_meta["multiplier"], ref_meta["multiplier"], rtol=1e-6
    )


def test_sq_golden_roundtrip_bytes(tmp_path, rng):
    """load(reference file) -> save must reproduce the file byte-for-byte."""
    dim, count = 40, 9
    data = rng.random((count, dim), dtype=np.float32)
    blob, meta = ref_sq_write(data, DistanceType.DOT, invert=False)
    (tmp_path / "g.bin").write_bytes(blob)
    (tmp_path / "g.json").write_text(json.dumps(meta))
    params = VectorParameters(dim, count, DistanceType.DOT, False)
    enc = ScalarQuantizerU8.load(tmp_path / "g.bin", tmp_path / "g.json", params)
    enc.save(tmp_path / "rt.bin", tmp_path / "rt.json")
    assert (tmp_path / "rt.bin").read_bytes() == blob


# ---------------------------------------------------------------------------
# BQ
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("store_type", ["u8", "u128"])
@pytest.mark.parametrize("dim", [10, 33, 65, 140])
def test_bq_golden_bytes_both_tiers(tmp_path, rng, dim, store_type):
    count = 21
    data = (rng.random((count, dim), dtype=np.float32) - 0.5) * 2.0
    golden = ref_bq_write(data, store_type)

    params = VectorParameters(dim, count, DistanceType.DOT, False)
    enc = BinaryQuantizer.encode(data, params, store_type=store_type)
    enc.save(tmp_path / "b.bin", tmp_path / "b.json")
    assert (tmp_path / "b.bin").read_bytes() == golden

    loaded = BinaryQuantizer.load(
        tmp_path / "b.bin", tmp_path / "b.json", params, store_type=store_type
    )
    q = (rng.random((3, dim), dtype=np.float32) - 0.5) * 2.0
    s1 = np.asarray(enc.score_batch(enc.encode_query(q)))
    s2 = np.asarray(loaded.score_batch(loaded.encode_query(q)))
    np.testing.assert_array_equal(s1, s2)


def test_bq_load_reference_written_file(tmp_path, rng):
    dim, count = 100, 15
    data = (rng.random((count, dim), dtype=np.float32) - 0.5) * 2.0
    golden = ref_bq_write(data, "u128")
    (tmp_path / "g.bin").write_bytes(golden)
    params = VectorParameters(dim, count, DistanceType.DOT, False)
    (tmp_path / "g.json").write_text(
        json.dumps({"vector_parameters": params.to_json()})
    )
    enc = BinaryQuantizer.load(tmp_path / "g.bin", tmp_path / "g.json", params)
    # Metric check vs hand-computed hamming map d - 2*xor
    # (encoded_vectors_binary.rs:219-253).
    q = (rng.random((dim,), dtype=np.float32) - 0.5) * 2.0
    qbits = (q > 0).astype(np.int64)
    dbits = (data > 0).astype(np.int64)
    xor = np.sum(qbits[None, :] != dbits, axis=1)
    expected = dim - 2.0 * xor
    got = np.asarray(enc.score_batch(enc.encode_query(q))).ravel()
    np.testing.assert_allclose(got, expected)


# ---------------------------------------------------------------------------
# PQ
# ---------------------------------------------------------------------------


def test_pq_load_reference_written_file(tmp_path, rng):
    """Hand-built PQ fixture using the count<=256 fallback: centroids are
    the points themselves zero-filled to 256 (encoded_vectors_pq.rs:290-297),
    so each point's code is its own index and scores are exactly the
    chunkwise LUT sums."""
    dim, count, chunk = 8, 5, 2
    data = rng.random((count, dim), dtype=np.float32)
    m = dim // chunk
    centroids = np.zeros((256, dim), np.float32)
    centroids[:count] = data
    division = [{"start": i * chunk, "end": (i + 1) * chunk} for i in range(m)]
    codes = np.tile(np.arange(count, dtype=np.uint8)[:, None], (1, m))
    meta = {
        "centroids": [[float(v) for v in row] for row in centroids],
        "vector_division": division,
        "vector_parameters": {
            "dim": dim,
            "count": count,
            "distance_type": "Dot",
            "invert": False,
        },
    }
    (tmp_path / "g.bin").write_bytes(codes.tobytes())
    (tmp_path / "g.json").write_text(json.dumps(meta))

    params = VectorParameters(dim, count, DistanceType.DOT, False)
    enc = ProductQuantizer.load(tmp_path / "g.bin", tmp_path / "g.json", params)
    q = rng.random((2, dim), dtype=np.float32)
    got = np.asarray(enc.score_batch(enc.encode_query(q)))
    # codes decode to the original points exactly -> scores are exact dots
    expected = np.asarray(pairwise_score(q, data, DistanceType.DOT, False))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)


def test_pq_save_row_size_matches_reference(tmp_path, rng):
    dim, count, chunk = 16, 300, 2
    data = rng.random((count, dim), dtype=np.float32)
    params = VectorParameters(dim, count, DistanceType.L2, False)
    enc = ProductQuantizer.encode(data, params, chunk_size=chunk)
    enc.save(tmp_path / "p.bin", tmp_path / "p.json")
    m = dim // chunk
    # reference row size = vector_division.len() bytes (encoded_vectors_pq.rs:515)
    assert (tmp_path / "p.bin").stat().st_size == count * m
    meta = json.loads((tmp_path / "p.json").read_text())
    assert len(meta["vector_division"]) == m
    assert meta["vector_division"][0] == {"start": 0, "end": chunk}
    assert len(meta["centroids"]) == 256
    assert "bits" not in meta  # absent in reference-written files

"""Pallas kernel parity tests (interpret mode off-TPU) — the analogue of the
reference's per-ISA suites (tests/test_sse.rs / test_avx2.rs / test_neon.rs):
each hand-tiled kernel is pinned against the portable XLA implementation."""

import jax.numpy as jnp
import numpy as np
import pytest

from quantization_tpu.core.types import DistanceType
from quantization_tpu.ops import bq as bq_ops
from quantization_tpu.ops import pq as pq_ops
from quantization_tpu.ops import sq as sq_ops
from quantization_tpu.ops.pallas.bq_kernel import TILE_N as BQ_TILE, bq_scores_pallas
from quantization_tpu.ops.pallas.pq_kernel import (
    M_BLK,
    TILE_N as PQ_TILE,
    pq_scores_pallas,
)
from quantization_tpu.ops.pallas.sq_kernel import TILE_N as SQ_TILE, sq_scores_pallas
from quantization_tpu.utils.padding import round_up


@pytest.mark.parametrize("dt", [DistanceType.DOT, DistanceType.L1, DistanceType.L2])
@pytest.mark.parametrize("q", [1, 5])
def test_sq_kernel_matches_xla(rng, dt, q):
    n_valid, d = 700, 256
    npad = round_up(n_valid, SQ_TILE)
    codes = np.zeros((npad, d), np.int8)
    codes[:n_valid] = rng.integers(0, 128, (n_valid, d), dtype=np.int8)
    voff = np.zeros((npad,), np.float32)
    voff[:n_valid] = rng.random(n_valid, dtype=np.float32)
    qcodes = rng.integers(0, 128, (q, d), dtype=np.int8)
    qoff = rng.random(q, dtype=np.float32)
    mult = jnp.float32(0.37)

    want = np.asarray(
        sq_ops.score_batch_xla(
            jnp.asarray(qcodes),
            jnp.asarray(qoff),
            jnp.asarray(codes[:n_valid]),
            jnp.asarray(voff[:n_valid]),
            mult,
            distance_type=dt,
        )
    )
    got = np.asarray(
        sq_scores_pallas(
            jnp.asarray(qcodes),
            jnp.asarray(qoff),
            jnp.asarray(codes),
            jnp.asarray(voff),
            mult,
            distance_type=dt,
            n_valid=n_valid,
            interpret=True,
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-4)


@pytest.mark.parametrize("dt", [DistanceType.DOT, DistanceType.L2])
@pytest.mark.parametrize("invert", [False, True])
def test_bq_kernel_matches_xla(rng, dt, invert):
    dim, n_valid, q = 193, 300, 3
    row_bytes = bq_ops.storage_bytes(dim, "u128")
    data = np.sign(rng.random((n_valid, dim), dtype=np.float32) - 0.5)
    rows = bq_ops.pack_rows(data, row_bytes)
    planes = bq_ops.rows_to_planes(rows)  # [W, n]
    npad = round_up(n_valid, BQ_TILE)
    planes_p = np.zeros((planes.shape[0], npad), planes.dtype)
    planes_p[:, :n_valid] = planes
    qdata = np.sign(rng.random((q, dim), dtype=np.float32) - 0.5)
    qrows = bq_ops.pack_rows(qdata, row_bytes)
    qplanes = bq_ops.rows_to_planes(qrows).T.copy()  # [q, W]

    want = np.asarray(
        bq_ops.score_batch_xla(
            jnp.asarray(qplanes),
            jnp.asarray(planes),
            distance_type=dt,
            invert=invert,
            dim=dim,
        )
    )
    got = np.asarray(
        bq_scores_pallas(
            jnp.asarray(qplanes),
            jnp.asarray(planes_p),
            distance_type=dt,
            invert=invert,
            dim=dim,
            n_valid=n_valid,
            interpret=True,
        )
    )
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("dt", [DistanceType.DOT, DistanceType.L2])
@pytest.mark.parametrize("k", [1, 10])
def test_sq_fused_search_matches_score_then_topk(rng, dt, k):
    from quantization_tpu.ops.pallas.sq_kernel import sq_search_pallas
    from quantization_tpu.ops.topk import topk_exact

    n_valid, d, q = 700, 256, 5
    npad = round_up(n_valid, SQ_TILE)
    codes = np.zeros((npad, d), np.int8)
    codes[:n_valid] = rng.integers(0, 128, (n_valid, d), dtype=np.int8)
    voff = np.zeros((npad,), np.float32)
    voff[:n_valid] = rng.random(n_valid, dtype=np.float32)
    qcodes = rng.integers(0, 128, (q, d), dtype=np.int8)
    qoff = rng.random(q, dtype=np.float32)
    mult = jnp.float32(0.37)

    scores = sq_ops.score_batch_xla(
        jnp.asarray(qcodes), jnp.asarray(qoff), jnp.asarray(codes[:n_valid]),
        jnp.asarray(voff[:n_valid]), mult, distance_type=dt,
    )
    ws, wi = topk_exact(scores, k)
    gs, gi = sq_search_pallas(
        jnp.asarray(qcodes), jnp.asarray(qoff), jnp.asarray(codes),
        jnp.asarray(voff), mult, distance_type=dt, n_valid=n_valid, k=k,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(gs), np.asarray(ws), rtol=1e-6, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(gi), np.asarray(wi))


@pytest.mark.parametrize("dt", [DistanceType.DOT, DistanceType.L1, DistanceType.L2])
@pytest.mark.parametrize("invert", [False, True])
@pytest.mark.parametrize("dim", [33, 193, 256])
def test_bq_mxu_kernel_matches_xla(rng, dt, invert, dim):
    from quantization_tpu.ops.pallas.bq_kernel import bq_scores_mxu

    n_valid, q = 300, 5
    row_bytes = bq_ops.storage_bytes(dim, "u128")
    data = np.sign(rng.random((n_valid, dim), dtype=np.float32) - 0.5)
    rows = bq_ops.pack_rows(data, row_bytes)
    planes = bq_ops.rows_to_planes(rows)  # [W, n]
    npad = round_up(n_valid, BQ_TILE)
    planes_p = np.zeros((planes.shape[0], npad), planes.dtype)
    planes_p[:, :n_valid] = planes
    w8 = round_up(planes.shape[0], 8)
    planes_p = np.pad(planes_p, ((0, w8 - planes.shape[0]), (0, 0)))
    qdata = np.sign(rng.random((q, dim), dtype=np.float32) - 0.5)
    qrows = bq_ops.pack_rows(qdata, row_bytes)
    qplanes = bq_ops.rows_to_planes(qrows).T.copy()  # [q, W]

    want = np.asarray(
        bq_ops.score_batch_xla(
            jnp.asarray(qplanes),
            jnp.asarray(planes),
            distance_type=dt,
            invert=invert,
            dim=dim,
        )
    )
    got = np.asarray(
        bq_scores_mxu(
            jnp.asarray(qplanes),
            jnp.asarray(planes_p),
            distance_type=dt,
            invert=invert,
            dim=dim,
            n_valid=n_valid,
            interpret=True,
        )
    )
    np.testing.assert_array_equal(got, want)


def test_sq_fused_approx_search(rng):
    """Approx extraction: every returned (score, index) pair must be a true
    (score[index]) pair, and overlap with the exact top-k must be high
    (strided segment-max misses only stride-class collisions)."""
    from quantization_tpu.ops.pallas.sq_kernel import sq_search_pallas
    from quantization_tpu.ops.topk import topk_exact

    n_valid, d, q, k = 2000, 256, 4, 40
    npad = round_up(n_valid, SQ_TILE)
    codes = np.zeros((npad, d), np.int8)
    codes[:n_valid] = rng.integers(0, 128, (n_valid, d), dtype=np.int8)
    voff = np.zeros((npad,), np.float32)
    voff[:n_valid] = rng.random(n_valid, dtype=np.float32)
    qcodes = rng.integers(0, 128, (q, d), dtype=np.int8)
    qoff = rng.random(q, dtype=np.float32)
    mult = jnp.float32(0.37)

    scores = np.asarray(
        sq_ops.score_batch_xla(
            jnp.asarray(qcodes), jnp.asarray(qoff), jnp.asarray(codes[:n_valid]),
            jnp.asarray(voff[:n_valid]), mult, distance_type=DistanceType.DOT,
        )
    )
    ws, wi = topk_exact(jnp.asarray(scores), k)
    gs, gi = sq_search_pallas(
        jnp.asarray(qcodes), jnp.asarray(qoff), jnp.asarray(codes),
        jnp.asarray(voff), mult, distance_type=DistanceType.DOT,
        n_valid=n_valid, k=k, mode="approx", interpret=True,
    )
    gs, gi = np.asarray(gs), np.asarray(gi)
    for r in range(q):
        np.testing.assert_allclose(
            gs[r], scores[r][gi[r]], rtol=1e-6, atol=1e-4
        )
        overlap = len(set(gi[r].tolist()) & set(np.asarray(wi)[r].tolist())) / k
        assert overlap >= 0.8, overlap


@pytest.mark.parametrize("dt", [DistanceType.DOT, DistanceType.L2])
@pytest.mark.parametrize("invert", [False, True])
def test_bq_fused_search_matches_score_then_topk(rng, dt, invert):
    from quantization_tpu.ops.pallas.bq_kernel import bq_search_mxu
    from quantization_tpu.ops.topk import topk_exact

    dim, n_valid, q, k = 193, 900, 4, 10
    row_bytes = bq_ops.storage_bytes(dim, "u128")
    data = np.sign(rng.random((n_valid, dim), dtype=np.float32) - 0.5)
    rows = bq_ops.pack_rows(data, row_bytes)
    planes = bq_ops.rows_to_planes(rows)
    npad = round_up(n_valid, BQ_TILE)
    planes_p = np.zeros((planes.shape[0], npad), planes.dtype)
    planes_p[:, :n_valid] = planes
    w8 = round_up(planes.shape[0], 8)
    planes_p = np.pad(planes_p, ((0, w8 - planes.shape[0]), (0, 0)))
    qdata = np.sign(rng.random((q, dim), dtype=np.float32) - 0.5)
    qplanes = bq_ops.rows_to_planes(bq_ops.pack_rows(qdata, row_bytes)).T.copy()

    scores = bq_ops.score_batch_xla(
        jnp.asarray(qplanes), jnp.asarray(planes),
        distance_type=dt, invert=invert, dim=dim,
    )
    ws, wi = topk_exact(scores, k)
    gs, gi = bq_search_mxu(
        jnp.asarray(qplanes), jnp.asarray(planes_p),
        distance_type=dt, invert=invert, dim=dim,
        n_valid=n_valid, k=k, interpret=True,
    )
    # BQ scores are small integers with heavy ties: the top-k score
    # multiset must match EXACTLY (value-exact selection); among tied
    # scores the returned ids may differ from lax.top_k's tie order (the
    # same freedom the reference's heap has), so assert that every
    # returned id really has the score claimed for its slot.
    np.testing.assert_array_equal(np.asarray(gs), np.asarray(ws))
    gi_np = np.asarray(gi)
    scores_np = np.asarray(scores)
    for r in range(q):
        assert len(set(gi_np[r])) == k, "duplicate ids in top-k"
        assert gi_np[r].max() < n_valid and gi_np[r].min() >= 0
        np.testing.assert_array_equal(
            scores_np[r, gi_np[r]], np.asarray(ws)[r]
        )


@pytest.mark.parametrize("shape", [(800, 256), (1024, 96)])
def test_dma_gather_rows(rng, shape):
    from quantization_tpu.ops.pallas.gather import gather_rows_pallas

    n, d = shape
    src = rng.integers(-100, 100, (n, d)).astype(np.int8)
    ids = rng.integers(0, n, (77,)).astype(np.int32)
    got = np.asarray(
        gather_rows_pallas(jnp.asarray(src), jnp.asarray(ids), interpret=True)
    )
    np.testing.assert_array_equal(got, src[ids])


@pytest.mark.parametrize("mode", ["exact", "approx"])
def test_pq_fused_search(rng, mode):
    from quantization_tpu.ops.pallas.pq_kernel import pq_search_pallas
    from quantization_tpu.ops.topk import topk_exact

    n_valid, m, q, k = 1500, 24, 3, 10
    npad = round_up(n_valid, PQ_TILE)
    mpad = round_up(m, M_BLK)
    codes = np.zeros((npad, mpad), np.uint8)
    codes[:n_valid, :m] = rng.integers(0, 256, (n_valid, m), dtype=np.uint8)
    lut = rng.standard_normal((q, m, 256), dtype=np.float32)

    scores = np.asarray(
        pq_ops.score_lut_xla(jnp.asarray(lut), jnp.asarray(codes[:n_valid, :m]))
    )
    ws, wi = topk_exact(jnp.asarray(scores), k)
    gs, gi = pq_search_pallas(
        jnp.asarray(lut), jnp.asarray(codes.T.copy()),
        n_valid=n_valid, k=k, mode=mode, interpret=True,
    )
    gs, gi = np.asarray(gs), np.asarray(gi)
    scale = np.abs(lut).sum(axis=(1, 2)).max()
    for r in range(q):
        # each returned pair must be a true (score[index]) pair (bf16 LUT)
        np.testing.assert_allclose(gs[r], scores[r][gi[r]], atol=scale * 4e-3)
        overlap = len(set(gi[r].tolist()) & set(np.asarray(wi)[r].tolist())) / k
        if mode == "exact":
            assert overlap >= 0.9, overlap  # bf16 rounding can flip near-ties
        else:
            assert overlap >= 0.7, overlap


@pytest.mark.parametrize("m", [7, 130])
@pytest.mark.parametrize("q", [1, 4])
def test_pq_kernel_matches_xla(rng, m, q):
    n_valid, k = 400, 256
    npad = round_up(n_valid, PQ_TILE)
    mpad = round_up(m, M_BLK)
    codes = np.zeros((npad, mpad), np.uint8)
    codes[:n_valid, :m] = rng.integers(0, 256, (n_valid, m), dtype=np.uint8)
    lut = rng.standard_normal((q, m, k), dtype=np.float32)

    want = np.asarray(
        pq_ops.score_lut_xla(jnp.asarray(lut), jnp.asarray(codes[:n_valid, :m]))
    )
    got = np.asarray(
        pq_scores_pallas(
            jnp.asarray(lut),
            jnp.asarray(codes.T.copy()),
            n_valid=n_valid,
            interpret=True,
        )
    )
    # bf16 LUT mantissa in the MXU path: tolerate relative 1e-2 of the
    # accumulated magnitude.
    scale = np.abs(lut).sum(axis=(1, 2)).max()
    np.testing.assert_allclose(got, want, atol=scale * 4e-3)


def test_gather_rows_chunked_beyond_smem(rng, monkeypatch):
    """Gathers wider than the SMEM id budget are chunked transparently."""
    import jax.numpy as jnp

    import quantization_tpu.ops.pallas.gather as gather_mod

    n, d = 64, 128
    src = jnp.asarray(rng.integers(0, 127, (n, d), dtype=np.int8))
    ids = rng.integers(0, n, 50).astype(np.int32)
    monkeypatch.setattr(gather_mod, "_MAX_IDS", 16)
    got = np.asarray(
        gather_mod.gather_rows_pallas(src, jnp.asarray(ids), interpret=True)
    )
    np.testing.assert_array_equal(got, np.asarray(src)[ids])


# ------------------------------------------ class-top2 exact extraction


def _sq_fused_setup(rng, n_valid, d, q, scale=None):
    npad = round_up(n_valid, SQ_TILE)
    codes = np.zeros((npad, d), np.int8)
    codes[:n_valid] = rng.integers(0, 128, (n_valid, d), dtype=np.int8)
    voff = np.zeros((npad,), np.float32)
    if scale is None:
        voff[:n_valid] = rng.random(n_valid, dtype=np.float32)
    else:
        voff[:n_valid] = scale  # caller-controlled score shaping
    qcodes = rng.integers(0, 128, (q, d), dtype=np.int8)
    qoff = rng.random(q, dtype=np.float32)
    return codes, voff, qcodes, qoff


@pytest.mark.parametrize("k", [100, 256, 600])
def test_sq_fused_search_exact_beyond_old_cap(rng, k):
    """The class-top-r extraction is exact at k well beyond the old k-round
    cap of 64 (VERDICT r2 item 1: no more k>64 cliff). k=100/256/600 walk
    the class_r tiers r=3/4/5 (the insertion-ladder formulations; r=2's
    specialized path is covered by the k=10 tests)."""
    from quantization_tpu.ops.pallas.sq_kernel import sq_search_pallas
    from quantization_tpu.ops.topk import topk_exact

    n_valid, d, q = 2000, 256, 3
    codes, voff, qcodes, qoff = _sq_fused_setup(rng, n_valid, d, q)
    mult = jnp.float32(0.37)
    scores = sq_ops.score_batch_xla(
        jnp.asarray(qcodes), jnp.asarray(qoff), jnp.asarray(codes[:n_valid]),
        jnp.asarray(voff[:n_valid]), mult, distance_type=DistanceType.DOT,
    )
    ws, wi = topk_exact(scores, k)
    gs, gi = sq_search_pallas(
        jnp.asarray(qcodes), jnp.asarray(qoff), jnp.asarray(codes),
        jnp.asarray(voff), mult, distance_type=DistanceType.DOT,
        n_valid=n_valid, k=k, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(gs), np.asarray(ws), rtol=1e-6, atol=1e-4
    )
    np.testing.assert_array_equal(np.asarray(gi), np.asarray(wi))


def test_sq_fused_search_adversarial_class_collision(rng):
    """All top entries packed into ONE stride class (global ids spaced by
    SLOT=128): a class hiding many top entries must be caught — by the
    bounded rescue (class flagged via m2 and fully rescored) or the
    in-program blocked fallback — and still produce the exact answer."""
    from quantization_tpu.ops.pallas.ktile import SLOT
    from quantization_tpu.ops.pallas.sq_kernel import sq_search_pallas
    from quantization_tpu.ops.topk import topk_exact

    n_valid, d, q, k = 3000, 256, 2, 10
    # Scores dominated by voff; put the 10 best all in stride class 0 of
    # the first candidate block: ids 0, 128, 256, ... 1152.
    voff_scale = rng.random(n_valid, dtype=np.float32)
    top_ids = np.arange(10) * SLOT
    voff_scale[top_ids] = 1000.0 + np.arange(10)
    codes, voff, qcodes, qoff = _sq_fused_setup(
        rng, n_valid, d, q, scale=voff_scale
    )
    # Zero code contribution so voff fully controls ordering.
    codes[:] = 0
    qcodes[:] = 0
    mult = jnp.float32(1.0)
    scores = sq_ops.score_batch_xla(
        jnp.asarray(qcodes), jnp.asarray(qoff), jnp.asarray(codes[:n_valid]),
        jnp.asarray(voff[:n_valid]), mult, distance_type=DistanceType.DOT,
    )
    ws, wi = topk_exact(scores, k)
    gs, gi = sq_search_pallas(
        jnp.asarray(qcodes), jnp.asarray(qoff), jnp.asarray(codes),
        jnp.asarray(voff), mult, distance_type=DistanceType.DOT,
        n_valid=n_valid, k=k, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(gi), np.asarray(wi))
    np.testing.assert_allclose(
        np.asarray(gs), np.asarray(ws), rtol=1e-6, atol=1e-4
    )


def test_sq_fused_search_k_exceeds_candidate_width(rng):
    """Tiny corpus + huge k (= n_valid, every element returned): the
    search must stay VALUE-exact whether it rides the class pool or the
    blocked fallback; among tied scores the returned ids may differ from
    lax.top_k's tie order (the reference heap's freedom)."""
    from quantization_tpu.ops.pallas.sq_kernel import sq_search_pallas
    from quantization_tpu.ops.topk import topk_exact

    n_valid, d, q, k = 600, 256, 2, 600
    codes, voff, qcodes, qoff = _sq_fused_setup(rng, n_valid, d, q)
    mult = jnp.float32(0.5)
    scores = sq_ops.score_batch_xla(
        jnp.asarray(qcodes), jnp.asarray(qoff), jnp.asarray(codes[:n_valid]),
        jnp.asarray(voff[:n_valid]), mult, distance_type=DistanceType.DOT,
    )
    ws, wi = topk_exact(scores, k)
    gs, gi = sq_search_pallas(
        jnp.asarray(qcodes), jnp.asarray(qoff), jnp.asarray(codes),
        jnp.asarray(voff), mult, distance_type=DistanceType.DOT,
        n_valid=n_valid, k=k, interpret=True,
    )
    gs, gi, sc = np.asarray(gs), np.asarray(gi), np.asarray(scores)
    np.testing.assert_allclose(gs, np.asarray(ws), rtol=1e-6, atol=1e-5)
    for r in range(q):
        assert len(set(gi[r].tolist())) == k
        assert gi[r].min() >= 0 and gi[r].max() < n_valid
        np.testing.assert_allclose(
            sc[r, gi[r]], gs[r], rtol=1e-6, atol=1e-5
        )


@pytest.mark.parametrize("k", [10, 96])
def test_pq_fused_search_exact_stream(rng, k):
    """PQ exact fused search (streaming extraction) matches flat top-k of
    the kernel-equivalent scores at k below AND above the old 64 cap."""
    from quantization_tpu.ops.pallas.pq_kernel import (
        pq_scores_pallas, pq_search_pallas,
    )
    from quantization_tpu.ops.topk import topk_exact

    n_valid, m, q = 2100, 8, 3
    npad = round_up(n_valid, PQ_TILE)
    mpad = round_up(m, M_BLK)
    codes_t = np.zeros((mpad, npad), np.uint8)
    codes_t[:m, :n_valid] = rng.integers(0, 256, (m, n_valid), dtype=np.uint8)
    lut = rng.random((q, m, 256), dtype=np.float32)
    # Oracle: the same int8-LUT scores the fused kernel selects over.
    scores = pq_scores_pallas(
        jnp.asarray(lut), jnp.asarray(codes_t), n_valid=n_valid,
        interpret=True, precision="int8",
    )
    ws, wi = topk_exact(scores, k)
    gs, gi = pq_search_pallas(
        jnp.asarray(lut), jnp.asarray(codes_t), n_valid=n_valid, k=k,
        interpret=True, precision="int8",
    )
    np.testing.assert_allclose(
        np.asarray(gs), np.asarray(ws), rtol=1e-6, atol=1e-5
    )
    # int8 LUT quantization can tie distinct entries; verify per-slot
    # scores rather than tie order.
    sc = np.asarray(scores)
    for r in range(q):
        np.testing.assert_allclose(
            sc[r, np.asarray(gi)[r]], np.asarray(ws)[r], rtol=1e-6, atol=1e-5
        )

"""Pallas SQ scoring kernels: fused int8 MXU dot / VPU L1 + affine epilogue.

The TPU replacement for the reference's native u8 kernels:
  * dot: impl_score_dot_avx (cpp/avx2.c:25-63, maddubs + hsum) becomes a tiled
    int8 x int8 -> int32 MXU matmul with the affine epilogue
    ``multiplier * acc + qoff + voff`` fused into the same kernel, producing
    final f32 scores without a second pass over [Q, N].
  * L1: impl_score_l1_avx (cpp/avx2.c:65-122, saturating-sub) becomes a VPU
    sum-of-absolute-differences over the same tiles.

Both kernels expect lane-aligned operands: D a multiple of 128 (the
quantizer's native layout), N and Q padded to the tile sizes by the wrapper.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.types import DistanceType
from ...utils.padding import pad_dim_to, round_up
from ..dispatch import interpret_mode
from .ktile import (
    FUSED_K_MAX,
    NEG,
    SLOT,
    SPAN,
    class_r,
    class_span,
    combine_class_topr_ids,
    combine_slots,
    extract_approx_tile,
    extract_class_topr_ids,
    merge_classes_verified,
    merge_tile_topk_all,
)

TILE_N = 512
TILE_Q = 128
L1_TILE_N = 256
L1_TILE_Q = 32
_L1_DB = 128  # D-block width per grid step (bounds the broadcast cube)

# Per-(query, corpus-block) additive correction granularity: one f32 per
# CORR_BLK consecutive corpus rows. The residual-IVF search (models/ivf.py)
# scores inner-product codes of RESIDUALS (v - bucket_center) and needs the
# query-dependent bucket term q . c_b added BEFORE in-tile top-k extraction
# — a per-row offset (voff) can't carry it (it varies per query) and a
# post-hoc add can't (selection already happened). Buckets are CORR_BLK-
# aligned by construction, so one column per 512 rows is exact.
CORR_BLK = 512


def _mult_col(multiplier, q):
    """Normalize a multiplier operand to a per-query f32 column [q, 1].

    Plain quantizers pass their scalar metadata multiplier; the
    residual-IVF query path quantizes EACH query with its own scale
    (models/ivf.py _residual_query_sq/_bq), so its effective multiplier
    is per-query — a [Q] / [Q, 1] operand. The kernels always consume
    the column form (a [TQ, 1] VMEM block broadcast against the score
    tile), so a scalar costs nothing extra."""
    m = jnp.asarray(multiplier, jnp.float32).reshape(-1, 1)
    return jnp.broadcast_to(m, (q, 1))


def _apply_corr(scores, corr_ref):
    """scores [TQ, TN] += corr block [TN/CORR_BLK, TQ, 1] repeated
    lane-wise. The corr operand is TRANSPOSED 3-D ([N/CORR_BLK, Qpad, 1]):
    Mosaic requires a block's last two dims be (8, 128)-divisible or
    full-size, which rules out a [TQ, <=4]-lane block — the per-block
    column rides the leading (grid-mapped) dim instead, and the block's
    last two dims are the always-legal (TQ, 1). TN/CORR_BLK is a small
    static count (<= 4): unrolled slice adds lower as VPU broadcasts."""
    cb = corr_ref[:]
    c = cb.shape[0]
    if c == 1:
        return scores + cb[0]
    blk = scores.shape[1] // c
    return jnp.concatenate(
        [scores[:, i * blk : (i + 1) * blk] + cb[i] for i in range(c)],
        axis=1,
    )


def _corr_cols(corr, b0, b1):
    """XLA-path twin of _apply_corr for blocked fallbacks: the additive
    column for corpus rows [b0, b1) (b0 CORR_BLK-aligned; b1 may be a
    ragged tail)."""
    cc = jax.lax.slice_in_dim(
        corr, b0 // CORR_BLK, -(-b1 // CORR_BLK), axis=1
    )
    return jnp.repeat(cc, CORR_BLK, axis=1)[:, : b1 - b0]


def _dot_kernel(mult_ref, q_ref, c_ref, qoff_ref, voff_ref, out_ref):
    acc = jax.lax.dot_general(
        q_ref[:],
        c_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out_ref[:] = (
        mult_ref[:] * acc.astype(jnp.float32) + qoff_ref[:] + voff_ref[:]
    )


def _l1_kernel(mult_ref, q_ref, c_ref, qoff_ref, voff_ref, out_ref):
    """Sum-of-absolute-differences on the VPU.

    The D axis is a grid dimension (innermost, so the output block stays
    VMEM-resident and is revisited): each step reduces one [TQ, TN, _L1_DB]
    broadcast cube — a single bounded temporary, instead of an unrolled
    D/128-deep chain that overflows the VMEM stack at serving batch sizes.
    Codes are in [0, 127] so the f32 accumulator is exact (|L1| <= 127*D
    < 2^24 for any realistic D)."""
    di = pl.program_id(2)
    q32 = q_ref[:].astype(jnp.int32)  # [TQ, DB]
    c32 = c_ref[:].astype(jnp.int32)  # [TN, DB]
    diff = jnp.sum(
        jnp.abs(q32[:, None, :] - c32[None, :, :]), axis=2
    )  # [TQ, TN]

    @pl.when(di == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += diff.astype(jnp.float32)

    @pl.when(di == pl.num_programs(2) - 1)
    def _epilogue():
        out_ref[:] = mult_ref[:] * out_ref[:] + qoff_ref[:] + voff_ref[:]


def _make_dot_topk_kernel(n_valid: int, tile_n: int, with_corr: bool = False):
    """Approx kernel: queries outer, so the revisited slot block sees
    consecutive corpus tiles (SPAN max-merging)."""

    def kernel(mult_ref, q_ref, c_ref, qoff_ref, voff_ref, *rest):
        if with_corr:
            corr_ref, outv_ref, outi_ref = rest
        else:
            outv_ref, outi_ref = rest
        j = pl.program_id(1)
        acc = jax.lax.dot_general(
            q_ref[:],
            c_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        scores = (
            mult_ref[:] * acc.astype(jnp.float32) + qoff_ref[:] + voff_ref[:]
        )
        if with_corr:
            scores = _apply_corr(scores, corr_ref)
        base = j * tile_n
        gid = base + jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(gid < n_valid, scores, NEG)
        vals, idx = extract_approx_tile(scores, base)
        combine_slots(outv_ref, outi_ref, vals, idx, j % SPAN == 0)

    return kernel


def _make_dot_topk_kernel_indexed(tile_n: int, with_corr: bool = False):
    """Approx kernel over a SELECTED tile set: the corpus block for grid
    step j is tile ``sel_ref[j]`` (scalar-prefetch index map), so the DMA
    pipeline streams only the probed buckets from HBM — an IVF scan pays
    the probed fraction of the full-scan stream with NO compaction copy.
    Emitted ids are global corpus rows (sel*tile_n + lane)."""

    def kernel(sel_ref, mult_ref, q_ref, c_ref, qoff_ref, voff_ref, *rest):
        if with_corr:
            corr_ref, outv_ref, outi_ref = rest
        else:
            outv_ref, outi_ref = rest
        j = pl.program_id(1)
        acc = jax.lax.dot_general(
            q_ref[:],
            c_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        scores = (
            mult_ref[:] * acc.astype(jnp.float32) + qoff_ref[:] + voff_ref[:]
        )
        if with_corr:
            scores = _apply_corr(scores, corr_ref)
        base = sel_ref[j] * tile_n
        vals, idx = extract_approx_tile(scores, base)
        combine_slots(outv_ref, outi_ref, vals, idx, j % SPAN == 0)

    return kernel


def _make_dot_class_kernel_indexed(
    tile_n: int, span: int, r: int, with_corr: bool = False
):
    """Exact-selection variant of the indexed kernel (class-top-r ladder,
    see _make_dot_class_kernel); selected tiles hold only valid rows, so
    no n_valid mask is needed."""

    def kernel(sel_ref, mult_ref, q_ref, c_ref, qoff_ref, voff_ref,
               *rest):
        if with_corr:
            corr_ref, out_refs = rest[0], rest[1:]
        else:
            out_refs = rest
        j = pl.program_id(1)
        acc = jax.lax.dot_general(
            q_ref[:],
            c_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        scores = (
            mult_ref[:] * acc.astype(jnp.float32) + qoff_ref[:] + voff_ref[:]
        )
        if with_corr:
            scores = _apply_corr(scores, corr_ref)
        base = sel_ref[j] * tile_n
        ms, is_, spill = extract_class_topr_ids(scores, base, r)
        combine_class_topr_ids(out_refs, ms, is_, spill, r, j % span == 0)

    return kernel


def _make_dot_class_kernel(
    n_valid: int, tile_n: int, span: int, r: int, with_corr: bool = False
):
    """Exact kernel: queries outer with the class-top-r-with-ids ladder
    extraction (max/min chains + eq-reused selects; see ktile)."""

    def kernel(mult_ref, q_ref, c_ref, qoff_ref, voff_ref, *rest):
        if with_corr:
            corr_ref, out_refs = rest[0], rest[1:]
        else:
            out_refs = rest
        j = pl.program_id(1)
        acc = jax.lax.dot_general(
            q_ref[:],
            c_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        scores = (
            mult_ref[:] * acc.astype(jnp.float32) + qoff_ref[:] + voff_ref[:]
        )
        if with_corr:
            scores = _apply_corr(scores, corr_ref)
        base = j * tile_n
        gid = base + jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(gid < n_valid, scores, NEG)
        ms, is_, spill = extract_class_topr_ids(scores, base, r)
        combine_class_topr_ids(out_refs, ms, is_, spill, r, j % span == 0)

    return kernel


@partial(
    jax.jit,
    static_argnames=(
        "distance_type", "n_valid", "k", "mode", "interpret",
        "recall_target",
    ),
)
def sq_search_pallas(
    qcodes: jax.Array,  # int8 [Q, D]  (D lane-aligned)
    qoff: jax.Array,  # f32 [Q]
    codes: jax.Array,  # int8 [Npad, D] (rows >= n_valid are zero)
    voff: jax.Array,  # f32 [Npad]
    multiplier: jax.Array,  # f32 scalar or per-query [Q] / [Q, 1]
    corr: jax.Array = None,  # f32 [Q, N/CORR_BLK] per-block additive, opt.
    *,
    distance_type: DistanceType,
    n_valid: int,
    k: int,
    mode: str = "exact",
    interpret: bool = None,
    recall_target: float = 0.95,
):
    """Fused SQ search: int8 MXU scoring + in-tile top-k, never
    materializing the [Q, N] score matrix (SURVEY.md §7 hard part 2).
    Returns (scores f32[Q, k], indices i32[Q, k]). DOT/L2 only (L1 scores
    ride the XLA path).

    ``mode="exact"``: class-top-r-with-ids ladder extraction (max/min
    chains + eq-reused selects; r adapts to k via ktile.class_r) —
    value-exact at any k <= FUSED_K_MAX; the spill check reruns through a
    corpus-blocked exact scan in the same program (lax.cond) on the rare
    violation.
    ``mode="approx"``: one-pass strided segment-max (approx_max_k-grade
    recall, any k <= APPROX_K_MAX).

    ``corr``: optional per-(query, CORR_BLK-row-block) additive term,
    applied BEFORE extraction in both modes (the residual-IVF bucket
    correction — see CORR_BLK above)."""
    assert distance_type != DistanceType.L1
    assert k <= FUSED_K_MAX or mode == "approx", (
        f"exact fused search caps k at {FUSED_K_MAX}, got {k}"
    )
    if interpret is None:
        interpret = interpret_mode()
    q, d = qcodes.shape
    n = codes.shape[0]
    # Wider corpus tile than the score-matrix kernel: each tile emits only
    # r*128 candidate slots, so doubling tile_n halves candidate traffic
    # and the final merge width. n is padded to TILE_N=512 by the
    # quantizer; use the largest multiple that still divides n.
    tile_n = TILE_N
    while tile_n * 2 <= 2048 and n % (tile_n * 2) == 0:
        tile_n *= 2
    # Both modes run a 256-row query tile with queries OUTER: the
    # extraction temporaries are small (max/min chains, no
    # k-round unroll), and at Q<=256 there is a single query tile, so the
    # corpus streams from HBM exactly once.
    tile_q = min(256, round_up(q, 32))
    assert n % tile_n == 0, f"N={n} must be padded to {tile_n}"
    qp = round_up(q, tile_q)
    qcodes_p = pad_dim_to(qcodes, 0, qp)
    qoff2 = pad_dim_to(qoff.reshape(-1, 1), 0, qp)
    voff2 = voff.reshape(1, -1)
    nt = n // tile_n
    approx = mode == "approx"
    qt = qp // tile_q
    mult_op = pad_dim_to(_mult_col(multiplier, q), 0, qp)
    with_corr = corr is not None
    cw = tile_n // CORR_BLK
    if with_corr:
        assert corr.shape[1] == n // CORR_BLK, (
            f"corr needs one column per {CORR_BLK} padded rows: "
            f"{corr.shape[1]} != {n // CORR_BLK}"
        )
        corr_p = pad_dim_to(corr.astype(jnp.float32), 0, qp)
        corr_ops = (jnp.transpose(corr_p)[:, :, None],)  # [NC, qp, 1]
        corr_specs = [
            pl.BlockSpec(
                (cw, tile_q, 1),
                lambda i, j: (j, i, 0),
                memory_space=pltpu.VMEM,
            )
        ]
    else:
        corr_ops, corr_specs = (), []

    if approx:
        nt_out = -(-nt // SPAN)
        kernel = _make_dot_topk_kernel(n_valid, tile_n, with_corr)
        vals, idxs = pl.pallas_call(
            kernel,
            grid=(qt, nt),
            in_specs=[
                pl.BlockSpec(
                    (tile_q, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM
                ),  # per-query multiplier [qp, 1]
                pl.BlockSpec(
                    (tile_q, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (tile_n, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (tile_q, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (1, tile_n), lambda i, j: (0, j), memory_space=pltpu.VMEM
                ),
            ]
            + corr_specs,
            out_specs=[
                pl.BlockSpec(
                    (tile_q, SLOT),
                    lambda i, j: (i, j // SPAN),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (tile_q, SLOT),
                    lambda i, j: (i, j // SPAN),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((qp, nt_out * SLOT), jnp.float32),
                jax.ShapeDtypeStruct((qp, nt_out * SLOT), jnp.int32),
            ],
            interpret=interpret,
        )(
            mult_op,
            qcodes_p,
            codes,
            qoff2.astype(jnp.float32),
            voff2.astype(jnp.float32),
            *corr_ops,
        )
        return merge_tile_topk_all(vals[:q], idxs[:q], k, recall_target)

    # ------------------------------------------------------------- exact
    def fallback():
        from ..topk import blocked_topk

        def score_block(b0, b1):
            acc = jax.lax.dot_general(
                qcodes,
                jax.lax.slice_in_dim(codes, b0, b1, axis=0),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            s = (
                _mult_col(multiplier, q) * acc.astype(jnp.float32)
                + qoff.reshape(-1, 1)
                + jax.lax.slice_in_dim(voff, b0, b1, axis=0)[None, :]
            )
            if with_corr:
                s = s + _corr_cols(corr, b0, b1)
            return s

        return blocked_topk(score_block, n_valid, k)

    r = class_r(k, n_valid)
    span = class_span(nt, k, r)
    nt_out = -(-nt // span)
    width = nt_out * SLOT
    if k > r * width:
        # Tiny corpus relative to k: the candidate pool can't cover k.
        return fallback()
    kernel = _make_dot_class_kernel(n_valid, tile_n, span, r, with_corr)
    block = lambda i, j: (i, j // span)  # noqa: E731
    dts = [jnp.float32, jnp.int32] * r + [jnp.float32]
    outs = pl.pallas_call(
        kernel,
        grid=(qt, nt),
        in_specs=[
            pl.BlockSpec(
                (tile_q, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM
            ),  # per-query multiplier [qp, 1]
            pl.BlockSpec(
                (tile_q, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile_n, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile_q, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, tile_n), lambda i, j: (0, j), memory_space=pltpu.VMEM
            ),
        ]
        + corr_specs,
        out_specs=[
            pl.BlockSpec((tile_q, SLOT), block, memory_space=pltpu.VMEM)
            for _ in dts
        ],
        out_shape=[
            jax.ShapeDtypeStruct((qp, width), dt) for dt in dts
        ],
        interpret=interpret,
    )(
        mult_op,
        qcodes_p,
        codes,
        qoff2.astype(jnp.float32),
        voff2.astype(jnp.float32),
        *corr_ops,
    )
    return merge_classes_verified(
        [outs[2 * j][:q] for j in range(r)],
        [outs[2 * j + 1][:q] for j in range(r)],
        outs[2 * r][:q], k, fallback,
    )


@partial(
    jax.jit,
    static_argnames=(
        "distance_type", "k", "mode", "interpret", "tile_n",
        "recall_target",
    ),
)
def sq_search_indexed(
    qcodes: jax.Array,  # int8 [Q, D]  (D lane-aligned)
    qoff: jax.Array,  # f32 [Q]
    codes: jax.Array,  # int8 [Npad, D], Npad % TILE_N == 0
    voff: jax.Array,  # f32 [Npad]
    multiplier: jax.Array,  # f32 scalar or per-query [Q] / [Q, 1]
    tile_sel: jax.Array,  # i32 [T] tile ids (tile t = rows [t*tile_n, ...))
    corr: jax.Array = None,  # f32 [T*(tile_n/CORR_BLK), Q] SELECTION order
    *,
    distance_type: DistanceType,
    k: int,
    mode: str = "approx",
    interpret: bool = None,
    tile_n: int = TILE_N,
    recall_target: float = 0.95,
):
    """Fused SQ search over a SELECTED set of tile_n-row tiles (the IVF
    probe scan): the corpus axis of the grid walks ``tile_sel`` through a
    scalar-prefetch index map, so only the selected tiles stream from HBM —
    cost is the probed fraction of the full scan, with no gather/compaction
    copy and no [Q, T*tile_n] score matrix. Selected tiles must contain
    only valid rows (the IVF layout guarantees it: pad slots duplicate real
    rows and are deduped downstream). ``tile_n`` should be as WIDE as the
    bucket geometry allows (multiple of TILE_N, up to 2048): per-grid-step
    costs (combine_slots, DMA issue) dominate the indexed/dense gap —
    measured 8.3 vs 5.8 ms over the same 2.62M rows at 512 vs 2048 tiles
    (PERF_NOTES round-3). Returns (scores f32[Q, k], ids i32[Q, k]) with
    ids GLOBAL corpus rows; DOT/L2 only."""
    assert distance_type != DistanceType.L1
    if interpret is None:
        interpret = interpret_mode()
    q, d = qcodes.shape
    n = codes.shape[0]
    assert tile_n % TILE_N == 0, f"tile_n={tile_n} must pad to {TILE_N}"
    assert n % tile_n == 0, f"N={n} must be padded to {tile_n}"
    nt = tile_sel.shape[0]
    tile_q = min(256, round_up(q, 32))
    qp = round_up(q, tile_q)
    qcodes_p = pad_dim_to(qcodes, 0, qp)
    qoff2 = pad_dim_to(qoff.reshape(-1, 1), 0, qp).astype(jnp.float32)
    voff2 = voff.reshape(1, -1).astype(jnp.float32)
    qt = qp // tile_q
    mult_op = pad_dim_to(_mult_col(multiplier, q), 0, qp)
    sel_op = tile_sel.astype(jnp.int32)
    approx = mode == "approx"
    with_corr = corr is not None
    cw = tile_n // CORR_BLK
    if with_corr:
        # SELECTION-order layout [T*cw, Q] — block row j*cw..(j+1)*cw is
        # the j-th SELECTED tile's additive columns, already transposed
        # (queries on lanes). The caller builds it union-first (one small
        # [U, D] x [D, Q] matmul), so the residual additive costs O(U),
        # not O(nbuckets): the former GLOBAL [Q, N/512] layout paid an
        # all-buckets HIGHEST matmul + a [Q, N/512] minor-dim transpose
        # per dispatch — measured ~2x the whole probed scan at 10M.
        assert corr.shape == (nt * cw, q), (
            f"corr must be selection-order [T*{cw}, Q]: "
            f"{corr.shape} != {(nt * cw, q)}"
        )
        corr_ops = (
            pad_dim_to(corr.astype(jnp.float32), 1, qp)[:, :, None],
        )  # [T*cw, qp, 1]
        corr_specs = [
            pl.BlockSpec(
                (cw, tile_q, 1),
                lambda i, j, s: (j, i, 0),
                memory_space=pltpu.VMEM,
            )
        ]
    else:
        corr_ops, corr_specs = (), []

    def fallback():
        # Exact-verification rerun: gather the selected tiles (the rare
        # path pays the compaction copy) and blocked-scan them.
        from ..topk import blocked_topk

        g = jnp.take(
            codes.reshape(n // tile_n, tile_n * d), sel_op, axis=0
        ).reshape(nt * tile_n, d)
        gv = jnp.take(
            voff.reshape(n // tile_n, tile_n), sel_op, axis=0
        ).reshape(nt * tile_n)
        if with_corr:
            # corr is already selection-order: just restore [q, nt*cw].
            gc = jnp.transpose(corr)

        def score_block(b0, b1):
            acc = jax.lax.dot_general(
                qcodes,
                jax.lax.slice_in_dim(g, b0, b1, axis=0),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            s = (
                _mult_col(multiplier, q) * acc.astype(jnp.float32)
                + qoff.reshape(-1, 1)
                + jax.lax.slice_in_dim(gv, b0, b1, axis=0)[None, :]
            )
            if with_corr:
                s = s + _corr_cols(gc, b0, b1)
            return s

        vals, loc = blocked_topk(score_block, nt * tile_n, k)
        ids = (
            jnp.take(sel_op, jnp.maximum(loc, 0) // tile_n) * tile_n
            + jnp.maximum(loc, 0) % tile_n
        )
        return vals, jnp.where(loc >= 0, ids, -1)

    common_specs = [
        pl.BlockSpec(
            (tile_q, 1), lambda i, j, s: (i, 0), memory_space=pltpu.VMEM
        ),  # per-query multiplier [qp, 1]
        pl.BlockSpec(
            (tile_q, d), lambda i, j, s: (i, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (tile_n, d), lambda i, j, s: (s[j], 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (tile_q, 1), lambda i, j, s: (i, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (1, tile_n), lambda i, j, s: (0, s[j]), memory_space=pltpu.VMEM
        ),
    ] + corr_specs

    if approx:
        nt_out = -(-nt // SPAN)
        out_specs = [
            pl.BlockSpec(
                (tile_q, SLOT),
                lambda i, j, s: (i, j // SPAN),
                memory_space=pltpu.VMEM,
            )
            for _ in range(2)
        ]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(qt, nt),
            in_specs=common_specs,
            out_specs=out_specs,
        )
        vals, idxs = pl.pallas_call(
            _make_dot_topk_kernel_indexed(tile_n, with_corr),
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((qp, nt_out * SLOT), jnp.float32),
                jax.ShapeDtypeStruct((qp, nt_out * SLOT), jnp.int32),
            ],
            interpret=interpret,
        )(sel_op, mult_op, qcodes_p, codes, qoff2, voff2, *corr_ops)
        return merge_tile_topk_all(vals[:q], idxs[:q], k, recall_target)

    # ------------------------------------------------------------- exact
    assert k <= FUSED_K_MAX, (
        f"exact fused search caps k at {FUSED_K_MAX}, got {k}"
    )
    n_sel = nt * tile_n
    r = class_r(k, n_sel)
    span = class_span(nt, k, r)
    nt_out = -(-nt // span)
    width = nt_out * SLOT
    if k > r * width:
        return fallback()
    dts = [jnp.float32, jnp.int32] * r + [jnp.float32]

    def block(i, j, s):
        return (i, j // span)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(qt, nt),
        in_specs=common_specs,
        out_specs=[
            pl.BlockSpec((tile_q, SLOT), block, memory_space=pltpu.VMEM)
            for _ in dts
        ],
    )
    outs = pl.pallas_call(
        _make_dot_class_kernel_indexed(tile_n, span, r, with_corr),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((qp, width), dt) for dt in dts],
        interpret=interpret,
    )(sel_op, mult_op, qcodes_p, codes, qoff2, voff2, *corr_ops)
    return merge_classes_verified(
        [outs[2 * j][:q] for j in range(r)],
        [outs[2 * j + 1][:q] for j in range(r)],
        outs[2 * r][:q], k, fallback,
    )


@partial(
    jax.jit,
    static_argnames=("distance_type", "n_valid", "interpret"),
)
def sq_scores_pallas(
    qcodes: jax.Array,  # int8 [Q, D]  (D lane-aligned)
    qoff: jax.Array,  # f32 [Q]
    codes: jax.Array,  # int8 [Npad, D] (rows >= n_valid are zero)
    voff: jax.Array,  # f32 [Npad]
    multiplier: jax.Array,  # f32 scalar or per-query [Q] / [Q, 1]
    *,
    distance_type: DistanceType,
    n_valid: int,
    interpret: bool = None,
) -> jax.Array:
    """[Q, n_valid] f32 scores. Pads Q internally; N must be pre-padded to the
    tile size (the quantizer stores codes that way)."""
    if interpret is None:
        interpret = interpret_mode()
    q, d = qcodes.shape
    n = codes.shape[0]
    l1 = distance_type == DistanceType.L1
    tile_n = L1_TILE_N if l1 else TILE_N
    # int8 min tile is (32, 128): query tiles must be 32-sublane multiples.
    tile_q = min(L1_TILE_Q if l1 else TILE_Q, round_up(q, 32))
    assert n % tile_n == 0, f"N={n} must be padded to {tile_n}"
    qp = round_up(q, tile_q)
    qcodes = pad_dim_to(qcodes, 0, qp)
    qoff2 = pad_dim_to(qoff.reshape(-1, 1), 0, qp)
    voff2 = voff.reshape(1, -1)

    if l1:
        assert d % _L1_DB == 0, f"D={d} must be lane-aligned to {_L1_DB}"
        # D innermost: the [TQ, TN] output block stays resident across the
        # accumulation steps.
        grid = (qp // tile_q, n // tile_n, d // _L1_DB)
        in_specs = [
            pl.BlockSpec(
                (tile_q, 1), lambda i, j, l: (i, 0), memory_space=pltpu.VMEM
            ),  # per-query multiplier [qp, 1]
            pl.BlockSpec(
                (tile_q, _L1_DB), lambda i, j, l: (i, l), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile_n, _L1_DB), lambda i, j, l: (j, l), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile_q, 1), lambda i, j, l: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, tile_n), lambda i, j, l: (0, j), memory_space=pltpu.VMEM
            ),
        ]
        out_spec = pl.BlockSpec(
            (tile_q, tile_n), lambda i, j, l: (i, j), memory_space=pltpu.VMEM
        )
    else:
        grid = (qp // tile_q, n // tile_n)
        in_specs = [
            pl.BlockSpec(
                (tile_q, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM
            ),  # per-query multiplier [qp, 1]
            pl.BlockSpec((tile_q, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ]
        out_spec = pl.BlockSpec(
            (tile_q, tile_n), lambda i, j: (i, j), memory_space=pltpu.VMEM
        )
    kernel = _l1_kernel if l1 else _dot_kernel
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((qp, n), jnp.float32),
        interpret=interpret,
    )(
        pad_dim_to(_mult_col(multiplier, q), 0, qp),
        qcodes,
        codes,
        qoff2.astype(jnp.float32),
        voff2.astype(jnp.float32),
    )
    return out[:q, :n_valid]

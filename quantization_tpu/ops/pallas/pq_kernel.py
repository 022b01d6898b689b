"""Pallas PQ scoring kernel: LUT lookup as one-hot MXU matmuls.

The reference scores PQ with an SSE gather loop over a per-query LUT
(encoded_vectors_pq.rs:405-440). TPUs have no fast vector gather, so the
lookup is re-expressed as compute (SURVEY.md §7, design inversion 5b):

    score[q, n] = sum_m lut[q, m, code[n, m]]
                = sum_m lut_m[TQ, 256] . onehot(code[:, m])[TILE_N, 256]^T

The one-hot matrix is built on the VPU with a compare against an iota and
immediately consumed by the MXU — 256x more MACs than a gather, but MACs the
MXU has to spare, against near-zero gather throughput.

Cost model (measured on v5e, Q=256 N=100k m=128):
  * MXU work: Q*N*m*256 bf16 MACs — the LUT is pre-cast to bf16 (inputs
    only; accumulation stays f32, so the error is one rounding of the LUT
    entries, ~0.4% relative, far inside the reference's dim*0.05 bound).
  * LUT streaming: each [TILE_Q, M_BLK*256] LUT block is re-fetched for
    every corpus tile, so TILE_N directly divides LUT traffic — hence the
    wide 1024-lane corpus tile.
  * One-hot build: Q/TILE_Q * N * m * 256 VPU compares — hence the tall
    128-row query tile (build is amortized over all 128 queries).
  * M_BLK bounds the in-kernel unroll so temporaries stay within the
    scoped-VMEM stack (an unbounded chunk unroll OOMs Mosaic's 16MB limit).

Layouts (all lane-aligned):
  codes int8[Mpad, Npad]   — TRANSPOSED: chunk rows on sublanes, corpus on
                             lanes (Mosaic requires 128-multiple lane blocks,
                             which rules out an [N, m] block for small m);
                             padded chunks are code 0 and hit zero LUT rows.
  lut  bf16[Qpad, Mpad*256] — flattened chunk-major LUT; chunk m occupies the
                             256-lane slice [m*256, (m+1)*256).
The grid is (q-tiles, corpus tiles, m-blocks) with the m axis innermost: the
[TILE_Q, TILE_N] f32 output block stays VMEM-resident across the whole
accumulation. Each chunk's one-hot is built transposed ([256, TILE_N]) from
a one-sublane code row, making the MXU contraction a plain lut_m @ onehot_T.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils.padding import pad_dim_to, round_up
from ..dispatch import interpret_mode
from .ktile import (
    FUSED_K_MAX,
    NEG,
    PACK_BITS,
    PACK_MEMBERS,
    PACK_MIN,
    SLOT,
    SPAN,
    class_r,
    class_span,
    combine_class_topr_ids,
    combine_class_topr_packed,
    combine_slots,
    extract_approx_tile,
    extract_class_topr_ids,
    extract_class_topr_packed,
    merge_classes_verified,
    merge_packed_verified,
    merge_tile_topk_all,
)

TILE_N = 1024
TILE_Q = 128
M_BLK = 16  # bounds the unrolled per-chunk temporaries on the VMEM stack


def _as_i8(codes_t: jax.Array) -> jax.Array:
    """The code matrix operand, byte dtype preserved. Historical note:
    this used to be ``astype(jnp.int8)`` — at capacity scale that
    convert_element_type (and even a bitcast-convert) materializes a
    full-matrix HLO temp next to the input (2 x 10.4 GB at the 100M
    scan: the round-5 compile OOM). Mosaic reads u8/s8 refs alike and
    every kernel widens with ``astype(int32) & 0xFF``, so the operand
    passes through untouched."""
    return codes_t
K = 256  # centroids per chunk (8-bit codes)
K4 = 16  # centroids per chunk (4-bit codes, Quick-ADC style)
GRP4 = 8  # 4-bit chunks fused per MXU matmul: 8 x 16 = one 128-wide one-hot


def _lut_precision(residual: bool = False) -> str:
    """LUT dtype for the one-hot MXU path. ``int8`` (default) quantizes the
    per-query LUT to int8 with per-(query, chunk) mid-range centering and a
    per-query scale, riding the v5e int8 MXU at 2x the bf16 rate (394 vs
    197 TOPS) — the centering keeps the quantization step at
    max|centered entry|/127, well inside the reference's dim*0.05 bound.
    ``QTPU_PQ_LUT=bf16`` restores the bf16 path.

    ``residual`` (residual-IVF LUTs): defaults to ``bf16x2`` — the LUT is
    split into two bf16 words (hi = bf16(lut), lo = bf16(lut - hi)) and
    accumulated with two MXU passes per one-hot, recovering f32-equivalent
    entries (error ~ entry * 2^-17) at 2x the LUT-matmul cost. Residual
    indexes rank by residual-scale score deltas while the LUT entries stay
    at full data scale (q . centroid dot products), so int8's step —
    max|centered|/127 PER QUERY across all chunks — and even plain bf16's
    ulp can rival the entire top-k spread (measured on clustered L2 data:
    GT recall 0.69 f32 / 0.59 bf16 / worse int8). An explicit QTPU_PQ_LUT
    still wins."""
    import os

    env = os.environ.get("QTPU_PQ_LUT")
    if env is not None:
        return env
    return "bf16x2" if residual else "int8"


def _quantize_lut(lut: jax.Array, mpad: int, qp: int):
    """f32 [Q, m, kc] -> (int8 [qp, mpad*kc], scale [qp, 1], bias [qp, 1]).

    scores = scale * sum_m lutq[m, code] + bias, where bias folds the
    per-chunk mid-range centers back in (one add per query)."""
    q, m, kc = lut.shape
    mid = 0.5 * (
        jnp.max(lut, axis=2, keepdims=True) + jnp.min(lut, axis=2, keepdims=True)
    )  # [Q, m, 1]
    centered = lut - mid
    scale = jnp.maximum(
        jnp.max(jnp.abs(centered), axis=(1, 2), keepdims=True) / 127.0,
        1e-30,
    )  # [Q, 1, 1]
    lutq = jnp.round(centered / scale).astype(jnp.int8)
    lutq = pad_dim_to(pad_dim_to(lutq, 1, mpad), 0, qp).reshape(qp, mpad * kc)
    bias = pad_dim_to(jnp.sum(mid[:, :, 0], axis=1, keepdims=True), 0, qp)
    return lutq, pad_dim_to(scale[:, :, 0], 0, qp), bias


def _make_scores_kernel(kc: int):
    accumulate = _accumulate_block if kc == K else _accumulate_block4

    def kernel(codes_ref, lut_ref, out_ref):
        """grid (nq, nn, nm); out revisited across the innermost m axis."""
        mi = pl.program_id(2)

        @pl.when(mi == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        out_ref[:] = accumulate(codes_ref, lut_ref, out_ref[:])

    return kernel


def _make_scores_kernel_i8(kc: int):
    accumulate = _accumulate_block_i8 if kc == K else _accumulate_block4_i8

    def kernel(codes_ref, lut_ref, scale_ref, bias_ref, out_ref, acc_ref):
        """int8-LUT variant: int32 accumulation in scratch, affine
        dequantize epilogue on the last m step."""
        mi = pl.program_id(2)

        @pl.when(mi == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        acc_ref[:] = accumulate(codes_ref, lut_ref, acc_ref[:])

        @pl.when(mi == pl.num_programs(2) - 1)
        def _():
            out_ref[:] = (
                scale_ref[:] * acc_ref[:].astype(jnp.float32) + bias_ref[:]
            )

    return kernel


def _accumulate_block(codes_ref, lut_ref, acc):
    """One M_BLK chunk block of one-hot MXU accumulation into acc.

    Static unroll over the chunk block: Mosaic has no dynamic_slice on
    register values, and 1-lane dynamic ref loads are unsupported for int8.
    The one-hot is built transposed ([K, TILE_N]: code row broadcast over
    256 sublanes vs a sublane iota) so the MXU contraction is a plain
    lut_m @ onehot_t."""
    codes = codes_ref[:].astype(jnp.int32) & 0xFF  # [M_BLK, TILE_N]
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0)
    for m_local in range(M_BLK):
        onehot_t = (codes[m_local, :][None, :] == iota_k).astype(jnp.bfloat16)
        lut_m = lut_ref[:, m_local * K : (m_local + 1) * K]
        acc = acc + jax.lax.dot_general(
            lut_m,
            onehot_t,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    return acc


def _accumulate_block_i8(codes_ref, lut_ref, acc):
    """int8-LUT twin of _accumulate_block: one-hot int8 x LUT int8 on the
    int8 MXU path, int32 accumulation (max |acc| <= 127*m — no overflow)."""
    codes = codes_ref[:].astype(jnp.int32) & 0xFF  # [M_BLK, TILE_N]
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0)
    for m_local in range(M_BLK):
        onehot_t = (codes[m_local, :][None, :] == iota_k).astype(jnp.int8)
        lut_m = lut_ref[:, m_local * K : (m_local + 1) * K]
        acc = acc + jax.lax.dot_general(
            lut_m,
            onehot_t,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
    return acc


def _block_diag_onehot4(codes, g0, tn):
    """[GRP4*K4, tn] block-diagonal one-hot for chunks [g0, g0+GRP4): row
    g*K4 + c is hot where codes[g0+g] == c. Built with ONE compare: each
    chunk's code row is replicated K4x along sublanes (the BQ unpack
    trick) and compared against a mod-K4 sublane iota — replacing the
    8-compare + 7-or chain (measured 5x less VPU build work)."""
    rep = jnp.repeat(codes[g0 : g0 + GRP4], K4, axis=0)  # [128, tn]
    iota_mod = (
        jax.lax.broadcasted_iota(jnp.int32, (GRP4 * K4, tn), 0) % K4
    )
    return rep == iota_mod


def _accumulate_block4_i8(codes_ref, lut_ref, acc):
    """int8-LUT twin of _accumulate_block4 (block-diagonal grouped 4-bit)."""
    codes = codes_ref[:].astype(jnp.int32) & 0xF  # [M_BLK, TILE_N]
    tn = codes.shape[1]
    for g0 in range(0, codes.shape[0], GRP4):
        oh = _block_diag_onehot4(codes, g0, tn)
        lut_grp = lut_ref[:, g0 * K4 : g0 * K4 + GRP4 * K4]  # [TQ, 128]
        acc = acc + jax.lax.dot_general(
            lut_grp,
            oh.astype(jnp.int8),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
    return acc


# lo-word prescale for the bf16x2 split (power of two: exact in bf16,
# keeps the tiny lo values in bf16's well-conditioned range).
LO_SCALE = 256.0


def _accumulate_block_x2(codes_ref, hi_ref, lo_ref, acc):
    """Two-word bf16 LUT (hi + lo/LO_SCALE = f32 entry to ~2^-17): one
    one-hot build per chunk, hi and lo MXU passes into SEPARATE f32
    chains, lo folded back once per block. The residual-IVF precision
    path — see _lut_precision(residual=True) and LO_SCALE."""
    codes = codes_ref[:].astype(jnp.int32) & 0xFF  # [M_BLK, TILE_N]
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0)
    lo_acc = jnp.zeros_like(acc)
    for m_local in range(M_BLK):
        onehot_t = (codes[m_local, :][None, :] == iota_k).astype(jnp.bfloat16)
        dn = (((1,), (0,)), ((), ()))
        acc = acc + jax.lax.dot_general(
            hi_ref[:, m_local * K : (m_local + 1) * K], onehot_t,
            dimension_numbers=dn, preferred_element_type=jnp.float32,
        )
        lo_acc = lo_acc + jax.lax.dot_general(
            lo_ref[:, m_local * K : (m_local + 1) * K], onehot_t,
            dimension_numbers=dn, preferred_element_type=jnp.float32,
        )
    return acc + (1.0 / LO_SCALE) * lo_acc


def _accumulate_block4_x2(codes_ref, hi_ref, lo_ref, acc):
    """4-bit twin of _accumulate_block_x2 (block-diagonal grouped)."""
    codes = codes_ref[:].astype(jnp.int32) & 0xF  # [M_BLK, TILE_N]
    tn = codes.shape[1]
    lo_acc = jnp.zeros_like(acc)
    for g0 in range(0, codes.shape[0], GRP4):
        oh = _block_diag_onehot4(codes, g0, tn).astype(jnp.bfloat16)
        dn = (((1,), (0,)), ((), ()))
        acc = acc + jax.lax.dot_general(
            hi_ref[:, g0 * K4 : g0 * K4 + GRP4 * K4], oh,
            dimension_numbers=dn, preferred_element_type=jnp.float32,
        )
        lo_acc = lo_acc + jax.lax.dot_general(
            lo_ref[:, g0 * K4 : g0 * K4 + GRP4 * K4], oh,
            dimension_numbers=dn, preferred_element_type=jnp.float32,
        )
    return acc + (1.0 / LO_SCALE) * lo_acc


def _split_lut_bf16x2(lut_flat_f32):
    """f32 [qp, mpad*kc] -> (hi bf16, lo bf16 SCALED by LO_SCALE) with
    hi + lo/LO_SCALE ~= entry.

    The hi rounding MUST go through ``lax.reduce_precision``, not a
    dtype cast: this environment compiles with
    --xla_allow_excess_precision=true, under which XLA may treat a
    bf16->f32 round-trip as identity — ``lut - f32(bf16(lut))`` then
    folds to zero and the kernel silently runs hi-only (observed on
    v5e: scores matched the hi word EXACTLY; interpret mode, which
    skips that rewrite, was correct). reduce_precision is a semantic
    rounding op the optimization must respect."""
    hi_f32 = jax.lax.reduce_precision(
        lut_flat_f32, exponent_bits=8, mantissa_bits=7
    )
    hi = hi_f32.astype(jnp.bfloat16)  # exact: already bf16-rounded
    lo = ((lut_flat_f32 - hi_f32) * LO_SCALE).astype(jnp.bfloat16)
    return hi, lo


def _accumulate_block4(codes_ref, lut_ref, acc):
    """4-bit variant: GRP4 chunks share one [128, TILE_N] block-diagonal
    one-hot (chunk g of the group occupies rows [16g, 16g+16)), so a single
    full-K MXU matmul scores 8 chunks — 16x fewer MACs per dimension than
    the 8-bit kernel. The flattened LUT layout makes each group's slice a
    contiguous 128 lanes."""
    codes = codes_ref[:].astype(jnp.int32) & 0xF  # [M_BLK, TILE_N]
    tn = codes.shape[1]
    for g0 in range(0, codes.shape[0], GRP4):
        oh = _block_diag_onehot4(codes, g0, tn)
        lut_grp = lut_ref[:, g0 * K4 : g0 * K4 + GRP4 * K4]  # [TQ, 128]
        acc = acc + jax.lax.dot_general(
            lut_grp,
            oh.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    return acc


def _apply_corr(scores, corr_ref):
    """scores [TQ, TN] += corr block [TN/CORR_BLK, TQ, 1] repeated
    lane-wise (the residual-IVF bucket correction; transposed 3-D layout
    for Mosaic's block-shape rules — see sq_kernel._apply_corr)."""
    cb = corr_ref[:]
    c = cb.shape[0]
    if c == 1:
        return scores + cb[0]
    blk = scores.shape[1] // c
    return jnp.concatenate(
        [scores[:, i * blk : (i + 1) * blk] + cb[i] for i in range(c)],
        axis=1,
    )


def _make_pq_topk_kernel(
    tile_n: int, kc: int = K, int8_lut: bool = False,
    with_res: bool = False, lut2: bool = False,
):
    """Approx kernel: grid (q-tiles, corpus tiles, m-blocks), m innermost;
    SPAN-merged slot extraction on the last m step. Validity cutoff via
    SMEM scalar (``nv_ref``) so sharded callers can pass a per-shard,
    data-dependent count (sharded.py). ``with_res``: residual-IVF inputs —
    per-row additive (rowadd, carries s*|v|^2 and the pad mask) and
    per-(query, CORR_BLK-block) additive (corr, the bucket term), both
    applied after dequantize, before extraction. ``lut2``: two-word bf16
    LUT (a second lo-word operand follows the LUT)."""
    if int8_lut:
        accumulate = _accumulate_block_i8 if kc == K else _accumulate_block4_i8
    elif lut2:
        accumulate = _accumulate_block_x2 if kc == K else _accumulate_block4_x2
    else:
        accumulate = _accumulate_block if kc == K else _accumulate_block4

    def kernel(nv_ref, codes_ref, lut_ref, *rest):
        rest = list(rest)
        if lut2:
            lut_lo_ref = rest.pop(0)
        if int8_lut:
            scale_ref, bias_ref = rest.pop(0), rest.pop(0)
        if with_res:
            rowadd_ref, corr_ref = rest.pop(0), rest.pop(0)
        outv_ref, outi_ref, acc_ref = rest
        mi = pl.program_id(2)
        base = pl.program_id(1) * tile_n  # hoisted: program_id is not
        # lowerable inside a pl.when body under interpret mode

        @pl.when(mi == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        if lut2:
            acc_ref[:] = accumulate(codes_ref, lut_ref, lut_lo_ref, acc_ref[:])
        else:
            acc_ref[:] = accumulate(codes_ref, lut_ref, acc_ref[:])

        j = pl.program_id(1)

        @pl.when(mi == pl.num_programs(2) - 1)
        def _():
            if int8_lut:
                scores = (
                    scale_ref[:] * acc_ref[:].astype(jnp.float32)
                    + bias_ref[:]
                )
            else:
                scores = acc_ref[:]
            if with_res:
                scores = _apply_corr(scores + rowadd_ref[:], corr_ref)
            gid = base + jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
            scores = jnp.where(gid < nv_ref[0], scores, NEG)
            vals, idx = extract_approx_tile(scores, base)
            combine_slots(outv_ref, outi_ref, vals, idx, j % SPAN == 0)

    return kernel


def _make_pq_topk_kernel_indexed(
    tile_n: int, kc: int = K, int8_lut: bool = False,
    with_res: bool = False, lut2: bool = False,
):
    """Approx kernel over a SELECTED tile set: the corpus block for grid
    step j is tile ``sel_ref[j]`` (scalar-prefetch index map) — the IVF
    probed-bucket scan streams only the selected code columns from HBM.
    Selected tiles hold only valid rows (IVF pads duplicate real rows),
    so no validity cutoff is needed; ids are global corpus rows.
    ``with_res`` / ``lut2``: see _make_pq_topk_kernel."""
    if int8_lut:
        accumulate = _accumulate_block_i8 if kc == K else _accumulate_block4_i8
    elif lut2:
        accumulate = _accumulate_block_x2 if kc == K else _accumulate_block4_x2
    else:
        accumulate = _accumulate_block if kc == K else _accumulate_block4

    def kernel(sel_ref, codes_ref, lut_ref, *rest):
        rest = list(rest)
        if lut2:
            lut_lo_ref = rest.pop(0)
        if int8_lut:
            scale_ref, bias_ref = rest.pop(0), rest.pop(0)
        if with_res:
            rowadd_ref, corr_ref = rest.pop(0), rest.pop(0)
        outv_ref, outi_ref, acc_ref = rest
        mi = pl.program_id(2)
        j = pl.program_id(1)
        base = sel_ref[j] * tile_n  # hoisted out of pl.when (interpret rule)

        @pl.when(mi == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        if lut2:
            acc_ref[:] = accumulate(codes_ref, lut_ref, lut_lo_ref, acc_ref[:])
        else:
            acc_ref[:] = accumulate(codes_ref, lut_ref, acc_ref[:])

        @pl.when(mi == pl.num_programs(2) - 1)
        def _():
            if int8_lut:
                scores = (
                    scale_ref[:] * acc_ref[:].astype(jnp.float32)
                    + bias_ref[:]
                )
            else:
                scores = acc_ref[:]
            if with_res:
                scores = _apply_corr(scores + rowadd_ref[:], corr_ref)
            vals, idx = extract_approx_tile(scores, base)
            combine_slots(outv_ref, outi_ref, vals, idx, j % SPAN == 0)

    return kernel


@partial(
    jax.jit,
    static_argnames=("k", "interpret", "precision", "tile_n", "recall_target"),
)
def pq_search_indexed(
    lut: jax.Array,  # f32 [Q, m, 256] (or [Q, m, 16] for 4-bit)
    codes_t: jax.Array,  # int8/uint8 [Mpad, Npad]
    tile_sel: jax.Array,  # i32 [T] tile ids (tile t = cols [t*tile_n, ...))
    rowadd: jax.Array = None,  # f32 [Npad] per-row additive (residual IVF)
    corr: jax.Array = None,  # f32 [T*(tile_n/CORR_BLK), Q] SELECTION order
    *,
    k: int,
    interpret: bool = None,
    precision: str = None,
    tile_n: int = TILE_N,
    recall_target: float = 0.95,
):
    """Fused PQ search over a SELECTED set of tile_n-column tiles (the IVF
    probe scan, approx selection): the corpus axis of the grid walks
    ``tile_sel`` via a scalar-prefetch index map, so only the probed
    buckets' codes stream from HBM — the scan pays the probed fraction of
    the full-scan's one-hot/MXU work with no compaction copy (at 10M the
    full PQ scan is compute-bound at ~355 ms; probing is the only lever).
    ``tile_n`` may be derated below TILE_N (multiple of SLOT) to match an
    IVF bucket size; smaller tiles trade extraction overhead per scanned
    byte. Requires the TRANSPOSED resident codes (the caller caches them
    once). Returns (scores f32[Q, k], ids i32[Q, k]), ids GLOBAL corpus
    rows."""
    if interpret is None:
        interpret = interpret_mode()
    if precision is None:
        precision = _lut_precision()
    int8_lut = precision == "int8"
    lut2 = precision == "bf16x2"
    q, m, kc = lut.shape
    assert kc in (K, K4)
    mpad, n = codes_t.shape
    assert tile_n % SLOT == 0, f"tile_n={tile_n} must pad to {SLOT}"
    assert n % tile_n == 0, f"N={n} must be padded to {tile_n}"
    assert mpad % M_BLK == 0
    tile_q = min(256, round_up(q, 8))
    qp = round_up(q, tile_q)
    nt = tile_sel.shape[0]
    sel_op = tile_sel.astype(jnp.int32)
    with_res = corr is not None
    assert (rowadd is None) == (corr is None), (
        "residual inputs come as a pair (rowadd carries the pad mask)"
    )

    in_specs = [
        pl.BlockSpec(
            (M_BLK, tile_n), lambda i, j, l, s: (l, s[j]),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (tile_q, M_BLK * kc),
            lambda i, j, l, s: (i, l),
            memory_space=pltpu.VMEM,
        ),
    ]
    if int8_lut:
        lut_flat, scale, bias = _quantize_lut(lut, mpad, qp)
        operands = [sel_op, _as_i8(codes_t), lut_flat, scale, bias]
        in_specs += [
            pl.BlockSpec(
                (tile_q, 1), lambda i, j, l, s: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tile_q, 1), lambda i, j, l, s: (i, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        scratch = [pltpu.VMEM((tile_q, tile_n), jnp.int32)]
    else:
        lut_f32 = pad_dim_to(pad_dim_to(lut, 1, mpad), 0, qp).reshape(
            qp, mpad * kc
        )
        if lut2:
            lut_flat, lut_lo = _split_lut_bf16x2(lut_f32)
            operands = [sel_op, _as_i8(codes_t), lut_flat, lut_lo]
            in_specs += [in_specs[1]]  # lo word rides the LUT BlockSpec
        else:
            lut_flat = lut_f32.astype(jnp.bfloat16)
            operands = [sel_op, _as_i8(codes_t), lut_flat]
        scratch = [pltpu.VMEM((tile_q, tile_n), jnp.float32)]
    if with_res:
        from .sq_kernel import CORR_BLK

        cw = tile_n // CORR_BLK
        # corr arrives SELECTION-order [T*cw, Q] (queries on lanes, built
        # union-first so the additive costs O(U) — see sq_search_indexed);
        # rowadd stays GLOBAL [Npad] (per-row, indexed by the same
        # scalar-prefetch map as the codes).
        assert corr.shape == (nt * cw, q) and rowadd.shape[0] == n
        corr_t = pad_dim_to(corr.astype(jnp.float32), 1, qp)[:, :, None]
        operands += [rowadd.astype(jnp.float32).reshape(1, n), corr_t]
        in_specs += [
            pl.BlockSpec(
                (1, tile_n), lambda i, j, l, s: (0, s[j]),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (cw, tile_q, 1), lambda i, j, l, s: (j, i, 0),
                memory_space=pltpu.VMEM,
            ),
        ]

    nt_out = -(-nt // SPAN)
    out_idx = lambda i, j, l, s: (i, j // SPAN)  # noqa: E731
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(qp // tile_q, nt, mpad // M_BLK),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((tile_q, SLOT), out_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, SLOT), out_idx, memory_space=pltpu.VMEM),
        ],
        scratch_shapes=scratch,
    )
    vals, idxs = pl.pallas_call(
        _make_pq_topk_kernel_indexed(tile_n, kc, int8_lut, with_res, lut2),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((qp, nt_out * SLOT), jnp.float32),
            jax.ShapeDtypeStruct((qp, nt_out * SLOT), jnp.int32),
        ],
        interpret=interpret,
    )(*operands)
    return merge_tile_topk_all(vals[:q], idxs[:q], k, recall_target)


def _make_pq_class_kernel(
    tile_n: int, span: int, r: int, kc: int = K,
    int8_lut: bool = False, with_res: bool = False, lut2: bool = False,
):
    """Exact kernel, extraction on the last m step. int8 LUT: the int32
    accumulator orders identically to the final score (scale > 0), so the
    packed per-class top-3 applies — ids ride the int chains for free.
    f32 LUT: class-top2 + bounded rescue (ktile). With 256-row query
    tiles the one-hot build is paid ONCE per corpus tile at Q<=256.
    ``with_res`` (f32-keyed branch only — the packed int chains can't
    absorb additives): residual rowadd + corr applied to the f32 scores
    BEFORE extraction, so exact selection runs over corrected scores.
    ``lut2``: two-word bf16 LUT (residual precision; f32 branch only)."""
    assert not (with_res and int8_lut)
    if int8_lut:
        accumulate = _accumulate_block_i8 if kc == K else _accumulate_block4_i8
    elif lut2:
        accumulate = _accumulate_block_x2 if kc == K else _accumulate_block4_x2
    else:
        accumulate = _accumulate_block if kc == K else _accumulate_block4
    ns = tile_n // SLOT

    def kernel(nv_ref, codes_ref, lut_ref, *rest):
        rest = list(rest)
        if lut2:
            lut_lo_ref = rest.pop(0)
        if int8_lut:
            scale_ref, bias_ref = rest.pop(0), rest.pop(0)
        if with_res:
            rowadd_ref, corr_ref = rest.pop(0), rest.pop(0)
        out_refs, acc_ref = rest[:-1], rest[-1]
        mi = pl.program_id(2)
        j = pl.program_id(1)
        base = j * tile_n  # hoisted out of pl.when (interpret-mode rule)
        last_m = mi == pl.num_programs(2) - 1

        @pl.when(mi == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        if lut2:
            acc_ref[:] = accumulate(codes_ref, lut_ref, lut_lo_ref, acc_ref[:])
        else:
            acc_ref[:] = accumulate(codes_ref, lut_ref, acc_ref[:])

        @pl.when(last_m)
        def _():
            gid = base + jax.lax.broadcasted_iota(
                jnp.int32, acc_ref.shape, 1
            )
            if int8_lut:
                key = jnp.where(
                    gid < nv_ref[0], acc_ref[:] << PACK_BITS, PACK_MIN
                )
                ps, spill = extract_class_topr_packed(
                    key, (j % span) * ns, r
                )
                combine_class_topr_packed(out_refs, ps, spill, r,
                                          j % span == 0)
            else:
                scores = acc_ref[:]
                if with_res:
                    scores = _apply_corr(scores + rowadd_ref[:], corr_ref)
                scores = jnp.where(gid < nv_ref[0], scores, NEG)
                ms, is_, spill = extract_class_topr_ids(scores, base, r)
                combine_class_topr_ids(out_refs, ms, is_, spill, r,
                                       j % span == 0)

    return kernel


@partial(
    jax.jit,
    static_argnames=(
        "n_valid", "k", "mode", "interpret", "precision", "recall_target",
    ),
)
def pq_search_pallas(
    lut: jax.Array,  # f32 [Q, m, 256]
    codes_t: jax.Array,  # int8/uint8 [Mpad, Npad]
    rowadd: jax.Array = None,  # f32 [Npad] per-row additive (residual IVF)
    corr: jax.Array = None,  # f32 [Q, Npad/CORR_BLK] per-block additive
    *,
    n_valid: int,
    k: int,
    mode: str = "exact",
    interpret: bool = None,
    precision: str = None,
    n_valid_dyn: jax.Array = None,
    recall_target: float = 0.95,
):
    """Fused PQ search: one-hot MXU accumulation into a VMEM scratch tile +
    in-tile top-k — (scores f32[Q, k], indices i32[Q, k]) without the
    [Q, N] score matrix. ``mode="approx"`` uses the one-pass strided
    segment-max extraction (any k <= APPROX_K_MAX); ``mode="exact"`` the
    packed per-class top-3 (int8 LUT) or class-top2-with-ids (f32 LUT)
    — value-exact over the kernel's own LUT scores at any
    k <= FUSED_K_MAX, with a corpus-blocked scan (same LUT arithmetic) as
    the verified fallback. ``precision`` "int8" (default, 2x MXU rate),
    "bf16", or "bf16x2" (two-word split, f32-equivalent entries — the
    residual default). Residual additives (rowadd/corr) ride both the
    approx extraction and the f32-keyed exact class extraction; the int8
    packed chains can't absorb them (asserted)."""
    assert k <= FUSED_K_MAX or mode == "approx", (
        f"exact fused search caps k at {FUSED_K_MAX}, got {k}"
    )
    if interpret is None:
        interpret = interpret_mode()
    if precision is None:
        precision = _lut_precision()
    int8_lut = precision == "int8"
    lut2 = precision == "bf16x2"
    q, m, kc = lut.shape
    assert kc in (K, K4)
    mpad, n = codes_t.shape
    assert n % TILE_N == 0, f"N={n} must be padded to {TILE_N}"
    assert mpad % M_BLK == 0
    # 256-row query tiles in BOTH modes: the one-hot build (VPU, per
    # (query tile, corpus tile, chunk)) is the dominant non-MXU cost and is
    # paid once per corpus tile at Q<=256 — round 2's exact mode paid it
    # twice over 128-row tiles.
    tile_q = min(256, round_up(q, 8))
    qp = round_up(q, tile_q)
    nt = n // TILE_N
    approx = mode == "approx"
    # Optional TRACED validity cutoff (<= the static n_valid, which keeps
    # bounding shapes/fallback blocking) — sharded callers mask the last
    # shard's data-dependent padding without a per-shard recompile.
    nv = n_valid if n_valid_dyn is None else n_valid_dyn
    nv_op = jnp.asarray(nv, jnp.int32).reshape(1)
    with_res = corr is not None
    assert (rowadd is None) == (corr is None), (
        "residual inputs come as a pair (rowadd carries the pad mask)"
    )
    assert not (with_res and mode == "exact" and int8_lut), (
        "exact residual selection needs an f32-keyed extraction (bf16 / "
        "bf16x2 LUT) — the packed int chains can't absorb the additives"
    )

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # n_valid cutoff (1,)
        pl.BlockSpec(
            (M_BLK, TILE_N), lambda i, j, l: (l, j), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (tile_q, M_BLK * kc),
            lambda i, j, l: (i, l),
            memory_space=pltpu.VMEM,
        ),
    ]
    if int8_lut:
        lut_flat, scale, bias = _quantize_lut(lut, mpad, qp)
        operands = [nv_op, _as_i8(codes_t), lut_flat, scale, bias]
        in_specs += [
            pl.BlockSpec(
                (tile_q, 1), lambda i, j, l: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile_q, 1), lambda i, j, l: (i, 0), memory_space=pltpu.VMEM
            ),
        ]
        scratch = [pltpu.VMEM((tile_q, TILE_N), jnp.int32)]
    else:
        lut_f32 = pad_dim_to(pad_dim_to(lut, 1, mpad), 0, qp).reshape(
            qp, mpad * kc
        )
        if lut2:
            lut_flat, lut_lo = _split_lut_bf16x2(lut_f32)
            operands = [nv_op, _as_i8(codes_t), lut_flat, lut_lo]
            in_specs += [in_specs[2]]  # lo word rides the LUT BlockSpec
        else:
            lut_flat = lut_f32.astype(jnp.bfloat16)
            operands = [nv_op, _as_i8(codes_t), lut_flat]
        scratch = [pltpu.VMEM((tile_q, TILE_N), jnp.float32)]
    if with_res:
        from .sq_kernel import CORR_BLK

        cw = TILE_N // CORR_BLK
        assert corr.shape[1] == n // CORR_BLK and rowadd.shape[0] == n
        corr_t = jnp.transpose(
            pad_dim_to(corr.astype(jnp.float32), 0, qp)
        )[:, :, None]  # [NC, qp, 1]
        operands += [rowadd.astype(jnp.float32).reshape(1, n), corr_t]
        in_specs += [
            pl.BlockSpec(
                (1, TILE_N), lambda i, j, l: (0, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (cw, tile_q, 1), lambda i, j, l: (j, i, 0),
                memory_space=pltpu.VMEM,
            ),
        ]

    if approx:
        nt_out = -(-nt // SPAN)
        out_idx = lambda i, j, l: (i, j // SPAN)  # noqa: E731
        kernel = _make_pq_topk_kernel(TILE_N, kc, int8_lut, with_res, lut2)
        vals, idxs = pl.pallas_call(
            kernel,
            grid=(qp // tile_q, nt, mpad // M_BLK),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((tile_q, SLOT), out_idx, memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_q, SLOT), out_idx, memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((qp, nt_out * SLOT), jnp.float32),
                jax.ShapeDtypeStruct((qp, nt_out * SLOT), jnp.int32),
            ],
            scratch_shapes=scratch,
            interpret=interpret,
        )(*operands)
        return merge_tile_topk_all(vals[:q], idxs[:q], k, recall_target)

    # ------------------------------------------------------------- exact
    def fallback():
        from ..pq import score_lut_xla
        from ..topk import blocked_topk

        codes_nm = codes_t.T  # [Npad, Mpad]
        if int8_lut:
            # Score with the SAME quantized-LUT arithmetic as the fused
            # kernel: acc = sum_m lutq (integer, exact in f32 well below
            # 2^24), then scale*acc + bias — bit-identical to the kernel,
            # because "exact" means exact selection over the int8-LUT
            # scores and the fallback must agree value-for-value.
            lut_eff = lut_flat[:q].reshape(q, mpad, kc)[:, :m].astype(
                jnp.float32
            )

            def affine(raw):
                return scale[:q] * raw + bias[:q]
        else:
            lut_eff = lut

            def affine(raw):
                return raw

        def score_block(b0, b1):
            sc = affine(score_lut_xla(
                lut_eff, jax.lax.slice_in_dim(codes_nm, b0, b1, axis=0)[:, :m]
            ))
            if with_res:
                from .sq_kernel import CORR_BLK

                c0, c1 = b0 // CORR_BLK, -(-b1 // CORR_BLK)
                add = jnp.repeat(
                    corr[:, c0:c1].astype(jnp.float32), CORR_BLK, axis=1
                )[:, : b1 - b0]
                sc = sc + rowadd[b0:b1].astype(jnp.float32)[None, :] + add
            gid = b0 + jnp.arange(sc.shape[1], dtype=jnp.int32)[None, :]
            return jnp.where(gid < nv, sc, NEG)

        return blocked_topk(score_block, n_valid, k)

    r = class_r(k, n_valid)
    ns_ = TILE_N // SLOT
    span = class_span(
        nt, k, r,
        span_cap=(PACK_MEMBERS // ns_) if int8_lut else None,
    )
    nt_out = -(-nt // span)
    width = nt_out * SLOT
    if k > r * width:
        return fallback()
    out_idx = lambda i, j, l: (i, j // span)  # noqa: E731
    kernel = _make_pq_class_kernel(TILE_N, span, r, kc, int8_lut,
                                   with_res, lut2)
    if int8_lut:
        dts = [jnp.int32] * (r + 1)
    else:
        dts = [jnp.float32, jnp.int32] * r + [jnp.float32]
    outs = pl.pallas_call(
        kernel,
        grid=(qp // tile_q, nt, mpad // M_BLK),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((tile_q, SLOT), out_idx, memory_space=pltpu.VMEM)
            for _ in dts
        ],
        out_shape=[jax.ShapeDtypeStruct((qp, width), dt) for dt in dts],
        scratch_shapes=scratch,
        interpret=interpret,
    )(*operands)

    if int8_lut:
        def key_to_score(key):
            return scale[:q] * key.astype(jnp.float32) + bias[:q]

        return merge_packed_verified(
            [o[:q] for o in outs[:r]], outs[r][:q], k,
            span=span, tile_n=TILE_N, n_valid=nv,
            key_to_score=key_to_score, fallback=fallback,
        )

    return merge_classes_verified(
        [outs[2 * j][:q] for j in range(r)],
        [outs[2 * j + 1][:q] for j in range(r)],
        outs[2 * r][:q], k, fallback,
    )


@partial(jax.jit, static_argnames=("n_valid", "interpret", "precision"))
def pq_scores_pallas(
    lut: jax.Array,  # f32 [Q, m, 256]
    codes_t: jax.Array,  # int8/uint8 [Mpad, Npad]  (Mpad multiple of M_BLK)
    *,
    n_valid: int,
    interpret: bool = None,
    precision: str = None,
) -> jax.Array:
    """[Q, n_valid] f32 PQ scores via one-hot MXU accumulation."""
    if interpret is None:
        interpret = interpret_mode()
    if precision is None:
        precision = _lut_precision()
    int8_lut = precision == "int8"
    q, m, k = lut.shape
    assert k in (K, K4)
    mpad, n = codes_t.shape
    assert n % TILE_N == 0, f"N={n} must be padded to {TILE_N}"
    assert mpad % M_BLK == 0
    # 256-row query tile: halves the per-corpus-tile one-hot build at
    # Q=256 (no extraction temporaries in the scores kernel).
    tile_q = min(256, round_up(q, 8))
    qp = round_up(q, tile_q)

    grid = (qp // tile_q, n // TILE_N, mpad // M_BLK)
    in_specs = [
        pl.BlockSpec(
            (M_BLK, TILE_N), lambda i, j, l: (l, j), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (tile_q, M_BLK * k),
            lambda i, j, l: (i, l),
            memory_space=pltpu.VMEM,
        ),
    ]
    if int8_lut:
        lut_flat, scale, bias = _quantize_lut(lut, mpad, qp)
        operands = (_as_i8(codes_t), lut_flat, scale, bias)
        in_specs += [
            pl.BlockSpec(
                (tile_q, 1), lambda i, j, l: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile_q, 1), lambda i, j, l: (i, 0), memory_space=pltpu.VMEM
            ),
        ]
        out = pl.pallas_call(
            _make_scores_kernel_i8(k),
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (tile_q, TILE_N), lambda i, j, l: (i, j),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((qp, n), jnp.float32),
            scratch_shapes=[pltpu.VMEM((tile_q, TILE_N), jnp.int32)],
            interpret=interpret,
        )(*operands)
        return out[:q, :n_valid]
    # bf16 path: lut -> bf16 [Qpad, Mpad*K] with zero entries for padding
    lut_flat = (
        pad_dim_to(pad_dim_to(lut, 1, mpad), 0, qp)
        .reshape(qp, mpad * k)
        .astype(jnp.bfloat16)
    )
    out = pl.pallas_call(
        _make_scores_kernel(k),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (tile_q, TILE_N), lambda i, j, l: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((qp, n), jnp.float32),
        interpret=interpret,
    )(_as_i8(codes_t), lut_flat)
    return out[:q, :n_valid]

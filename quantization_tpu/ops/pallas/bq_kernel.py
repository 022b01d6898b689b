"""Pallas BQ scoring kernel: XOR + popcount over bit-planes on the VPU.

The TPU replacement for impl_xor_popcnt_sse_uint128 (cpp/sse.c:49-70) and its
NEON twin. Codes live as uint32 bit-planes [W8, Npad] with the corpus axis N
on TPU lanes (W8 = plane words rounded up to the 8-sublane tile); queries are
a small [QP, 128] word matrix with queries on sublanes. Each of the W plane
rows XORs a broadcast query-word column against a corpus lane tile — a fully
vectorized [QP, TILE_N] VPU op per word — and ``lax.population_count``
accumulates. The Hamming->metric map (encoded_vectors_binary.rs:242-252) is
the fused epilogue.

Zero-padded plane words are skipped entirely (the loop runs over the true W),
and zero-padded corpus columns are sliced off by the wrapper.
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
from .sq_kernel import CORR_BLK, _apply_corr, _corr_cols, _mult_col

TILE_N = 2048
W_ALIGN = 8  # sublane tile for 32-bit planes
Q_LANES = 128  # query-word matrix lane padding


def _make_kernel(w: int, distance_type: DistanceType, invert: bool, dim: int):
    d = float(dim)
    dot = distance_type == DistanceType.DOT

    def kernel(qp_ref, p_ref, out_ref):
        acc = jnp.zeros(out_ref.shape, jnp.int32)
        for wi in range(w):  # static unroll over true plane words
            x = jnp.bitwise_xor(
                qp_ref[:, wi][:, None], p_ref[wi, :][None, :]
            )
            acc = acc + jax.lax.population_count(x).astype(jnp.int32)
        two_x = acc.astype(jnp.float32) * 2.0
        if dot:
            score = two_x - d if invert else d - two_x
        else:
            score = d - two_x if invert else two_x - d
        out_ref[:] = score

    return kernel


MXU_TILE_N = 512
MXU_TILE_Q = 128


def _mxu_tile_n(dp: int, n: int) -> int:
    """Widest corpus tile whose unpack temporaries (planes_rep i32 + bits
    int8, 5*dp*tn bytes) stay within ~8MB of the 16MB scoped-VMEM stack,
    and which divides the padded corpus. Wider tiles cut fused-search
    candidate traffic linearly."""
    tn = MXU_TILE_N
    while tn * 2 <= 2048 and n % (tn * 2) == 0 and 5 * dp * tn * 2 <= 8 * 2**20:
        tn *= 2
    return tn


def _mxu_kernel(mult_ref, qs_ref, p_ref, qb_ref, out_ref):
    """Unpack bit-planes to 0/1 int8 on the VPU, score on the MXU.

    qs_ref: int8 [TQ, Dp] query rows as +-1 (0 on padded dims);
    p_ref: uint32 [W8, TN] packed corpus words; out = mult * (qs . bits) + qb.
    The word rows are replicated 32x along sublanes and shifted by
    (row % 32), so row w*32+j of the unpacked tile is bit j (LSB-first, the
    storage bit order of encoded_vectors_binary.rs:193-208) of word w.
    """
    bits = _unpack_bits(p_ref)
    acc = jax.lax.dot_general(
        qs_ref[:],
        bits,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out_ref[:] = mult_ref[:] * acc.astype(jnp.float32) + qb_ref[:]


def _unpack_bits(p_ref):
    """uint32 [W8, TN] packed words -> int8 0/1 [W8*32, TN]: word rows
    replicated 32x along sublanes, shifted by (row % 32), LSB-first."""
    w8, tn = p_ref.shape
    dp = w8 * 32
    planes_rep = jnp.repeat(p_ref[:].astype(jnp.int32), 32, axis=0)
    shifts = jax.lax.broadcasted_iota(jnp.int32, (dp, tn), 0) % 32
    return jnp.bitwise_and(
        jax.lax.shift_right_logical(planes_rep, shifts), 1
    ).astype(jnp.int8)


def _make_mxu_topk_kernel(tile_n: int, with_corr: bool = False):
    """Approx kernel: queries-outer grid (i, j) — the SPAN-merged slot
    block needs consecutive corpus tiles; runs a 256-row query tile so the
    bit unpack happens once per corpus tile at Q<=256. The validity
    cutoff arrives as an SMEM scalar (``nv_ref``) so sharded callers can
    pass a per-shard, data-dependent count (sharded.py). ``with_corr``:
    the residual-IVF per-(query, CORR_BLK-block) additive is applied
    BEFORE extraction (sq_kernel._apply_corr)."""

    def kernel(nv_ref, mult_ref, qs_ref, p_ref, qb_ref, *rest):
        if with_corr:
            corr_ref, outv_ref, outi_ref = rest
        else:
            outv_ref, outi_ref = rest
        j = pl.program_id(1)
        bits = _unpack_bits(p_ref)
        acc = jax.lax.dot_general(
            qs_ref[:],
            bits,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        scores = mult_ref[:] * acc.astype(jnp.float32) + qb_ref[:]
        if with_corr:
            scores = _apply_corr(scores, corr_ref)
        base = j * tile_n
        gid = base + jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(gid < nv_ref[0], scores, NEG)
        vals, idx = extract_approx_tile(scores, base)
        combine_slots(outv_ref, outi_ref, vals, idx, j % SPAN == 0)

    return kernel


def _make_mxu_class_ids_kernel(
    tile_n: int, span: int, r: int, with_corr: bool = False
):
    """Exact kernel, f32-keyed class-top-r-with-ids ladder (ktile) — the
    residual-BQ path: the bucket additive (corr) and the asymmetric
    query's fractional multiplier make scores non-integer, so the packed
    int chains can't carry them (the same rule as residual-PQ,
    pq_kernel._make_pq_class_kernel with_res)."""

    def kernel(nv_ref, mult_ref, qs_ref, p_ref, qb_ref, *rest):
        if with_corr:
            corr_ref, out_refs = rest[0], rest[1:]
        else:
            out_refs = rest
        j = pl.program_id(1)
        bits = _unpack_bits(p_ref)
        acc = jax.lax.dot_general(
            qs_ref[:],
            bits,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        scores = mult_ref[:] * acc.astype(jnp.float32) + qb_ref[:]
        if with_corr:
            scores = _apply_corr(scores, corr_ref)
        base = j * tile_n
        gid = base + jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(gid < nv_ref[0], scores, NEG)
        ms, is_, spill = extract_class_topr_ids(scores, base, r)
        combine_class_topr_ids(out_refs, ms, is_, spill, r, j % span == 0)

    return kernel


def _make_mxu_topk_kernel_indexed(tile_n: int, with_corr: bool = False):
    """Approx kernel over a SELECTED tile set: the corpus block for grid
    step j is tile ``sel_ref[j]`` (scalar-prefetch index map) — the IVF
    probed-bucket scan streams only the selected plane columns from HBM.
    Selected tiles hold only valid rows (IVF pads duplicate real rows),
    so no validity cutoff is needed; ids are global corpus rows."""

    def kernel(sel_ref, mult_ref, qs_ref, p_ref, qb_ref, *rest):
        if with_corr:
            corr_ref, outv_ref, outi_ref = rest
        else:
            outv_ref, outi_ref = rest
        j = pl.program_id(1)
        bits = _unpack_bits(p_ref)
        acc = jax.lax.dot_general(
            qs_ref[:],
            bits,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        scores = mult_ref[:] * acc.astype(jnp.float32) + qb_ref[:]
        if with_corr:
            scores = _apply_corr(scores, corr_ref)
        base = sel_ref[j] * tile_n
        vals, idx = extract_approx_tile(scores, base)
        combine_slots(outv_ref, outi_ref, vals, idx, j % SPAN == 0)

    return kernel


def indexed_tile_n(dp: int, bucket_size: int) -> int:
    """Widest MXU corpus tile that divides ``bucket_size`` under the same
    VMEM bound as ``_mxu_tile_n`` (0 if the bucket can't be tiled)."""
    return 0 if bucket_size % MXU_TILE_N else _mxu_tile_n(dp, bucket_size)


@partial(
    jax.jit,
    static_argnames=(
        "distance_type", "invert", "dim", "k", "tile_n", "interpret",
        "recall_target",
    ),
)
def bq_search_indexed(
    qplanes: jax.Array,  # uint32 [Q, W]  (None with query_affine)
    planes: jax.Array,  # uint32 [W8, Npad]
    tile_sel: jax.Array,  # i32 [T] tile ids (tile t = cols [t*tile_n, ...))
    corr: jax.Array = None,  # f32 [T*(tile_n/CORR_BLK), Q] SELECTION order
    *,
    distance_type: DistanceType,
    invert: bool,
    dim: int,
    k: int,
    tile_n: int,
    interpret: bool = None,
    recall_target: float = 0.95,
    query_affine=None,  # (qs int8 [Q, Dp], mult f32 (1,) or [Q, 1], qb f32 [Q, 1])
):
    """Fused BQ search over a SELECTED set of tile_n-column tiles (the IVF
    probe scan, approx selection): the corpus axis of the grid walks
    ``tile_sel`` via a scalar-prefetch index map, so only the probed
    buckets' plane columns stream from HBM — no compaction copy, no
    [Q, T*tile_n] matrix. Selected tiles must hold only valid rows (the
    IVF layout guarantees it). Returns (scores f32[Q, k], ids i32[Q, k])
    with ids GLOBAL corpus rows.

    ``query_affine`` overrides the packed-query sign path: the kernel
    scores ``mult * (qs . bits) + qb`` with caller-built operands — the
    residual-BQ asymmetric query (quantized VALUES, not signs; see
    models/ivf.py _residual_query_bq). ``corr`` is the residual bucket
    additive in the sq_kernel selection-order transposed layout."""
    if interpret is None:
        interpret = interpret_mode()
    w8, n = planes.shape
    assert n % tile_n == 0, f"N={n} must be padded to {tile_n}"
    dp = w8 * 32
    if query_affine is None:
        q = qplanes.shape[0]
        qs, pq = _query_signs(qplanes, w8, dim)
        mult, qb = _metric_affine(distance_type, invert, dim, pq)
    else:
        qs, mult, qb = query_affine
        q = qs.shape[0]
        assert qs.shape[1] == dp and qb.shape == (q, 1)
    tq = min(256, round_up(q, 32))
    qp = round_up(q, tq)
    qs_p = pad_dim_to(qs, 0, qp)
    qb_p = pad_dim_to(qb, 0, qp)
    mult_p = pad_dim_to(_mult_col(mult, q), 0, qp)
    nt = tile_sel.shape[0]
    qt = qp // tq
    nt_out = -(-nt // SPAN)
    with_corr = corr is not None
    cw = tile_n // CORR_BLK
    if with_corr:
        assert corr.shape == (nt * cw, q), (
            f"corr must be selection-order [T*{cw}, Q]: "
            f"{corr.shape} != {(nt * cw, q)}"
        )
        corr_ops = (
            pad_dim_to(corr.astype(jnp.float32), 1, qp)[:, :, None],
        )  # [T*cw, qp, 1]
        corr_specs = [
            pl.BlockSpec(
                (cw, tq, 1),
                lambda i, j, s: (j, i, 0),
                memory_space=pltpu.VMEM,
            )
        ]
    else:
        corr_ops, corr_specs = (), []
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(qt, nt),
        in_specs=[
            pl.BlockSpec(
                (tq, 1), lambda i, j, s: (i, 0), memory_space=pltpu.VMEM
            ),  # per-query multiplier [qp, 1]
            pl.BlockSpec(
                (tq, dp), lambda i, j, s: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (w8, tile_n), lambda i, j, s: (0, s[j]),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tq, 1), lambda i, j, s: (i, 0), memory_space=pltpu.VMEM
            ),
        ]
        + corr_specs,
        out_specs=[
            pl.BlockSpec(
                (tq, SLOT), lambda i, j, s: (i, j // SPAN),
                memory_space=pltpu.VMEM,
            )
            for _ in range(2)
        ],
    )
    vals, idxs = pl.pallas_call(
        _make_mxu_topk_kernel_indexed(tile_n, with_corr),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((qp, nt_out * SLOT), jnp.float32),
            jax.ShapeDtypeStruct((qp, nt_out * SLOT), jnp.int32),
        ],
        interpret=interpret,
    )(tile_sel.astype(jnp.int32), mult_p, qs_p, planes, qb_p, *corr_ops)
    return merge_tile_topk_all(vals[:q], idxs[:q], k, recall_target)


def _make_mxu_packed_kernel(tile_n: int, span: int, sign: int, r: int):
    """Exact kernel: integer BQ scores pack (sign*acc << PACK_BITS |
    member) so the per-class top-r rides pure int max/min chains with ids
    FREE (ktile packed extraction; score ties — BQ's everyday case — cost
    nothing because packed keys are distinct). Validity cutoff via SMEM
    scalar, as in the approx kernel."""
    ns = tile_n // SLOT

    def kernel(nv_ref, mult_ref, qs_ref, p_ref, qb_ref, *out_refs):
        j = pl.program_id(1)
        bits = _unpack_bits(p_ref)
        acc = jax.lax.dot_general(
            qs_ref[:],
            bits,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        key = (sign * acc) << PACK_BITS
        base = j * tile_n
        gid = base + jax.lax.broadcasted_iota(jnp.int32, key.shape, 1)
        key = jnp.where(gid < nv_ref[0], key, PACK_MIN)
        ps, spill = extract_class_topr_packed(key, (j % span) * ns, r)
        combine_class_topr_packed(out_refs, ps, spill, r, j % span == 0)

    return kernel


def _query_signs(qplanes, w8, dim):
    """Packed query words -> (+-1 int8 [Q, W8*32] with 0 pads, popcounts)."""
    q = qplanes.shape[0]
    dp = w8 * 32
    words = qplanes.astype(jnp.uint32)
    if qplanes.shape[1] < w8:
        words = jnp.pad(words, ((0, 0), (0, w8 - qplanes.shape[1])))
    jbits = (
        jax.lax.shift_right_logical(
            words[:, :, None], jnp.arange(32, dtype=jnp.uint32)[None, None, :]
        )
        & 1
    ).astype(jnp.int32)  # [Q, W8, 32]
    qbits = jbits.reshape(q, dp)
    valid = (jnp.arange(dp) < dim)[None, :]
    qs = jnp.where(valid, 2 * qbits - 1, 0).astype(jnp.int8)
    pq = jnp.sum(jnp.where(valid, qbits, 0), axis=1).astype(jnp.float32)
    return qs, pq


def _metric_affine(distance_type, invert, dim, pq):
    """score = mult * (qs.bits) + qb per the Hamming->metric truth table
    (encoded_vectors_binary.rs:242-252), with hamming = pq - qs.bits."""
    dot = distance_type == DistanceType.DOT
    s = 1.0 if (dot != invert) else -1.0
    mult = jnp.full((1,), 2.0 * s, jnp.float32)
    qb = (s * (float(dim) - 2.0 * pq)).reshape(-1, 1)
    return mult, qb


@partial(
    jax.jit,
    static_argnames=(
        "distance_type", "invert", "dim", "n_valid", "k", "mode",
        "interpret", "recall_target",
    ),
)
def bq_search_mxu(
    qplanes: jax.Array,  # uint32 [Q, W]  (None with query_affine)
    planes: jax.Array,  # uint32 [W8, Npad]
    corr: jax.Array = None,  # f32 [Q, Npad/CORR_BLK] per-block additive
    *,
    distance_type: DistanceType,
    invert: bool,
    dim: int,
    n_valid: int,
    k: int,
    mode: str = "exact",
    interpret: bool = None,
    n_valid_dyn: jax.Array = None,
    recall_target: float = 0.95,
    query_affine=None,  # (qs int8 [Q, Dp], mult f32 (1,) or [Q, 1], qb f32 [Q, 1])
):
    """Fused BQ search: on-chip bit unpack + int8 MXU scoring + in-tile
    top-k — (scores f32[Q, k], indices i32[Q, k]) without a [Q, N] matrix.
    ``mode="approx"``: one-pass strided segment-max extraction (cost
    independent of k, any k <= SLOT) — the coarse-stage default.

    ``n_valid_dyn``: optional TRACED i32 scalar overriding the validity
    cutoff (must be <= the static ``n_valid``, which still bounds shapes
    and fallback blocking) — lets shard_map callers mask the last shard's
    data-dependent padding without a per-shard recompile (sharded.py).

    Scores are integer-exact. BQ scores tie heavily (they are small
    integers); among tied scores the returned indices may differ from a
    flat lax.top_k on real hardware (Mosaic argmax tie order) — the same
    freedom the reference's per-point heap has (ann_benchmark_data.rs:151).
    Exact mode is value-exact: packed (score, member) int32 keys make
    per-class top-r selection tie-free (r adapts to k via ktile.class_r),
    and the (r+1)-th value bounds everything dropped — a class hiding
    more than r entries above the k-th score (~C(k, r+1)/C^r per query)
    triggers the corpus-blocked fallback via lax.cond.

    ``query_affine`` / ``corr`` (the residual-BQ path, models/ivf.py):
    caller-built ``mult * (qs . bits) + qb`` operands (asymmetric
    quantized-VALUE queries) and the per-(query, CORR_BLK-block) bucket
    additive. Scores are then non-integer, so exact mode rides the
    f32-keyed class-top-r-with-ids ladder instead of the packed chains
    (the same rule as residual-PQ).
    """
    assert k <= FUSED_K_MAX or mode == "approx", (
        f"exact fused search caps k at {FUSED_K_MAX}, got {k}"
    )
    if interpret is None:
        interpret = interpret_mode()
    w8, n = planes.shape
    tn = _mxu_tile_n(w8 * 32, n)
    assert n % tn == 0, f"N={n} must be padded to {tn}"
    dp = w8 * 32

    if query_affine is None:
        q = qplanes.shape[0]
        qs, pq = _query_signs(qplanes, w8, dim)
        mult, qb = _metric_affine(distance_type, invert, dim, pq)
    else:
        qs, mult, qb = query_affine
        q = qs.shape[0]
        assert qs.shape[1] == dp and qb.shape == (q, 1)
    mult_c = _mult_col(mult, q)
    nv = n_valid if n_valid_dyn is None else n_valid_dyn
    nv_op = jnp.asarray(nv, jnp.int32).reshape(1)
    with_corr = corr is not None
    cw = tn // CORR_BLK
    if with_corr:
        assert corr.shape[1] == n // CORR_BLK, (
            f"corr needs one column per {CORR_BLK} padded rows: "
            f"{corr.shape[1]} != {n // CORR_BLK}"
        )

    approx = mode == "approx"
    # 256-row query tiles in both modes (extraction temporaries
    # are small): at Q<=256 the per-corpus-tile unpack happens once.
    tq = min(256, round_up(q, 32))
    qp = round_up(q, tq)
    qs_p = pad_dim_to(qs, 0, qp)
    qb_p = pad_dim_to(qb, 0, qp)
    mult_p = pad_dim_to(mult_c, 0, qp)
    nt = n // tn
    qt = qp // tq
    if with_corr:
        corr_p = pad_dim_to(corr.astype(jnp.float32), 0, qp)
        corr_ops = (jnp.transpose(corr_p)[:, :, None],)  # [NC, qp, 1]
        corr_specs = [
            pl.BlockSpec(
                (cw, tq, 1), lambda i, j: (j, i, 0),
                memory_space=pltpu.VMEM,
            )
        ]
    else:
        corr_ops, corr_specs = (), ()
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # n_valid cutoff (1,)
        pl.BlockSpec(
            (tq, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM
        ),  # per-query multiplier [qp, 1]
        pl.BlockSpec((tq, dp), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((w8, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((tq, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
    ] + list(corr_specs)
    if approx:
        nt_out = -(-nt // SPAN)
        kernel = _make_mxu_topk_kernel(tn, with_corr)
        vals, idxs = pl.pallas_call(
            kernel,
            grid=(qt, nt),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec(
                    (tq, SLOT),
                    lambda i, j: (i, j // SPAN),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (tq, SLOT),
                    lambda i, j: (i, j // SPAN),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((qp, nt_out * SLOT), jnp.float32),
                jax.ShapeDtypeStruct((qp, nt_out * SLOT), jnp.int32),
            ],
            interpret=interpret,
        )(nv_op, mult_p, qs_p, planes, qb_p, *corr_ops)
        return merge_tile_topk_all(vals[:q], idxs[:q], k, recall_target)

    # ------------------------------------------------------------- exact
    qs0, qb0 = qs[:q], qb[:q]

    def fallback():
        from ..topk import blocked_topk

        def score_block(b0, b1):
            blk = jax.lax.slice_in_dim(planes, b0, b1, axis=1)
            rep = jnp.repeat(blk.astype(jnp.int32), 32, axis=0)
            shifts = (jnp.arange(dp, dtype=jnp.int32) % 32)[:, None]
            bits = jnp.bitwise_and(
                jax.lax.shift_right_logical(rep, shifts), 1
            ).astype(jnp.int8)
            acc = jax.lax.dot_general(
                qs0,
                bits,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            sc = mult_c * acc.astype(jnp.float32) + qb0
            if with_corr:
                sc = sc + _corr_cols(corr, b0, b1)
            gid = b0 + jnp.arange(sc.shape[1], dtype=jnp.int32)[None, :]
            return jnp.where(gid < nv, sc, NEG)

        # Smaller blocks than the generic default: the jnp unpack
        # materializes a [dp, block] int32 transient. Blocking covers the
        # STATIC n_valid; the (possibly traced) nv cutoff rides the mask.
        return blocked_topk(score_block, n_valid, k, block_rows=1 << 17)

    if with_corr or query_affine is not None:
        # f32-keyed exact: the corr additive / fractional multiplier break
        # the packed int key order, so selection runs the class-top-r-
        # with-ids ladder over corrected f32 scores (≙ residual-SQ/PQ).
        r = class_r(k, n_valid)
        span = class_span(nt, k, r)
        nt_out = -(-nt // span)
        width = nt_out * SLOT
        if k > r * width:
            return fallback()
        kernel = _make_mxu_class_ids_kernel(tn, span, r, with_corr)
        block = lambda i, j: (i, j // span)  # noqa: E731
        dts = [jnp.float32, jnp.int32] * r + [jnp.float32]
        outs = pl.pallas_call(
            kernel,
            grid=(qt, nt),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((tq, SLOT), block, memory_space=pltpu.VMEM)
                for _ in dts
            ],
            out_shape=[
                jax.ShapeDtypeStruct((qp, width), dt) for dt in dts
            ],
            interpret=interpret,
        )(nv_op, mult_p, qs_p, planes, qb_p, *corr_ops)
        return merge_classes_verified(
            [outs[2 * j][:q] for j in range(r)],
            [outs[2 * j + 1][:q] for j in range(r)],
            outs[2 * r][:q], k, fallback,
        )

    r = class_r(k, n_valid)
    ns = tn // SLOT
    span = class_span(nt, k, r, span_cap=PACK_MEMBERS // ns)
    nt_out = -(-nt // span)
    width = nt_out * SLOT
    if k > r * width or (dim << PACK_BITS) >= (1 << 30):
        return fallback()  # pool too narrow for k / packed key overflow
    sign = 1 if (distance_type == DistanceType.DOT) != invert else -1
    kernel = _make_mxu_packed_kernel(tn, span, sign, r)
    block = lambda i, j: (i, j // span)  # noqa: E731
    outs = pl.pallas_call(
        kernel,
        grid=(qt, nt),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((tq, SLOT), block, memory_space=pltpu.VMEM)
            for _ in range(r + 1)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((qp, width), jnp.int32)
            for _ in range(r + 1)
        ],
        interpret=interpret,
    )(nv_op, mult_p, qs_p, planes, qb_p)

    def key_to_score(key):  # score = mult*acc + qb = 2*key + qb
        return 2.0 * key.astype(jnp.float32) + qb0

    return merge_packed_verified(
        [o[:q] for o in outs[:r]], outs[r][:q], k,
        span=span, tile_n=tn, n_valid=nv,
        key_to_score=key_to_score, fallback=fallback,
    )


@partial(
    jax.jit,
    static_argnames=("distance_type", "invert", "dim", "n_valid", "interpret"),
)
def bq_scores_mxu(
    qplanes: jax.Array,  # uint32 [Q, W]  (word-major query rows)
    planes: jax.Array,  # uint32 [W8, Npad]
    *,
    distance_type: DistanceType,
    invert: bool,
    dim: int,
    n_valid: int,
    interpret: bool = None,
) -> jax.Array:
    """[Q, n_valid] f32 binary scores at MXU speed.

    The identity: with query signs qs in {-1,+1} (0 on pad) and corpus bits
    vb in {0,1},  qs.vb = 2*common - pv  and  hamming = pq + pv - 2*common,
    so  hamming = pq - qs.vb  — one int8 MXU matmul against bits unpacked
    on-chip from the 32x-compressed planes (HBM reads stay packed), replacing
    the reference's xor+popcnt loop (cpp/sse.c:49-70) with an affine epilogue
    on the Hamming->metric table (encoded_vectors_binary.rs:242-252).
    Integer-exact: acc and pq are exact in int32/f32.
    """
    if interpret is None:
        interpret = interpret_mode()
    q = qplanes.shape[0]
    w8, n = planes.shape
    tn = _mxu_tile_n(w8 * 32, n)
    assert n % tn == 0, f"N={n} must be padded to {tn}"
    dp = w8 * 32

    qs, pq = _query_signs(qplanes, w8, dim)
    mult, qb = _metric_affine(distance_type, invert, dim, pq)

    tq = min(MXU_TILE_Q, round_up(q, 32))
    qp = round_up(q, tq)
    qs = pad_dim_to(qs, 0, qp)
    qb = pad_dim_to(qb, 0, qp)
    mult = pad_dim_to(_mult_col(mult, q), 0, qp)

    out = pl.pallas_call(
        _mxu_kernel,
        grid=(qp // tq, n // tn),
        in_specs=[
            pl.BlockSpec(
                (tq, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM
            ),  # per-query multiplier [qp, 1]
            pl.BlockSpec((tq, dp), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w8, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tq, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tq, tn), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((qp, n), jnp.float32),
        interpret=interpret,
    )(mult, qs, planes, qb)
    return out[:q, :n_valid]


@partial(
    jax.jit,
    static_argnames=("distance_type", "invert", "dim", "n_valid", "interpret"),
)
def bq_scores_pallas(
    qplanes: jax.Array,  # uint32 [Q, W]  (word-major query rows)
    planes: jax.Array,  # uint32 [W8, Npad]
    *,
    distance_type: DistanceType,
    invert: bool,
    dim: int,
    n_valid: int,
    interpret: bool = None,
) -> jax.Array:
    """[Q, n_valid] f32 binary scores; Npad must be a TILE_N multiple."""
    if interpret is None:
        interpret = interpret_mode()
    q, w = qplanes.shape
    w8, n = planes.shape
    assert n % TILE_N == 0, f"N={n} must be padded to {TILE_N}"
    assert w <= w8
    qp = round_up(q, 8)
    qpad = pad_dim_to(pad_dim_to(qplanes, 0, qp), 1, Q_LANES)

    kernel = _make_kernel(w, distance_type, invert, dim)
    out = pl.pallas_call(
        kernel,
        grid=(n // TILE_N,),
        in_specs=[
            pl.BlockSpec((qp, Q_LANES), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w8, TILE_N), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (qp, TILE_N), lambda j: (0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((qp, n), jnp.float32),
        interpret=interpret,
    )(qpad, planes)
    return out[:q, :n_valid]

"""In-kernel per-tile top-k extraction (shared by the fused search kernels).

The memory wall of "matmul then lax.top_k" is the [Q, N] f32 score matrix:
at N=10M that is 10GB of HBM writes + reads per query batch. The fused
kernels never materialize it — each (query-tile, corpus-tile) grid step
reduces its [TQ, TN] score tile to per-stride-class candidates, and only
[Q, blocks, r*128] candidate slots reach HBM. A final cheap ``lax.top_k``
over the survivors merges tiles.

Exact mode (round 3): per-class top-2-with-ids extraction on max/min
chains with eq-reused selects (~10 VPU ops/element, cost independent of
k — the old sorted-insert's select chains measured 3-4x costlier per op,
tools/experiments/exp_stream2.py), plus a value-only third place whose
merge-time check proves exactness; the rare violation falls back to a
corpus-blocked scan via lax.cond. Integer-scored quantizers (BQ, PQ
int8-LUT) instead pack (score, member) into one int32 so per-class top-3
WITH ids rides pure max/min chains (~7 ops/element, tie-free).

This replaces the reference caller's per-point bounded heap
(ann_benchmark_data.rs:151-166) with a device-resident verified selection.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# Python literal (not a traced jnp scalar): kernels close over it, and
# Pallas rejects captured constant arrays.
NEG = -3.4e38

# Candidate slots per (query row, corpus tile) written to HBM. Fixed at the
# 128-lane tile so the output block shape is Mosaic-legal; slots beyond k
# hold NEG/-1.
SLOT = 128

# Exact fused search cap. The class-top2 / packed extractions' cost does
# not scale with k; the cap is set by the merge-pool width alone (the
# round-2 k-round extraction capped this at 64; per-k measurements:
# tools/experiments/exp_kmax.py).
FUSED_K_MAX = 1024

# Approx mode has no per-tile k rounds — each tile span always emits SLOT
# strided maxima and the merge selects top-k over ALL of them (nt/SPAN *
# SLOT candidates, ~156k at 10M points), so k is bounded by the merge
# width, not the tile. This cap keeps the coarse stage of two-stage
# retrieval fused at large oversampling (a score-matrix fallback at 10M
# would materialize 10GB). Recall decays gracefully as k approaches the
# candidate pool size.
APPROX_K_MAX = 4096


# ------------------------------------------- class-top2-with-ids + spill
#
# Round-3 exact selection for f32-scored quantizers (SQ; PQ f32-LUT).
# Per stride class (lane l of a span block) the kernel keeps (m1, i1,
# m2, i2, m3): the top-2 values WITH ids plus a value-only third place —
# max/min chains with eq-reused selects, ~10 VPU ops/element, cost
# independent of k. (A cheaper rescue design that dropped i2 and
# re-scored flagged classes outside the kernel was built and measured
# first: the DMA row gather it needs is ~0.3us/row latency-bound, 6.6 ms
# at 100k/k=10 — structurally too slow at every scale.) The merge pools
# top-1 and top-2 (both ids known) and proves exactness with the spill
# bound: no class third place strictly above the k-th pooled score; the
# rare violation (a class hiding >= 3 of the top-k, P ~ C(k,3)/C^2 per
# query) reruns through the corpus-blocked scan via lax.cond. Ids of
# tied values may differ from lax.top_k order — the reference heap's own
# freedom (ann_benchmark_data.rs:151-166).


def extract_class_top2_ids(scores, base_index):
    """scores f32[TQ, TN] -> (m1, i1, m2, i2, m3), each [TQ, SLOT].

    Class l = strided lane set {l, l+SLOT, ...} of the tile; top-2 values
    with global ids, plus the value-only third place (the spill bound)."""
    tq, tn = scores.shape
    ns = tn // SLOT
    lane = jax.lax.broadcasted_iota(jnp.int32, (tq, SLOT), 1)
    m1 = jnp.full((tq, SLOT), NEG, jnp.float32)
    m2 = jnp.full((tq, SLOT), NEG, jnp.float32)
    m3 = jnp.full((tq, SLOT), NEG, jnp.float32)
    i1 = jnp.full((tq, SLOT), -1, jnp.int32)
    i2 = jnp.full((tq, SLOT), -1, jnp.int32)
    for s in range(ns):
        seg = scores[:, s * SLOT : (s + 1) * SLOT]
        sid = base_index + s * SLOT + lane
        m1n = jnp.maximum(m1, seg)
        took = seg == m1n          # on ties the newer element takes slot 1
        t = jnp.minimum(m1, seg)   # the loser falls to the slot-2 contest
        ti = jnp.where(took, i1, sid)
        m2n = jnp.maximum(m2, t)
        m3 = jnp.maximum(m3, jnp.minimum(m2, t))
        i2 = jnp.where(t == m2n, ti, i2)
        i1 = jnp.where(took, sid, i1)
        m1, m2 = m1n, m2n
    return m1, i1, m2, i2, m3


def combine_class_top2_ids(refs, m1, i1, m2, i2, m3, is_first):
    """Merge a tile's (m1, i1, m2, i2, m3) into the revisited block
    outputs (refs = 5 refs in the same order)."""
    r1, ri1, r2, ri2, r3 = refs

    @pl.when(is_first)
    def _init():
        r1[:] = m1
        ri1[:] = i1
        r2[:] = m2
        ri2[:] = i2
        r3[:] = m3

    @pl.when(jnp.logical_not(is_first))
    def _merge():
        a1, ai1, a2, ai2, a3 = r1[:], ri1[:], r2[:], ri2[:], r3[:]
        h1 = jnp.maximum(a1, m1)
        wins = m1 == h1
        l1 = jnp.minimum(a1, m1)
        li1 = jnp.where(wins, ai1, i1)
        h2 = jnp.maximum(a2, m2)
        hi2 = jnp.where(m2 == h2, i2, ai2)
        m2n = jnp.maximum(l1, h2)
        # 3rd of the union: the loser of (l1, h2), the loser of the 2nds,
        # or either 3rd place.
        r3[:] = jnp.maximum(
            jnp.minimum(l1, h2),
            jnp.maximum(jnp.minimum(a2, m2), jnp.maximum(a3, m3)),
        )
        r1[:] = h1
        ri1[:] = jnp.where(wins, i1, ai1)
        r2[:] = m2n
        ri2[:] = jnp.where(h2 == m2n, hi2, li1)


def class_span(nt: int) -> int:
    """Span (corpus tiles per candidate block) for the class extractions:
    as wide as possible — candidate width is the only cost the span
    controls now (no out-of-kernel rescue)."""
    return max(1, min(32, nt))


def merge_classes_verified(m1, i1, m2, i2, m3, k: int, fallback):
    """Exact merge of the class-top2-with-ids candidates: pool top-1 and
    top-2 per class, select exactly, and prove no class hid a third entry
    at or above the k-th score (strictly above -> missing value; the tie
    case is a legal id swap). Violation -> ``fallback()`` via lax.cond."""
    pool_v = jnp.concatenate([m1, m2], axis=1)
    pool_i = jnp.concatenate([i1, i2], axis=1)
    kk = min(k, pool_v.shape[1])
    s, pos = jax.lax.top_k(pool_v, kk)
    gi = jnp.take_along_axis(pool_i, pos, axis=1)
    if kk < k:
        s = jnp.pad(s, ((0, 0), (0, k - kk)), constant_values=NEG)
        gi = jnp.pad(gi, ((0, 0), (0, k - kk)), constant_values=-1)
    viol = jnp.any(jnp.max(m3, axis=1) > s[:, kk - 1])
    return jax.lax.cond(viol, fallback, lambda: (s, gi))


# ----------------------------------------------------- packed extraction
#
# Integer-scored quantizers (BQ Hamming metrics; PQ with the int8 LUT)
# fit (score, member) into ONE int32: score * 2^PACK_BITS + member, with
# member the element's index within its stride class. Ids then ride the
# max/min value chains for FREE — per-class top-3 costs ~7 int ops per
# element, exact ids included, and heavy score ties (BQ's everyday case)
# cost nothing because packed keys are distinct. The merge pools the
# top-2 (with recovered ids); the top-3 value is the spill bound proving
# exactness (a class hiding a 4th... entry above the k-th score triggers
# the corpus-blocked fallback — probability ~C(k,3)/C^2 per query).

PACK_BITS = 9  # member bits: up to 512 class members per block
PACK_MEMBERS = 1 << PACK_BITS
PACK_MIN = -(1 << 30)


def extract_class_top3_packed(keys, member_base: int):
    """keys i32[TQ, TN] (score already shifted left PACK_BITS; invalid
    lanes PACK_MIN) -> (p1, p2, p3) [TQ, SLOT] packed per-class top-3.

    ``member_base``: member index of this tile's first segment within its
    span block (the kernel passes (j % span) * ns)."""
    tq, tn = keys.shape
    ns = tn // SLOT
    p1 = jnp.full((tq, SLOT), PACK_MIN, jnp.int32)
    p2 = jnp.full((tq, SLOT), PACK_MIN, jnp.int32)
    p3 = jnp.full((tq, SLOT), PACK_MIN, jnp.int32)
    for s in range(ns):
        pk = keys[:, s * SLOT : (s + 1) * SLOT] + (member_base + s)
        t1 = jnp.minimum(p1, pk)
        p1 = jnp.maximum(p1, pk)
        t2 = jnp.minimum(p2, t1)
        p2 = jnp.maximum(p2, t1)
        p3 = jnp.maximum(p3, t2)
    return p1, p2, p3


def combine_class_top3_packed(refs, p1, p2, p3, is_first):
    """Merge a tile's packed top-3 into the revisited block outputs
    (refs = (p1_ref, p2_ref, p3_ref)). Exact: merging two sorted triples'
    top-3 needs only the pairwise min/max ladder below."""
    r1, r2, r3 = refs

    @pl.when(is_first)
    def _init():
        r1[:] = p1
        r2[:] = p2
        r3[:] = p3

    @pl.when(jnp.logical_not(is_first))
    def _merge():
        a1, a2, a3 = r1[:], r2[:], r3[:]
        h1 = jnp.maximum(a1, p1)
        l1 = jnp.minimum(a1, p1)
        h2 = jnp.maximum(a2, p2)
        # 2nd of the union = max(loser of the tops, both 2nds); 3rd =
        # max(what 2nd displaced, loser of the 2nds, both 3rds).
        r1[:] = h1
        r2[:] = jnp.maximum(l1, h2)
        r3[:] = jnp.maximum(
            jnp.minimum(l1, h2),
            jnp.maximum(jnp.minimum(a2, p2), jnp.maximum(a3, p3)),
        )


def unpack_class(p, span: int, tile_n: int, shift_bits: int = PACK_BITS):
    """Packed block outputs [Q, W] -> (score_key i32 [Q, W], global id
    i32 [Q, W]). Class c of column c: block b = c // SLOT, lane =
    c % SLOT; member m decodes to corpus id b*span*tile_n +
    (m // ns)*tile_n + (m % ns)*SLOT + lane."""
    q, w = p.shape
    ns = tile_n // SLOT
    key = p >> shift_bits  # arithmetic: exact for negative scores
    member = p & (PACK_MEMBERS - 1)
    c = jax.lax.broadcasted_iota(jnp.int32, (q, w), 1)
    b = c // SLOT
    lane = c % SLOT
    gid = b * (span * tile_n) + (member // ns) * tile_n + (member % ns) * SLOT + lane
    return key, gid


def packed_span(nt: int) -> int:
    """Widest span whose block member count fits PACK_BITS."""
    return max(1, min(32, nt))


def merge_packed_verified(p1, p2, p3, k: int, *, span, tile_n, n_valid,
                          key_to_score, fallback):
    """Exact merge of the packed top-3 extraction: pool = top-1 and top-2
    per class (ids decoded from the pack), spill bound = top-3 value.
    ``key_to_score(key i32) -> f32`` applies the quantizer's affine
    Hamming/LUT map per query. viol = any 3rd-place SCORE (member bits
    stripped -> no false positives from id tiebreaks) strictly above the
    k-th pooled score -> corpus-blocked ``fallback()`` via lax.cond."""
    k1, i1 = unpack_class(p1, span, tile_n)
    k2, i2 = unpack_class(p2, span, tile_n)
    k3 = p3 >> PACK_BITS
    s1 = jnp.where(i1 < n_valid, key_to_score(k1), NEG)
    s2 = jnp.where((i2 < n_valid) & (p2 > PACK_MIN), key_to_score(k2), NEG)
    s3 = jnp.where(p3 > PACK_MIN, key_to_score(k3), NEG)
    pool_v = jnp.concatenate([s1, s2], axis=1)
    pool_i = jnp.concatenate([i1, i2], axis=1)
    kk = min(k, pool_v.shape[1])
    s, pos = jax.lax.top_k(pool_v, kk)
    gi = jnp.take_along_axis(pool_i, pos, axis=1)
    if kk < k:
        s = jnp.pad(s, ((0, 0), (0, k - kk)), constant_values=NEG)
        gi = jnp.pad(gi, ((0, 0), (0, k - kk)), constant_values=-1)
    viol = jnp.any(jnp.max(s3, axis=1) > s[:, kk - 1])
    return jax.lax.cond(viol, fallback, lambda: (s, gi))


def extract_approx_tile(scores, base_index):
    """One-pass approximate extraction: scores f32[TQ, TN] -> all SLOT
    candidate slots, where slot l holds the max over the strided segment
    {l, l+SLOT, l+2*SLOT, ...} of the tile (the in-kernel analogue of the
    TPU ``approx_max_k`` bin-and-max). Cost is TN/SLOT compare/select
    rounds — independent of k — so coarse top-R up to R=SLOT never needs
    the [Q, N] score matrix. Misses a true top-k entry only when two of a
    query's tile-local top entries collide in a stride class."""
    tq, tn = scores.shape
    ns = tn // SLOT
    vals = scores[:, :SLOT]
    win = jnp.zeros((tq, SLOT), jnp.int32)
    for s in range(1, ns):
        seg = scores[:, s * SLOT : (s + 1) * SLOT]
        upd = seg > vals
        vals = jnp.where(upd, seg, vals)
        win = jnp.where(upd, s, win)
    lane = jax.lax.broadcasted_iota(jnp.int32, (tq, SLOT), 1)
    idx = base_index + win * SLOT + lane
    return vals, idx


# Corpus tiles fused per approx slot block: consecutive tiles max-merge
# into one [TQ, SLOT] block in VMEM, extending the stride span SPAN-fold.
# Cuts candidate traffic and final-merge width SPAN-fold; costs a ~k^2 /
# (2 * tiles_per_span * SLOT) chance per query of dropping a true top-k
# entry (two entries colliding in a stride class) — noise next to the
# quantizer's own error at coarse-stage oversampling.
SPAN = 4


def combine_slots(outv_ref, outi_ref, vals, idx, is_first):
    """Max-merge a tile's slot candidates into the revisited output block."""
    @pl.when(is_first)
    def _init():
        outv_ref[:] = vals
        outi_ref[:] = idx

    @pl.when(jnp.logical_not(is_first))
    def _merge():
        old = outv_ref[:]
        upd = vals > old
        outv_ref[:] = jnp.where(upd, vals, old)
        outi_ref[:] = jnp.where(upd, idx, outi_ref[:])


def merge_tile_topk_all(vals, idxs, k: int):
    """Merge variant for the approx extraction: every slot is live, and the
    final selection uses the TPU partial-reduce top-k (approx_max_k) — at
    10M points the candidate width is ~156k and an exact lax.top_k merge
    costs 13.7 ms (measured, k=80) vs <1 ms for the partial reduce; the
    extraction feeding it is already approximate by construction."""
    return _merge(vals, idxs, k, live=SLOT, approx_select=True)


# Candidate widths beyond this merge block-by-block, capping the flat
# top-k workspace. Keep it LARGE: flat lax.top_k is fast (13ms for
# [256, 156k] on v5e) while batched-3D top_k + axis-2 gathers measured
# ~20x slower — blocks are 2D ops only.
_MERGE_BLOCK = 1 << 20


def _merge(vals, idxs, k: int, live: int, approx_select: bool = False):
    q = vals.shape[0]
    nt = vals.shape[1] // SLOT
    if live == SLOT:
        v, i = vals, idxs
    else:
        v = vals.reshape(q, nt, SLOT)[:, :, :live].reshape(q, nt * live)
        i = idxs.reshape(q, nt, SLOT)[:, :, :live].reshape(q, nt * live)
    while v.shape[1] > max(_MERGE_BLOCK, 2 * k):
        parts_v = []
        parts_i = []
        for b0 in range(0, v.shape[1], _MERGE_BLOCK):
            vb = v[:, b0 : b0 + _MERGE_BLOCK]
            ib = i[:, b0 : b0 + _MERGE_BLOCK]
            kb = min(k, vb.shape[1])
            sb, pb = jax.lax.top_k(vb, kb)
            parts_v.append(sb)
            parts_i.append(jnp.take_along_axis(ib, pb, axis=1))
        v = jnp.concatenate(parts_v, axis=1)
        i = jnp.concatenate(parts_i, axis=1)
    kk = min(k, v.shape[1])
    # approx_max_k whenever the pool is meaningfully wider than k: measured
    # on v5e the TopK custom call costs ~0.6 ms at [256, 1664] in a chain
    # while the partial reduce is ~free (round-3 regression check), and at
    # 10M widths the gap is 13.7 ms vs <1 ms. recall_target=0.99 keeps the
    # merge's own loss small next to the strided extraction's (the r2
    # advisor note about stacking approximations).
    if approx_select and v.shape[1] >= 4 * kk:
        s, pos = jax.lax.approx_max_k(v, kk, recall_target=0.99)
        pos = pos.astype(jnp.int32)
    else:
        s, pos = jax.lax.top_k(v, kk)
    gi = jnp.take_along_axis(i, pos, axis=1)
    if kk < k:
        s = jnp.pad(s, ((0, 0), (0, k - kk)), constant_values=NEG)
        gi = jnp.pad(gi, ((0, 0), (0, k - kk)), constant_values=-1)
    return s, gi

"""In-kernel per-tile top-k extraction (shared by the fused search kernels).

The memory wall of "matmul then lax.top_k" is the [Q, N] f32 score matrix:
at N=10M that is 10GB of HBM writes + reads per query batch. The fused
kernels never materialize it — each (query-tile, corpus-tile) grid step
reduces its [TQ, TN] score tile to per-stride-class candidates, and only
[Q, blocks, r*128] candidate slots reach HBM. A final cheap ``lax.top_k``
over the survivors merges tiles.

Exact mode (round 3): per-class top-r-with-ids extraction (r adapts to k
via ``class_r``) on max/min chains with eq-reused selects — specialized
3-select formulation at r=2, insertion ladder for r >= 3 — plus a
value-only (r+1)-th place whose merge-time check proves exactness; the
rare violation falls back to a corpus-blocked scan via lax.cond.
Integer-scored quantizers (BQ, PQ int8-LUT) instead pack (score, member)
into one int32 so the per-class top-r WITH ids rides pure max/min chains
(~2 int ops/slot/element, tie-free).

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


# ------------------------------------------ class-top-r-with-ids + spill
#
# Round-3 exact selection for f32-scored quantizers (SQ; PQ f32-LUT).
# Per stride class (lane l of a span block) the kernel keeps the top-r
# values WITH ids plus a value-only (r+1)-th place — an insertion ladder
# of max/min chains with eq-reused selects (~5r ops/element, cost
# independent of k; r adapts to k via class_r so a class hiding more
# than r of the top-k stays ~1e-4/batch improbable). (A cheaper design
# that dropped runner-up ids and re-scored flagged classes outside the
# kernel was built and measured first: the DMA row gather it needs is
# ~0.3us/row latency-bound, 6.6 ms at 100k/k=10 — structurally too slow
# at every scale. And a fixed r=2 made k=256 at 10M fall back almost
# every batch: 1985 ms measured.) The merge pools every id-carrying slot
# and proves exactness with the spill bound; the rare violation reruns
# through the corpus-blocked scan via lax.cond. Ids of tied values may
# differ from lax.top_k order — the reference heap's own freedom
# (ann_benchmark_data.rs:151-166).


def class_r(k: int, n: int = 0) -> int:
    """Per-class retained depth r for the exact extractions: a class must
    hide MORE than r of the top-k to force the blocked fallback.

    At corpora >= 2M rows the depth is one deeper than the k-tier alone
    requires. Reason (measured, 5M x 1536 clustered): the spill fallback
    rescans the WHOLE corpus, and a fixed query batch that genuinely
    hides r+1 of its top-k in one class pays that rescan on EVERY
    repetition — the per-batch probability (~5e-2 by span choice) prices
    a random workload, not a deterministic one (86.9 ms vs 15.99 approx
    was one such poisoned batch). One extra slot costs ~1-2 ms at 10M
    and drops the probability ~1000x (P ~ Q*C(k, r+1)/C^r), making a
    poisoned batch effectively impossible; at small corpora the rescan
    is ~2 ms and the shallower, faster extraction wins."""
    if k <= 16:
        r = 2
    elif k <= 128:
        r = 3
    elif k <= 512:
        r = 4
    else:
        r = 5
    return r + 1 if n >= 2_000_000 else r


def ladder_insert(ms, is_, cur_v, cur_i):
    """Streaming insertion ladder: push (cur_v, cur_i) [TQ, SLOT] through
    the per-class sorted slots (ms[j], is_[j]); returns the demoted
    element's value (the spill contribution). max/min chains with
    eq-reused selects — ~5 ops per slot per element."""
    for j in range(len(ms)):
        vj = jnp.maximum(ms[j], cur_v)
        took = cur_v == vj  # on ties the incoming/demoted element wins
        nxt = jnp.minimum(ms[j], cur_v)
        nxt_i = jnp.where(took, is_[j], cur_i)
        is_[j] = jnp.where(took, cur_i, is_[j])
        ms[j] = vj
        cur_v, cur_i = nxt, nxt_i
    return cur_v


def extract_class_topr_ids(scores, base_index, r: int):
    """scores f32[TQ, TN] -> (ms list of r values, is_ list of r ids,
    spill), each [TQ, SLOT]: the true per-stride-class top-r WITH ids plus
    the running max of everything dropped (= the class (r+1)-th best).

    r == 2 (k <= 16, the headline-bench regime) takes a specialized
    maxmin-with-eq-reuse formulation — 3 selects/element vs the ladder's
    4; measured 0.63 vs 0.88 ms/tile-pass at 100k (selects are the 3-4x
    op on the VPU, exp_stream2.py). The general ladder serves r >= 3."""
    tq, tn = scores.shape
    ns = tn // SLOT
    lane = jax.lax.broadcasted_iota(jnp.int32, (tq, SLOT), 1)
    if r == 2:
        m1 = jnp.full((tq, SLOT), NEG, jnp.float32)
        m2 = jnp.full((tq, SLOT), NEG, jnp.float32)
        m3 = jnp.full((tq, SLOT), NEG, jnp.float32)
        i1 = jnp.full((tq, SLOT), -1, jnp.int32)
        i2 = jnp.full((tq, SLOT), -1, jnp.int32)
        for s in range(ns):
            seg = scores[:, s * SLOT : (s + 1) * SLOT]
            sid = base_index + s * SLOT + lane
            m1n = jnp.maximum(m1, seg)
            took = seg == m1n          # ties: the newer element takes slot 1
            t = jnp.minimum(m1, seg)   # the loser falls to the slot-2 contest
            ti = jnp.where(took, i1, sid)
            m2n = jnp.maximum(m2, t)
            m3 = jnp.maximum(m3, jnp.minimum(m2, t))
            i2 = jnp.where(t == m2n, ti, i2)
            i1 = jnp.where(took, sid, i1)
            m1, m2 = m1n, m2n
        return [m1, m2], [i1, i2], m3
    if r == 3:
        # Specialized r=3 (the hardened >=2M depth for k<=16): same
        # eq-reuse chains extended one slot — 5 selects/element vs the
        # ladder's 6.
        m1 = jnp.full((tq, SLOT), NEG, jnp.float32)
        m2 = jnp.full((tq, SLOT), NEG, jnp.float32)
        m3 = jnp.full((tq, SLOT), NEG, jnp.float32)
        m4 = jnp.full((tq, SLOT), NEG, jnp.float32)
        i1 = jnp.full((tq, SLOT), -1, jnp.int32)
        i2 = jnp.full((tq, SLOT), -1, jnp.int32)
        i3 = jnp.full((tq, SLOT), -1, jnp.int32)
        for s in range(ns):
            seg = scores[:, s * SLOT : (s + 1) * SLOT]
            sid = base_index + s * SLOT + lane
            m1n = jnp.maximum(m1, seg)
            took1 = seg == m1n
            t1 = jnp.minimum(m1, seg)
            ti1 = jnp.where(took1, i1, sid)
            i1 = jnp.where(took1, sid, i1)
            m2n = jnp.maximum(m2, t1)
            took2 = t1 == m2n
            t2 = jnp.minimum(m2, t1)
            ti2 = jnp.where(took2, i2, ti1)
            i2 = jnp.where(took2, ti1, i2)
            m3n = jnp.maximum(m3, t2)
            i3 = jnp.where(t2 == m3n, ti2, i3)
            m4 = jnp.maximum(m4, jnp.minimum(m3, t2))
            m1, m2, m3 = m1n, m2n, m3n
        return [m1, m2, m3], [i1, i2, i3], m4
    ms = [jnp.full((tq, SLOT), NEG, jnp.float32) for _ in range(r)]
    is_ = [jnp.full((tq, SLOT), -1, jnp.int32) for _ in range(r)]
    spill = jnp.full((tq, SLOT), NEG, jnp.float32)
    for s in range(ns):
        seg = scores[:, s * SLOT : (s + 1) * SLOT]
        sid = base_index + s * SLOT + lane
        spill = jnp.maximum(spill, ladder_insert(ms, is_, seg, sid))
    return ms, is_, spill


def combine_class_topr_ids(refs, ms, is_, spill, r: int, is_first):
    """Merge a tile's ladder state into the revisited block outputs
    (refs = r value refs + r id refs + spill ref, interleaved
    [v0, i0, v1, i1, ..., spill])."""
    vr = [refs[2 * j] for j in range(r)]
    ir = [refs[2 * j + 1] for j in range(r)]
    sp = refs[2 * r]

    @pl.when(is_first)
    def _init():
        for j in range(r):
            vr[j][:] = ms[j]
            ir[j][:] = is_[j]
        sp[:] = spill

    @pl.when(jnp.logical_not(is_first))
    def _merge():
        if r == 2:
            # Specialized two-list top-2 union merge (matches the r==2
            # extraction's eq-reuse formulation).
            m1, m2 = ms
            i1, i2 = is_
            a1, ai1, a2, ai2 = vr[0][:], ir[0][:], vr[1][:], ir[1][:]
            a3 = sp[:]
            h1 = jnp.maximum(a1, m1)
            wins = m1 == h1
            l1 = jnp.minimum(a1, m1)
            li1 = jnp.where(wins, ai1, i1)
            h2 = jnp.maximum(a2, m2)
            hi2 = jnp.where(m2 == h2, i2, ai2)
            m2n = jnp.maximum(l1, h2)
            # 3rd of the union: the loser of (l1, h2), the loser of the
            # 2nds, or either 3rd place.
            sp[:] = jnp.maximum(
                jnp.minimum(l1, h2),
                jnp.maximum(jnp.minimum(a2, m2), jnp.maximum(a3, spill)),
            )
            vr[0][:] = h1
            ir[0][:] = jnp.where(wins, i1, ai1)
            vr[1][:] = m2n
            ir[1][:] = jnp.where(h2 == m2n, hi2, li1)
            return
        run_v = [vr[j][:] for j in range(r)]
        run_i = [ir[j][:] for j in range(r)]
        dropped = spill
        for j in range(r):
            dropped = jnp.maximum(
                dropped, ladder_insert(run_v, run_i, ms[j], is_[j])
            )
        for j in range(r):
            vr[j][:] = run_v[j]
            ir[j][:] = run_i[j]
        sp[:] = jnp.maximum(sp[:], dropped)


def class_span(nt: int, k: int, r: int, span_cap: int = None) -> int:
    """Span (corpus tiles per candidate block) for the exact extractions.

    Wider span -> fewer classes C = ceil(nt/span)*SLOT -> narrower merge
    pool (flat lax.top_k cost scales with pool width: ~13 ms at 156k-wide
    on v5e — the dominant exact-mode overhead at 10M before this
    adapted), but higher fallback probability P ~ Q*C(k, r+1)/C^r per
    batch. Picks the widest span keeping P <= ~5e-2 at Q=256 (the
    empirically-fastest working point: at 100k/k=10 this reproduces the
    span=32 config that measured 0.76 ms/batch, and the expected
    fallback cost P * rescan stays ~1% of the batch); ``span_cap``
    bounds the span so the packed extraction's member field (span*ns
    members) fits PACK_BITS."""
    import math

    cmin = (256.0 * math.comb(k, r + 1) / 5e-2) ** (1.0 / r)
    span = max(1, int(nt * SLOT // max(cmin, SLOT)))
    if span_cap is not None:
        span = min(span, max(1, span_cap))
    return max(1, min(span, 512, nt))


def merge_classes_verified(vals, idxs, spill, k: int, fallback):
    """Exact merge of the class-top-r candidates: pool all id-carrying
    slots (vals/idxs: lists of r [Q, W] arrays), select exactly, and
    prove no class hid an (r+1)-th entry strictly above the k-th score
    (a tie at the k-th is a legal id swap). Violation -> ``fallback()``
    via lax.cond."""
    pool_v = jnp.concatenate(vals, axis=1)
    pool_i = jnp.concatenate(idxs, axis=1)
    kk = min(k, pool_v.shape[1])
    s, pos = jax.lax.top_k(pool_v, kk)
    gi = jnp.take_along_axis(pool_i, pos, axis=1)
    if kk < k:
        s = jnp.pad(s, ((0, 0), (0, k - kk)), constant_values=NEG)
        gi = jnp.pad(gi, ((0, 0), (0, k - kk)), constant_values=-1)
    viol = jnp.any(jnp.max(spill, axis=1) > s[:, kk - 1])
    return jax.lax.cond(viol, fallback, lambda: (s, gi))


# ----------------------------------------------------- packed extraction
#
# Integer-scored quantizers (BQ Hamming metrics; PQ with the int8 LUT)
# fit (score, member) into ONE int32: score * 2^PACK_BITS + member, with
# member the element's index within its stride class. Ids then ride the
# max/min value chains for FREE — per-class top-r costs ~2r+3 int ops per
# element, exact ids included, and heavy score ties (BQ's everyday case)
# cost nothing because packed keys are distinct. The merge pools every
# slot (ids recovered from the pack); the (r+1)-th value is the spill
# bound proving exactness (r adapts to k via class_r, keeping the
# fallback probability ~Q * C(k, r+1)/C^r per batch ~1e-4).

PACK_BITS = 11  # member bits: up to 2048 class members per block
PACK_MEMBERS = 1 << PACK_BITS
PACK_MIN = -(1 << 30)


def packed_ladder(ps, cur):
    """Push one packed [TQ, SLOT] batch through the per-class sorted
    slots; returns the demoted key (spill contribution). ~2 int ops per
    slot per element."""
    for j in range(len(ps)):
        t = jnp.minimum(ps[j], cur)
        ps[j] = jnp.maximum(ps[j], cur)
        cur = t
    return cur


def extract_class_topr_packed(keys, member_base: int, r: int):
    """keys i32[TQ, TN] (score already shifted left PACK_BITS; invalid
    lanes PACK_MIN) -> (ps list of r [TQ, SLOT] packed slots, spill).

    ``member_base``: member index of this tile's first segment within its
    span block (the kernel passes (j % span) * ns)."""
    tq, tn = keys.shape
    ns = tn // SLOT
    ps = [jnp.full((tq, SLOT), PACK_MIN, jnp.int32) for _ in range(r)]
    spill = jnp.full((tq, SLOT), PACK_MIN, jnp.int32)
    for s in range(ns):
        pk = keys[:, s * SLOT : (s + 1) * SLOT] + (member_base + s)
        spill = jnp.maximum(spill, packed_ladder(ps, pk))
    return ps, spill


def combine_class_topr_packed(refs, ps, spill, r: int, is_first):
    """Merge a tile's packed slots into the revisited block outputs
    (refs = r slot refs + spill ref)."""
    pr, sp = list(refs[:r]), refs[r]

    @pl.when(is_first)
    def _init():
        for j in range(r):
            pr[j][:] = ps[j]
        sp[:] = spill

    @pl.when(jnp.logical_not(is_first))
    def _merge():
        run = [pr[j][:] for j in range(r)]
        dropped = spill
        for j in range(r):
            dropped = jnp.maximum(dropped, packed_ladder(run, ps[j]))
        for j in range(r):
            pr[j][:] = run[j]
        sp[:] = jnp.maximum(sp[:], dropped)


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


def merge_packed_verified(ps, spill, k: int, *, span, tile_n, n_valid,
                          key_to_score, fallback):
    """Exact merge of the packed top-r extraction: pool every slot with
    ids decoded from the pack; spill (the (r+1)-th packed key) bounds
    everything dropped. ``key_to_score(key i32) -> f32`` applies the
    quantizer's affine Hamming/LUT map per query. viol = any spill SCORE
    (member bits stripped -> no false positives from id tiebreaks)
    strictly above the k-th pooled score -> corpus-blocked ``fallback()``
    via lax.cond."""
    vs, gi_s = [], []
    for p in ps:
        kk_, gid = unpack_class(p, span, tile_n)
        vs.append(jnp.where(
            (gid < n_valid) & (p > PACK_MIN), key_to_score(kk_), NEG
        ))
        gi_s.append(gid)
    s3 = jnp.where(
        spill > PACK_MIN, key_to_score(spill >> PACK_BITS), NEG
    )
    pool_v = jnp.concatenate(vs, axis=1)
    pool_i = jnp.concatenate(gi_s, axis=1)
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


def merge_tile_topk_all(vals, idxs, k: int, recall_target: float = 0.95):
    """Merge variant for the approx extraction: every slot is live, and the
    final selection uses the TPU partial-reduce top-k (approx_max_k) — at
    10M points the candidate width is ~156k and an exact lax.top_k merge
    costs 13.7 ms (measured, k=80) vs <1 ms for the partial reduce; the
    extraction feeding it is already approximate by construction.

    ``recall_target`` is approx_max_k's per-call recall/speed dial
    (measured at [256, 6272], k=10: whole-search 0.345 ms at 0.95 vs
    0.474 at 0.99 — a 0.99 target forces a reduction as large as the
    exact sort); it prices ONLY the merge's own loss, on top of the
    extraction's strided-collision loss. Callers reach it through the
    model-layer ``top_k_device(..., recall_target=)`` knob."""
    return _merge(
        vals, idxs, k, live=SLOT, approx_select=True,
        recall_target=recall_target,
    )


# Candidate widths beyond this merge block-by-block, capping the flat
# top-k workspace. Keep it LARGE: flat lax.top_k is fast (13ms for
# [256, 156k] on v5e) while batched-3D top_k + axis-2 gathers measured
# ~20x slower — blocks are 2D ops only.
_MERGE_BLOCK = 1 << 20


def _merge(vals, idxs, k: int, live: int, approx_select: bool = False,
           recall_target: float = 0.95):
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
    # approx_max_k whenever the pool is meaningfully wider than k.
    # recall_target matters for SPEED, not just quality: at [256, 6272]
    # (100k corpus, k=10) whole-search ms/batch measured 0.345 at 0.95 /
    # 0.474 at 0.99 / 0.470 with exact lax.top_k — a 0.99 target forces a
    # reduction as large as the exact sort. At 10M widths (~156k) the gap
    # is 13.7 ms exact vs <1 ms. The stacked-approximation loss (r2
    # advisor note) is bounded by the extraction's own strided-collision
    # loss and covered by the recall tests (>=0.8 overlap at 100k).
    if approx_select and v.shape[1] >= 4 * kk:
        s, pos = jax.lax.approx_max_k(v, kk, recall_target=recall_target)
        pos = pos.astype(jnp.int32)
    else:
        s, pos = jax.lax.top_k(v, kk)
    gi = jnp.take_along_axis(i, pos, axis=1)
    if kk < k:
        s = jnp.pad(s, ((0, 0), (0, k - kk)), constant_values=NEG)
        gi = jnp.pad(gi, ((0, 0), (0, k - kk)), constant_values=-1)
    return s, gi

"""In-kernel per-tile top-k extraction (shared by the fused search kernels).

The memory wall of "matmul then lax.top_k" is the [Q, N] f32 score matrix:
at N=10M that is 10GB of HBM writes + reads per query batch. The fused
kernels never materialize it — each (query-tile, corpus-tile) grid step
reduces its [TQ, TN] score tile to per-stride-class candidates, and only
[Q, blocks, r*128] candidate slots reach HBM. A final cheap ``lax.top_k``
over the survivors merges tiles.

Exact mode (round 3): a STREAMING top-r-per-class extraction whose cost is
independent of k (~5r+2 VPU ops/element vs the old ~5k ops/element k-round
loop), made exact by a spill bound: each class also tracks the max of
everything it dropped, and the merge proves `max(spill) <= k-th score` —
on the (construction-probability ~1e-4/batch) failure a corpus-blocked
exact scan reruns inside the same program via lax.cond. This removed the
k<=64 exact cliff and the k-round extraction cost in one move.

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

# Exact fused search cap. The streaming top-r extraction's cost does not
# scale with k, so the cap is set by the verified-merge width and the
# verification-failure rate, not the extraction (the round-2 k-round
# extraction capped this at 64; its per-k measurements live in
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


def _insert_stream(vs, idxs, spill, seg, sid):
    """Insert one [TQ, SLOT] batch of per-class values into the running
    per-class descending top-R lists (vs[j], idxs[j]) and fold whatever
    falls off the end into ``spill`` (the running upper bound on every
    value NOT retained). Pure elementwise compare/select — ~(5R+2)
    VPU ops per element."""
    r = len(vs)
    gts = [seg > v for v in vs]
    # If seg beats the last slot, the old last value drops; otherwise seg
    # itself drops. Either way the dropped value bounds what's lost.
    dropped = jnp.where(gts[r - 1], vs[r - 1], seg)
    spill = jnp.maximum(spill, dropped)
    new_vs, new_is = [], []
    for j in range(r):
        if j == 0:
            nv = jnp.where(gts[0], seg, vs[0])
            ni = jnp.where(gts[0], sid, idxs[0])
        else:
            nv = jnp.where(gts[j - 1], vs[j - 1], jnp.where(gts[j], seg, vs[j]))
            ni = jnp.where(
                gts[j - 1], idxs[j - 1], jnp.where(gts[j], sid, idxs[j])
            )
        new_vs.append(nv)
        new_is.append(ni)
    return new_vs, new_is, spill


def extract_stream_topr_tile(scores, base_index, r: int):
    """Streaming EXACT-per-class extraction: scores f32[TQ, TN] ->
    (vs list of r [TQ, SLOT], idxs list of r [TQ, SLOT], spill [TQ, SLOT]).

    Class l = the strided lane set {l, l+SLOT, l+2*SLOT, ...} of the tile
    (the approx extraction's stride classes). Each class keeps its true
    top-r values/ids via an online sorted-insert — cost ~(5r+2) ops/element
    INDEPENDENT of k, vs the old k-round extraction's ~5k ops/element.
    ``spill`` upper-bounds every value not retained; the merge uses it to
    PROVE the final top-k exact (see merge_exact_verified) and falls back
    on the (probabilistically negligible) failure."""
    tq, tn = scores.shape
    ns = tn // SLOT
    lane = jax.lax.broadcasted_iota(jnp.int32, (tq, SLOT), 1)
    vs = [jnp.full((tq, SLOT), NEG, jnp.float32) for _ in range(r)]
    idxs = [jnp.full((tq, SLOT), -1, jnp.int32) for _ in range(r)]
    spill = jnp.full((tq, SLOT), NEG, jnp.float32)
    for s in range(ns):
        seg = scores[:, s * SLOT : (s + 1) * SLOT]
        sid = base_index + s * SLOT + lane
        vs, idxs, spill = _insert_stream(vs, idxs, spill, seg, sid)
    return vs, idxs, spill


def combine_stream_topr(
    outv_ref, outi_ref, vs, idxs, spill, spill_ref, r: int, is_first,
    is_tile_first,
):
    """Merge a tile's per-class top-r into the revisited [TQ, r*SLOT]
    output block (slot j's values live in lanes [j*SLOT, (j+1)*SLOT)), and
    fold drops into the running spill scratch.

    ``is_first``: first corpus tile of this block (init the block).
    ``is_tile_first``: first corpus tile of the whole query-tile sweep
    (init the spill scratch)."""
    @pl.when(is_tile_first)
    def _init_spill():
        spill_ref[:] = jnp.full_like(spill_ref, NEG)

    spill_ref[:] = jnp.maximum(spill_ref[:], spill)

    @pl.when(is_first)
    def _init():
        for j in range(r):
            outv_ref[:, j * SLOT : (j + 1) * SLOT] = vs[j]
            outi_ref[:, j * SLOT : (j + 1) * SLOT] = idxs[j]

    @pl.when(jnp.logical_not(is_first))
    def _merge():
        run_v = [outv_ref[:, j * SLOT : (j + 1) * SLOT] for j in range(r)]
        run_i = [outi_ref[:, j * SLOT : (j + 1) * SLOT] for j in range(r)]
        sp = jnp.full_like(spill_ref[:], NEG)
        for j in range(r):
            run_v, run_i, sp = _insert_stream(run_v, run_i, sp, vs[j], idxs[j])
        spill_ref[:] = jnp.maximum(spill_ref[:], sp)
        for j in range(r):
            outv_ref[:, j * SLOT : (j + 1) * SLOT] = run_v[j]
            outi_ref[:, j * SLOT : (j + 1) * SLOT] = run_i[j]


# Exact-mode extraction width R by requested k: R=2 keeps the per-element
# cost minimal for serving k; R=4 bounds the verification-failure rate for
# k up to FUSED_K_MAX (a class must hide >R entries above the k-th score
# to force the fallback).
def _stream_r(k: int) -> int:
    return 2 if k <= 64 else 4


def exact_stream_params(nt: int, k: int):
    """(r, span) for the exact streaming extraction over ``nt`` corpus
    tiles. ``span`` corpus tiles max-merge into one candidate block; the
    number of stride classes C = ceil(nt/span) * SLOT controls the
    verification-failure probability: a fallback triggers only when one
    class holds > r entries strictly above the k-th score, so with
    candidates ~uniform over classes P ~ C(k, r+1)/C^r per query. c_min
    targets <=1% per 256-query batch; span also caps the final merge width
    (blocks * r * SLOT candidates per query)."""
    r = _stream_r(k)
    if r == 2:
        c_min = int(64.5 * k**1.5) + 1
    else:
        c_min = int(3.8 * k**1.25) + 1
    span = max(1, min(32, (nt * SLOT) // max(c_min, SLOT)))
    return r, span


def merge_exact_verified(vals, idxs, spill, k: int, fallback):
    """Exact merge of the streaming extraction's candidates with proof.

    vals/idxs [Q, B*r*SLOT], spill [Q, SLOT] (running max of every value
    any class dropped). tau = k-th merged score; if max(spill) <= tau then
    every non-candidate value is <= tau and the merged top-k is VALUE-exact
    (among tied scores at tau the returned ids may differ from lax.top_k's
    tie order — the same freedom the reference's heap has,
    ann_benchmark_data.rs:151-166). Otherwise runs ``fallback()`` (a
    corpus-blocked exact scan) via lax.cond — compiled once, executed only
    on the rare violation."""
    s, gi = _merge(vals, idxs, k, live=SLOT)
    kk = min(k, vals.shape[1])
    tau = s[:, kk - 1 : kk]
    viol = jnp.any(jnp.max(spill, axis=1, keepdims=True) > tau)
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

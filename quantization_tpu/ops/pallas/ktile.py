"""In-kernel per-tile top-k extraction (shared by the fused search kernels).

The memory wall of "matmul then lax.top_k" is the [Q, N] f32 score matrix:
at N=10M that is 10GB of HBM writes + reads per query batch. The fused
kernels never materialize it — each (query-tile, corpus-tile) grid step
reduces its [TQ, TN] score tile to the tile's top-k (k rounds of
max/argmax/mask on the VPU, ~k*TQ*TN ops, negligible next to the tile's
matmul), and only [Q, n_tiles, 128] candidate slots reach HBM. A final
cheap ``lax.top_k`` over the ~n_tiles*k survivors merges tiles.

This replaces the reference caller's per-point bounded heap
(ann_benchmark_data.rs:151-166) with a device-resident two-stage selection.
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

# Extraction costs k rounds of max/argmax/mask per tile; with honest
# chained-dispatch timing the fused path beats score-matrix + lax.top_k at
# every measured k (k=16: 1.16 vs 1.84 ms, k=32: 1.99 vs 3.15, k=64:
# 3.80 vs 5.70 at 256x100k x 1024 — round-1's k=16 break-even was a
# dispatch-floor artifact). Capped at the highest measured k; beyond it
# the model falls back to score-then-select.
FUSED_K_MAX = 64

# Approx mode has no per-tile k rounds — each tile span always emits SLOT
# strided maxima and the merge selects top-k over ALL of them (nt/SPAN *
# SLOT candidates, ~156k at 10M points), so k is bounded by the merge
# width, not the tile. This cap keeps the coarse stage of two-stage
# retrieval fused at large oversampling (a score-matrix fallback at 10M
# would materialize 10GB). Recall decays gracefully as k approaches the
# candidate pool size.
APPROX_K_MAX = 4096


def extract_topk_tile(scores, k: int, base_index):
    """scores f32[TQ, TN] -> (vals f32[TQ, SLOT], idx i32[TQ, SLOT]).

    k rounds of max/argmax/mask; idx entries are base_index + lane position
    (global corpus ids). Slots beyond k are NEG / -1 filler. Results are
    accumulated into fixed [TQ, SLOT] registers with per-round lane
    selects rather than concatenated from [TQ, 1] pieces — a k+1-way
    lane-granular concatenate costs Mosaic a relayout per piece.
    """
    tq, tn = scores.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (tq, tn), 1)
    slot_lane = jax.lax.broadcasted_iota(jnp.int32, (tq, SLOT), 1)
    vals_out = jnp.full((tq, SLOT), NEG, jnp.float32)
    idxs_out = jnp.full((tq, SLOT), -1, jnp.int32)
    x = scores
    for r in range(k):
        m = jnp.max(x, axis=1, keepdims=True)  # [TQ, 1]
        am = jnp.argmax(x, axis=1)[:, None].astype(jnp.int32)  # [TQ, 1]
        vals_out = jnp.where(slot_lane == r, m, vals_out)
        idxs_out = jnp.where(slot_lane == r, am + base_index, idxs_out)
        x = jnp.where(lane == am, NEG, x)
    return vals_out, idxs_out


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


def merge_tile_topk(vals, idxs, k: int):
    """Merge per-tile candidates: vals f32[Q, NT*SLOT], idxs i32[Q, NT*SLOT]
    (as produced by a fused kernel's two outputs) -> ([Q, k], [Q, k]).

    ``live``: slots per tile that hold real candidates — k for the exact
    extraction, SLOT for the approximate one."""
    return _merge(vals, idxs, k, live=min(k, SLOT))


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
    if approx_select and v.shape[1] >= 4 * kk:
        s, pos = jax.lax.approx_max_k(v, kk)
        pos = pos.astype(jnp.int32)
    else:
        s, pos = jax.lax.top_k(v, kk)
    gi = jnp.take_along_axis(i, pos, axis=1)
    if kk < k:
        s = jnp.pad(s, ((0, 0), (0, k - kk)), constant_values=NEG)
        gi = jnp.pad(gi, ((0, 0), (0, k - kk)), constant_values=-1)
    return s, gi

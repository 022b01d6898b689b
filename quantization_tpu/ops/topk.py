"""Top-k selection tuned for TPU.

The reference's serving loop keeps a bounded binary heap per query on the host
(ann_benchmark_data.rs:151-166). On TPU the score matrix never leaves the
device; selection is the last (and, naively, the slowest) stage:
``lax.top_k`` over [Q, N] for N in the millions dominates the whole query.

Two device-side strategies:
  * ``exact``: a flat ``lax.top_k``. Measured on v5e, XLA's TopK custom call
    is already a blocked partial sort — a hand-blocked two-stage reduction
    (per-block top-k, then top-k over survivors) ran 20x SLOWER (12ms vs
    0.6ms on [256, 100k]), so the hand-blocked variant was removed.
  * ``approx``: ``lax.approx_max_k`` — the TPU-native partial-reduce top-k
    (recall_target controls quality), the right default for ANN serving where
    the quantizer itself is already approximate; ~2x faster again.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

# Python float, not jnp.float32: a module-level device constant would
# initialize the JAX backend at import time (holding the TPU client before
# the caller set platforms/flags). Weak typing keeps f32 semantics.
NEG_INF = float("-inf")


@partial(jax.jit, static_argnames=("k",))
def topk_exact(scores: jax.Array, k: int) -> Tuple[jax.Array, jax.Array]:
    """Exact (scores[Q, k], indices[Q, k])."""
    n = scores.shape[-1]
    s, i = jax.lax.top_k(scores, min(k, n))
    return _pad_k(s, i, k, n)


@partial(jax.jit, static_argnames=("k", "recall_target"))
def topk_approx(
    scores: jax.Array, k: int, recall_target: float = 0.95
) -> Tuple[jax.Array, jax.Array]:
    """Approximate top-k via the TPU PartialReduce op."""
    s, i = jax.lax.approx_max_k(scores, k, recall_target=recall_target)
    return s, i.astype(jnp.int32)


def _pad_k(s, i, k, n):
    # Sentinel contract (shared with ktile._merge): when fewer than k
    # candidates exist, missing slots hold score -inf and index -1 — never
    # a valid corpus id.
    got = s.shape[1]
    if got < k:
        s = jnp.pad(s, ((0, 0), (0, k - got)), constant_values=NEG_INF)
        i = jnp.pad(i, ((0, 0), (0, k - got)), constant_values=-1)
    return s, i.astype(jnp.int32)


def top_k(
    scores: jax.Array, k: int, method: str = "exact", **kw
) -> Tuple[jax.Array, jax.Array]:
    if method == "exact":
        return topk_exact(scores, k, **kw)
    if method == "approx":
        return topk_approx(scores, k, **kw)
    raise ValueError(f"unknown top-k method {method!r}")


# Corpus rows per block in blocked_topk: [256 queries, 1M rows] f32 scores
# is 1 GB of transient HBM — bounded regardless of corpus size.
BLOCK_ROWS = 1 << 20


def blocked_topk(
    score_block,
    count: int,
    k: int,
    method: str = "exact",
    block_rows: int = BLOCK_ROWS,
) -> Tuple[jax.Array, jax.Array]:
    """Exact-at-any-k selection with O(Q * block_rows) peak memory.

    ``score_block(b0, b1) -> f32[Q, b1-b0]`` scores one corpus slice.
    Blocks are scored + selected independently and merged with one final
    top-k — the device-resident analogue of the reference's per-point
    bounded heap (ann_benchmark_data.rs:151-166), which is exact at any k
    with bounded memory. All blocks are enqueued before any host sync (at
    most two compiled shapes: body + tail)."""
    parts_s, parts_i = [], []
    for b0 in range(0, count, block_rows):
        b1 = min(b0 + block_rows, count)
        s, i = top_k(score_block(b0, b1), min(k, b1 - b0), method=method)
        parts_s.append(s)
        parts_i.append(i + b0)
    s = jnp.concatenate(parts_s, axis=1)
    i = jnp.concatenate(parts_i, axis=1)
    kk = min(k, s.shape[1])
    ss, pos = jax.lax.top_k(s, kk)
    ii = jnp.take_along_axis(i, pos, axis=1)
    return _pad_k(ss, ii, k, count)

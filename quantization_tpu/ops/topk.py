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

NEG_INF = jnp.float32(-jnp.inf)


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

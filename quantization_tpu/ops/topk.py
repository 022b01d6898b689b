"""Top-k selection tuned for TPU.

The reference's serving loop keeps a bounded binary heap per query on the host
(ann_benchmark_data.rs:151-166). On TPU the score matrix never leaves the
device; selection is the last (and, naively, the slowest) stage:
``lax.top_k`` over [Q, N] for N in the millions dominates the whole query.

Two device-side strategies:
  * ``exact``: blocked two-stage top-k — per-block top-k over the lane axis,
    then a final top-k over the nb*k survivors. Same result as a flat
    ``lax.top_k``, far less sorting work.
  * ``approx``: ``lax.approx_max_k`` — the TPU-native partial-reduce top-k
    (recall_target controls quality), the right default for ANN serving where
    the quantizer itself is already approximate.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

NEG_INF = jnp.float32(-jnp.inf)


@partial(jax.jit, static_argnames=("k", "block"))
def topk_exact(
    scores: jax.Array, k: int, block: int = 2048
) -> Tuple[jax.Array, jax.Array]:
    """Exact (scores[Q, k], indices[Q, k]) via blocked two-stage selection."""
    q, n = scores.shape
    if n <= max(block, 2 * k):
        s, i = jax.lax.top_k(scores, min(k, n))
        return _pad_k(s, i, k, n)
    nb = -(-n // block)
    pad = nb * block - n
    if pad:
        scores = jnp.pad(scores, ((0, 0), (0, pad)), constant_values=NEG_INF)
    kb = min(k, block)
    s1, i1 = jax.lax.top_k(scores.reshape(q, nb, block), kb)  # [Q, nb, kb]
    base = (jnp.arange(nb) * block)[None, :, None]
    gidx = (i1 + base).reshape(q, nb * kb)
    s2, p = jax.lax.top_k(s1.reshape(q, nb * kb), min(k, nb * kb))
    idx = jnp.take_along_axis(gidx, p, axis=1)
    return _pad_k(s2, idx, k, n)


@partial(jax.jit, static_argnames=("k", "recall_target"))
def topk_approx(
    scores: jax.Array, k: int, recall_target: float = 0.95
) -> Tuple[jax.Array, jax.Array]:
    """Approximate top-k via the TPU PartialReduce op."""
    s, i = jax.lax.approx_max_k(scores, k, recall_target=recall_target)
    return s, i.astype(jnp.int32)


def _pad_k(s, i, k, n):
    got = s.shape[1]
    if got < k:
        s = jnp.pad(s, ((0, 0), (0, k - got)), constant_values=NEG_INF)
        i = jnp.pad(i, ((0, 0), (0, k - got)))
    return s, i.astype(jnp.int32)


def top_k(
    scores: jax.Array, k: int, method: str = "exact", **kw
) -> Tuple[jax.Array, jax.Array]:
    if method == "exact":
        return topk_exact(scores, k, **kw)
    if method == "approx":
        return topk_approx(scores, k, **kw)
    raise ValueError(f"unknown top-k method {method!r}")

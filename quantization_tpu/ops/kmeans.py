"""Batched k-means: Lloyd's iterations over *all* PQ chunks simultaneously.

TPU-native replacement for quantization/src/kmeans.rs. The reference runs one
rayon-parallel k-means per chunk (assignment par_iter at kmeans.rs:138-167,
per-thread partial-sum reduction at kmeans.rs:49-136); here every chunk's
clustering is one slice of a single device computation — assignment is a
matmul + argmin, the update is a one-hot matmul (segment-sum), and the rayon
map-reduce disappears entirely.

Reference semantics preserved:
  * init = first k sample points (kmeans.rs:25)
  * empty clusters reseeded from a random data point (kmeans.rs:111-118)
  * convergence when sum |c_new - c_old| < accuracy, per chunk
    (kmeans.rs:125-135); converged chunks freeze while the rest iterate
  * cooperative cancellation between iterations (kmeans.rs:29-31)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.types import ArgumentsError, check_stop


@jax.jit
def _kmeans_step(centroids: jax.Array, data: jax.Array, keys: jax.Array):
    """One Lloyd iteration for every chunk.

    centroids: f32[m, k, d], data: f32[m, n, d], keys: uint32[m, 2].
    Returns (new_centroids[m, k, d], diff[m]).
    """

    def chunk_step(args):
        c, x, key = args  # [k, d], [n, d], key
        k = c.shape[0]
        n = x.shape[0]
        x2 = jnp.sum(x * x, axis=1, keepdims=True)  # [n, 1]
        c2 = jnp.sum(c * c, axis=1)  # [k]
        d2 = x2 + c2[None, :] - 2.0 * (x @ c.T)  # [n, k]
        idx = jnp.argmin(d2, axis=1)  # first-min, like the strict < scan
        onehot = (idx[:, None] == jnp.arange(k)[None, :]).astype(jnp.float32)
        counts = jnp.sum(onehot, axis=0)  # [k]
        sums = onehot.T @ x  # [k, d]
        mean = sums / jnp.maximum(counts, 1.0)[:, None]
        # Empty-cluster reseed from a random point (kmeans.rs:111-118).
        rand_rows = jax.random.randint(jax.random.wrap_key_data(key), (k,), 0, n)
        reseed = x[rand_rows]
        new_c = jnp.where((counts == 0)[:, None], reseed, mean)
        diff = jnp.sum(jnp.abs(new_c - c))
        return new_c, diff

    return jax.lax.map(chunk_step, (centroids, data, keys))


def kmeans_batched(
    data: jax.Array,
    k: int,
    max_iterations: int = 100,
    accuracy: float = 1e-5,
    seed: int = 0,
    stop_condition=None,
) -> jax.Array:
    """Cluster every chunk of ``data`` [m, n, d] into ``k`` centroids.

    Returns centroids f32[m, k, d]. Host loop drives iterations so the
    caller's cancellation flag is honored between device steps.
    """
    data = jnp.asarray(data, jnp.float32)
    m, n, d = data.shape
    if n < k:
        raise ArgumentsError(f"kmeans needs >= {k} points per chunk, got {n}")
    centroids = data[:, :k, :]
    converged = np.zeros((m,), bool)
    base_key = jax.random.PRNGKey(seed)
    for it in range(max_iterations):
        check_stop(stop_condition)
        it_key = jax.random.fold_in(base_key, it)
        keys = jax.random.key_data(jax.random.split(it_key, m))
        new_centroids, diff = _kmeans_step(centroids, data, keys)
        diff_np = np.asarray(diff)
        frozen = jnp.asarray(converged)
        centroids = jnp.where(frozen[:, None, None], centroids, new_centroids)
        converged |= diff_np < accuracy
        if converged.all():
            break
    return centroids

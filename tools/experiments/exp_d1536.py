"""Isolate the D=1536 exact-mode anomaly: time sq exact/approx at 1M x
{768, 1536} with random codes; then re-time 1536 exact with the
spill-check cond patched out (fallback never taken / absent)."""
import sys, time
import numpy as np
sys.path.insert(0, __file__.rsplit("/", 3)[0])
import jax, jax.numpy as jnp
from quantization_tpu.utils.compile_cache import enable_compilation_cache
enable_compilation_cache()
import quantization_tpu as qt
from quantization_tpu.ops import sq as sq_ops
import quantization_tpu.ops.pallas.sq_kernel as sqk

Q, K, N = 256, 10, 999_424  # 1952 * 512

def build(d):
    lane = sq_ops.lane_dim(d)
    key = jax.random.key(1)
    codes = jax.random.randint(key, (N, lane), 0, 128, dtype=jnp.int8)
    voff = jax.random.uniform(jax.random.key(2), (N,), jnp.float32)
    qc = jax.random.randint(jax.random.key(3), (Q, lane), 0, 128, dtype=jnp.int8)
    qo = jax.random.uniform(jax.random.key(4), (Q,), jnp.float32)
    return codes, voff, qc, qo

def timeit(fn, iters=10):
    r = fn(); np.asarray(jax.tree_util.tree_leaves(r)[0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters): r = fn()
        np.asarray(jax.tree_util.tree_leaves(r)[0])
        best = min(best, (time.perf_counter()-t0)/iters)
    return best*1e3

mult = jnp.float32(0.001)
for d in (768, 1536):
    codes, voff, qc, qo = build(d)
    for mode in ("approx", "exact"):
        t = timeit(lambda: sqk.sq_search_pallas(
            qc, qo, codes, voff, mult, distance_type=qt.DistanceType.DOT,
            n_valid=N, k=K, mode=mode))
        print(f"D={d} {mode:6s}: {t:7.2f} ms", flush=True)

# patch out the verification cond entirely
# (cond-free merge patched directly below)
def merge_nocond(vals, idxs, spill, k, fallback):
    pool_v = jnp.concatenate(vals, axis=1)
    pool_i = jnp.concatenate(idxs, axis=1)
    kk = min(k, pool_v.shape[1])
    s, pos = jax.lax.top_k(pool_v, kk)
    return s, jnp.take_along_axis(pool_i, pos, axis=1)
sqk.merge_classes_verified = merge_nocond
sqk.sq_search_pallas = jax.jit(
    sqk.sq_search_pallas.__wrapped__,
    static_argnames=("distance_type", "n_valid", "k", "mode", "interpret"),
)
codes, voff, qc, qo = build(1536)
t = timeit(lambda: sqk.sq_search_pallas(
    qc, qo, codes, voff, mult, distance_type=qt.DistanceType.DOT,
    n_valid=N, k=K, mode="exact"))
print(f"D=1536 exact NO-COND: {t:7.2f} ms", flush=True)

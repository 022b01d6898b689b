"""ABANDONED: the __wrapped__ bypass forced uncached mega-compiles (>15 min); superseded by exp_sq7.py (one cached variant per process).

Chained-dispatch timing (the only reliable measure on the tunnel; see
exp_sq5: per-call dispatch floor ~0.9ms) of TILE_Q=256 vs 128 for the
production fused kernel."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from quantization_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from quantization_tpu.core.types import DistanceType  # noqa: E402
import quantization_tpu.ops.pallas.sq_kernel as sqk  # noqa: E402

Q, N, D, K = 256, 100_000, 1024, 10
NPAD = N + (-N) % 2048

rng = np.random.default_rng(0)
qcodes = jnp.asarray(rng.integers(0, 128, (Q, D), dtype=np.int8))
codes = jnp.asarray(rng.integers(0, 128, (NPAD, D), dtype=np.int8))
qoff = jnp.asarray(rng.random(Q, dtype=np.float32))
voff = jnp.asarray(rng.random(NPAD, dtype=np.float32))
mult = jnp.float32(0.001)
jax.block_until_ready((qcodes, codes, qoff, voff))
print(f"device: {jax.devices()[0]}", flush=True)

CHAIN = 8


def bench(name, fn, *args, iters=25, repeats=3):
    for _ in range(2):
        r = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(r)[0])
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(r)[0])
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"{name:52s} {best * 1e3 / CHAIN:8.3f} ms/search", flush=True)
    return best


def make_chained(k, mode, tile_q):
    def chained(qc, qo, c, vo):
        old = sqk.TILE_Q
        sqk.TILE_Q = tile_q
        try:
            s = None
            for _ in range(CHAIN):
                # bypass the inner jit cache (it can't see the TILE_Q patch)
                sv, si = sqk.sq_search_pallas.__wrapped__(
                    qc, qo, c, vo, mult,
                    distance_type=DistanceType.DOT, n_valid=N, k=k,
                    mode=mode, interpret=False,
                )
                qo = qo + sv[0, 0] * 1e-12
                s = (sv, si)
            return s
        finally:
            sqk.TILE_Q = old

    return jax.jit(chained)


bench("exact k=10 tq=128 (current)", make_chained(10, "exact", 128),
      qcodes, qoff, codes, voff)
bench("exact k=10 tq=256", make_chained(10, "exact", 256),
      qcodes, qoff, codes, voff)
bench("approx k=10 tq=256", make_chained(10, "approx", 256),
      qcodes, qoff, codes, voff)
bench("exact k=1 tq=256", make_chained(1, "exact", 256),
      qcodes, qoff, codes, voff)

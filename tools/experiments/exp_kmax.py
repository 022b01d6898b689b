"""Where does fused exact extraction stop beating scores+lax.top_k?
(FUSED_K_MAX calibration with honest chained timing; round-1's k=16
break-even was measured per-call, i.e. dispatch-bound.)"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from quantization_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from quantization_tpu.core.types import DistanceType  # noqa: E402
from quantization_tpu.ops.pallas.sq_kernel import (  # noqa: E402
    sq_scores_pallas,
    sq_search_pallas,
)

Q, N, D = 256, 100_000, 1024
NPAD = N + (-N) % 2048
CHAIN = 8

rng = np.random.default_rng(0)
qcodes_all = jnp.asarray(rng.integers(0, 128, (CHAIN * Q, D), dtype=np.int8))
codes = jnp.asarray(rng.integers(0, 128, (NPAD, D), dtype=np.int8))
qoff_all = jnp.asarray(rng.random(CHAIN * Q, dtype=np.float32))
voff = jnp.asarray(rng.random(NPAD, dtype=np.float32))
mult = jnp.float32(0.001)
jax.block_until_ready((qcodes_all, codes))
print(f"device: {jax.devices()[0]}", flush=True)


def bench(name, fn, *args, iters=20, repeats=3):
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
    print(f"{name:48s} {best * 1e3 / CHAIN:8.3f} ms/search", flush=True)


def fused(k):
    @jax.jit
    def fn(qc, qo, c, vo):
        outs = []
        for b in range(CHAIN):
            qcb = jax.lax.dynamic_slice_in_dim(qc, b * Q, Q, 0)
            qob = jax.lax.dynamic_slice_in_dim(qo, b * Q, Q, 0)
            outs.append(sq_search_pallas(
                qcb, qob, c, vo, mult,
                distance_type=DistanceType.DOT, n_valid=N, k=k, mode="exact",
                interpret=False,
            ))
        return outs

    return fn


def matrix(k):
    @jax.jit
    def fn(qc, qo, c, vo):
        outs = []
        for b in range(CHAIN):
            qcb = jax.lax.dynamic_slice_in_dim(qc, b * Q, Q, 0)
            qob = jax.lax.dynamic_slice_in_dim(qo, b * Q, Q, 0)
            s = sq_scores_pallas(
                qcb, qob, c, vo, mult,
                distance_type=DistanceType.DOT, n_valid=N, interpret=False,
            )
            outs.append(jax.lax.top_k(s, k))
        return outs

    return fn


for k in (16, 32, 64):
    bench(f"fused exact k={k}", fused(k), qcodes_all, qoff_all, codes, voff)
    bench(f"scores+top_k k={k}", matrix(k), qcodes_all, qoff_all, codes, voff)

"""Dissect the SQ fused-search kernel cost on the real TPU.

All variants return SMALL outputs (large intermediates are reduced on
device) so the drain never downloads a [Q,N] matrix through the tunnel.
Best-of-3 passes like bench.py. Run with no other TPU process active.
"""

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

Q, N, D, K = 256, 100_000, 1024, 10
NPAD = N + (-N) % 2048

rng = np.random.default_rng(0)
qcodes = jnp.asarray(rng.integers(0, 128, (Q, D), dtype=np.int8))
codes = jnp.asarray(rng.integers(0, 128, (NPAD, D), dtype=np.int8))
qoff = jnp.asarray(rng.random(Q, dtype=np.float32))
voff = jnp.asarray(rng.random(NPAD, dtype=np.float32))
mult = jnp.float32(0.001)
jax.block_until_ready((qcodes, codes, qoff, voff))
print(f"device: {jax.devices()[0]}, shapes Q={Q} N={N} NPAD={NPAD} D={D}", flush=True)


def bench(name, fn, *args, iters=50, repeats=3):
    for _ in range(3):
        r = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(r)[0])
    best = float("inf")
    wall0 = time.perf_counter()
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(r)[0])
        best = min(best, (time.perf_counter() - t0) / iters)
    print(
        f"{name:44s} {best * 1e3:8.3f} ms/call   "
        f"(wall {time.perf_counter() - wall0:.1f}s)",
        flush=True,
    )
    return best


@jax.jit
def raw_dot_sum(qc, c):
    out = jax.lax.dot_general(
        qc, c, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
    )
    return jnp.sum(out, axis=0)[:8]  # tiny readback; matmul still full


@jax.jit
def scores_pallas_sum(qc, qo, c, vo):
    s = sq_scores_pallas(
        qc, qo, c, vo, mult, distance_type=DistanceType.DOT, n_valid=N,
        interpret=False,
    )
    return jnp.sum(s, axis=0)[:8]


@jax.jit
def scores_then_topk(qc, qo, c, vo):
    s = sq_scores_pallas(
        qc, qo, c, vo, mult, distance_type=DistanceType.DOT, n_valid=N,
        interpret=False,
    )
    return jax.lax.top_k(s, K)


def search(k, mode):
    @jax.jit
    def fn(qc, qo, c, vo):
        return sq_search_pallas(
            qc, qo, c, vo, mult,
            distance_type=DistanceType.DOT, n_valid=N, k=k, mode=mode,
            interpret=False,
        )

    return fn


bench("raw XLA int8 dot (device-reduced)", raw_dot_sum, qcodes, codes)
bench("sq_scores_pallas (device-reduced)", scores_pallas_sum, qcodes, qoff, codes, voff)
bench("sq_scores_pallas + lax.top_k", scores_then_topk, qcodes, qoff, codes, voff)
bench("sq_search exact k=10", search(10, "exact"), qcodes, qoff, codes, voff)
bench("sq_search approx k=10", search(10, "approx"), qcodes, qoff, codes, voff)
bench("sq_search exact k=1", search(1, "exact"), qcodes, qoff, codes, voff)
bench("sq_search exact k=16", search(16, "exact"), qcodes, qoff, codes, voff)

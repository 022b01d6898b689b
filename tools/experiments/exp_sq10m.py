"""Isolated 10M x 768 SQ kernel timings (device-generated codes)."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from quantization_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from quantization_tpu.core.types import DistanceType  # noqa: E402
from quantization_tpu.ops.pallas.sq_kernel import sq_search_pallas  # noqa: E402

Q, D = 256, 768
N = 10_000_000
NPAD = N + (-N) % 512  # 10000384, divisible by 2048

rng = np.random.default_rng(0)
qcodes = jnp.asarray(rng.integers(0, 128, (Q, D), dtype=np.int8))
qoff = jnp.asarray(rng.random(Q, dtype=np.float32))
mult = jnp.float32(0.001)

k1, k2 = jax.random.split(jax.random.key(0))


@jax.jit
def gen(ka, kb):
    c = jax.random.randint(ka, (NPAD, D), 0, 128, jnp.int32).astype(jnp.int8)
    return c, jax.random.uniform(kb, (NPAD,), jnp.float32)


codes, voff = gen(k1, k2)
jax.block_until_ready((codes, voff))
print(f"device: {jax.devices()[0]}, corpus {NPAD*D/2**30:.2f} GiB", flush=True)


def bench(name, fn, *args, iters=10, repeats=3):
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
    print(f"{name:40s} {best * 1e3:8.2f} ms/scan", flush=True)


def prod(k, mode):
    @jax.jit
    def fn(qc, qo, c, vo):
        return sq_search_pallas(
            qc, qo, c, vo, mult,
            distance_type=DistanceType.DOT, n_valid=N, k=k, mode=mode,
            interpret=False,
        )

    return fn


bench("approx k=10", prod(10, "approx"), qcodes, qoff, codes, voff)
bench("exact k=1", prod(1, "exact"), qcodes, qoff, codes, voff)
bench("exact k=10", prod(10, "exact"), qcodes, qoff, codes, voff)

"""Where do PQ4's 507 ms go at 10M? (theory: build ~60 + matmul ~20 +
extraction ~30-60 + stream ~6). Measure scores-only vs fused search."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from quantization_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from quantization_tpu.ops.pallas.pq_kernel import (  # noqa: E402
    pq_scores_pallas,
    pq_search_pallas,
)

N = 10_000_000
NPAD = N + (-N) % 1024
Q = 256
M8, M4 = 96, 192

rng = np.random.default_rng(0)
k1, k2 = jax.random.split(jax.random.key(0))


from functools import partial  # noqa: E402


@partial(jax.jit, static_argnums=(1, 2))
def gen_codes(key, m, hi):
    return jax.random.randint(key, (m, NPAD), 0, hi, jnp.int32).astype(jnp.uint8)


codes4 = gen_codes(k1, M4, 16)
codes8 = gen_codes(k2, M8, 256)
lut4 = jnp.asarray(rng.standard_normal((Q, M4, 16)).astype(np.float32))
lut8 = jnp.asarray(rng.standard_normal((Q, M8, 256)).astype(np.float32))
jax.block_until_ready((codes4, codes8, lut4, lut8))
print(f"device: {jax.devices()[0]}", flush=True)


def bench(name, fn, *args, iters=6, repeats=3):
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
    print(f"{name:44s} {best * 1e3:8.2f} ms/scan", flush=True)


def scores(lut, codes):
    @jax.jit
    def fn(l, c):
        s = pq_scores_pallas(l, c, n_valid=N, interpret=False)
        return jnp.max(s, axis=1)

    return fn


def search(lut, codes, mode):
    @jax.jit
    def fn(l, c):
        return pq_search_pallas(
            l, c, n_valid=N, k=10, mode=mode, interpret=False
        )

    return fn


bench("PQ4 scores only (tq=256)", scores(lut4, codes4), lut4, codes4)
bench("PQ4 search exact k=10 (tq=128)", search(lut4, codes4, "exact"), lut4, codes4)
bench("PQ4 search approx k=10 (tq=256)", search(lut4, codes4, "approx"), lut4, codes4)
bench("PQ8 scores only (tq=256)", scores(lut8, codes8), lut8, codes8)

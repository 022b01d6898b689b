"""Why did the chained f32 baseline blow up to 35.9 ms/search?"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from quantization_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

N, D, Q, K = 100_000, 1024, 256, 10
rng = np.random.default_rng(42)
x = jnp.asarray(rng.random((N, D), dtype=np.float32) * 2 - 1)
xt = jnp.asarray(np.ascontiguousarray((rng.random((N, D), dtype=np.float32) * 2 - 1).T))
q = jnp.asarray(rng.random((Q, D), dtype=np.float32) * 2 - 1)
jax.block_until_ready((x, xt, q))
print(f"device: {jax.devices()[0]}", flush=True)


def bench(name, fn, *args, iters=20, repeats=3, per=1):
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
    print(f"{name:56s} {best * 1e3 / per:8.3f} ms/search", flush=True)


@jax.jit
def single(qq, xx):
    return jax.lax.top_k(qq @ xx.T, K)


@jax.jit
def single_pre_t(qq, xxt):
    return jax.lax.top_k(qq @ xxt, K)


def chained(qq, xx):
    out = None
    for _ in range(8):
        s, i = jax.lax.top_k(qq @ xx.T, K)
        qq = qq + s[0, 0] * 1e-12
        out = (s, i)
    return out


def chained_pre_t(qq, xxt):
    out = None
    for _ in range(8):
        s, i = jax.lax.top_k(qq @ xxt, K)
        qq = qq + s[0, 0] * 1e-12
        out = (s, i)
    return out


def chained_mm_only(qq, xx):
    out = None
    for _ in range(8):
        s = qq @ xx.T
        red = jnp.max(s, axis=1)
        qq = qq + red[0] * 1e-12
        out = red
    return out


bench("single q@x.T + topk (per-call, dispatch-bound)", single, q, x)
bench("single q@xt + topk", single_pre_t, q, xt)
bench("chained8 q@x.T + topk (/8)", jax.jit(chained), q, x, per=8)
bench("chained8 q@xt + topk (/8)", jax.jit(chained_pre_t), q, xt, per=8)
bench("chained8 q@x.T matmul only (/8)", jax.jit(chained_mm_only), q, x, per=8)

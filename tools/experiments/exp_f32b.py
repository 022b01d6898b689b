"""Isolate the in-chain lax.top_k pathology and find a fair f32 baseline."""

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
qbig = jnp.asarray(rng.random((8 * Q, D), dtype=np.float32) * 2 - 1)
scores0 = qbig[:Q] @ x.T
jax.block_until_ready((x, qbig, scores0))
print(f"device: {jax.devices()[0]}", flush=True)


def bench(name, fn, *args, iters=10, repeats=3, per=8):
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
    print(f"{name:56s} {best * 1e3 / per:8.3f} ms/unit", flush=True)


def topk_only_chain(s):
    out = None
    for _ in range(8):
        v, i = jax.lax.top_k(s, K)
        s = s + v[0, 0] * 1e-12
        out = (v, i)
    return out


def approx_only_chain(s):
    out = None
    for _ in range(8):
        v, i = jax.lax.approx_max_k(s, K)
        s = s + v[0, 0] * 1e-12
        out = (v, i)
    return out


def slices_chain(qq, xx):
    outs = []
    for c in range(8):
        qs = jax.lax.dynamic_slice_in_dim(qq, c * Q, Q, 0)
        outs.append(jax.lax.top_k(qs @ xx.T, K))
    return outs


def sort_vs_variable_k(s):
    # is k=10 top_k lowering to a full sort? compare k=100
    out = None
    for _ in range(8):
        v, i = jax.lax.top_k(s, 100)
        s = s + v[0, 0] * 1e-12
        out = (v, i)
    return out


bench("chained8 top_k only [256,100k] (/8)", jax.jit(topk_only_chain), scores0)
bench("chained8 approx_max_k only (/8)", jax.jit(approx_only_chain), scores0)
bench("8 query slices matmul+topk, no dep (/8)", jax.jit(slices_chain), qbig, x)
bench("chained8 top_k k=100 (/8)", jax.jit(sort_vs_variable_k), scores0)

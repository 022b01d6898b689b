"""Round-3: split the exact fused search cost at 100k x 1024 into
(a) the Pallas class-ladder kernel and (b) the host-side verified merge
(concatenate + lax.top_k + spill check), to see which side regressed the
100k exact bar (bench.py: 1.75 ms vs round-2's 0.81).

    python tools/experiments/exp_exact_split.py [k]
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 3)[0])

import quantization_tpu as qt  # noqa: E402
from quantization_tpu.utils.compile_cache import (  # noqa: E402
    enable_compilation_cache,
)

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from quantization_tpu.ops.pallas import ktile  # noqa: E402
from quantization_tpu.ops.pallas.sq_kernel import sq_search_pallas  # noqa: E402

K = int(sys.argv[1]) if len(sys.argv) > 1 else 10
N, D, Q = 100_000, 1024, 256
CHAIN, ITERS = 8, 10

rng = np.random.default_rng(5)
data = rng.random((N, D), np.float32)
params = qt.VectorParameters(D, N, qt.DistanceType.DOT, False)
enc = qt.ScalarQuantizerU8.encode(data, params)
queries = rng.random((CHAIN * Q, D), np.float32)
eq = enc.encode_query(queries)
qa, qb = jnp.asarray(eq.codes), jnp.asarray(eq.offsets)

r = ktile.class_r(K)
tile_n = 2048
nt = enc.codes.shape[0] // tile_n
span = ktile.class_span(nt, K, r)
print(f"k={K} r={r} nt={nt} span={span} "
      f"pool_width={r * (-(-nt // span)) * ktile.SLOT}", flush=True)


def timed(label, fn, *chains):
    outs = [fn(*c) for c in chains]  # warm/compile
    jax.block_until_ready(outs)
    best = 1e9
    for _ in range(ITERS):
        t0 = time.perf_counter()
        outs = [fn(*c) for c in chains]
        jax.block_until_ready(outs)
        best = min(best, (time.perf_counter() - t0) / len(chains))
    print(f"{label:28s}: {best * 1e3:7.3f} ms/batch", flush=True)
    return outs


chains = [(qa[i * Q:(i + 1) * Q], qb[i * Q:(i + 1) * Q]) for i in range(CHAIN)]


@jax.jit
def full(a, b):
    return sq_search_pallas(
        a, b, enc.codes, enc.voffsets, enc._mult_dev,
        distance_type=params.distance_type, n_valid=enc.count, k=K,
        mode="exact")


@jax.jit
def approx(a, b):
    return sq_search_pallas(
        a, b, enc.codes, enc.voffsets, enc._mult_dev,
        distance_type=params.distance_type, n_valid=enc.count, k=K,
        mode="approx")


timed("full exact", full, *chains)
timed("approx", approx, *chains)

# Kernel-only: monkeypatch the merge to a trivial reducer so XLA still
# consumes every output but no top_k runs.
orig_merge = ktile.merge_classes_verified


def null_merge(vals, idxs, spill, k, fallback):
    s = sum(jnp.sum(v) for v in vals) + jnp.sum(spill)
    i = sum(jnp.sum(x) for x in idxs)
    return (jnp.zeros((vals[0].shape[0], k), jnp.float32) + s,
            jnp.zeros((vals[0].shape[0], k), jnp.int32) + i)


import quantization_tpu.ops.pallas.sq_kernel as sqk  # noqa: E402

sqk.merge_classes_verified = null_merge


@jax.jit
def kernel_only(a, b):
    return sq_search_pallas(
        a, b, enc.codes, enc.voffsets, enc._mult_dev,
        distance_type=params.distance_type, n_valid=enc.count, k=K,
        mode="exact")


timed("kernel only (null merge)", kernel_only, *chains)
sqk.merge_classes_verified = orig_merge

# Merge-only: feed precomputed slot tensors of the real width.
W = (-(-nt // span)) * ktile.SLOT
vals = [jnp.asarray(rng.random((Q, W), np.float32)) for _ in range(r)]
idxs = [jnp.asarray(rng.integers(0, N, (Q, W), dtype=np.int32))
        for _ in range(r)]
spill = jnp.asarray(rng.random((Q, W), np.float32) - 2.0)  # never violates


@jax.jit
def merge_only(v0):
    return orig_merge([v0] + vals[1:], idxs, spill, K,
                      lambda: (jnp.zeros((Q, K)), jnp.zeros((Q, K), jnp.int32)))


vchains = [(vals[0] + i,) for i in range(CHAIN)]
timed("merge only", merge_only, *vchains)

# Raw lax.top_k at the pooled width, for reference.
pool = jnp.concatenate(vals, axis=1)


@jax.jit
def raw_topk(p):
    s, pos = jax.lax.top_k(p, K)
    return s, pos


timed(f"raw lax.top_k [{Q},{r * W}]", raw_topk, *[(pool + i,) for i in range(CHAIN)])

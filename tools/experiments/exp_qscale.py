"""Q-scaling envelope at 100k x 1024 (VERDICT r2 missing #5): where does
the fused search flip from corpus-streaming-bound to compute-bound, and
what is peak qps/chip?

Sweeps Q in {64, 256, 512, 1024} over the SQ and BQ fused kernels (exact
+ approx). bench.py-style pipelined timing (chain independent slices,
enqueue many, drain once). The TPU analogue of criterion's access-pattern
sweeps (demos/benches/encode.rs:41-144).

    python tools/experiments/exp_qscale.py [sq|bq]
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

WHICH = sys.argv[1] if len(sys.argv) > 1 else "sq"
N, D, K = 100_000, 1024, 10
QS = (64, 256, 512, 1024)
CHAIN, ITERS = 8, 12

rng = np.random.default_rng(5)
data = rng.random((N, D), np.float32)
params = qt.VectorParameters(D, N, qt.DistanceType.DOT, False)
queries = rng.random((CHAIN * max(QS), D), np.float32)

if WHICH == "sq":
    enc = qt.ScalarQuantizerU8.encode(data, params)
    eq = enc.encode_query(queries)
    opa, opb = jnp.asarray(eq.codes), jnp.asarray(eq.offsets)
    from quantization_tpu.ops.pallas.sq_kernel import sq_search_pallas

    def one(qa, qb, k, mode):
        return sq_search_pallas(
            qa, qb, enc.codes, enc.voffsets, enc._mult_dev,
            distance_type=params.distance_type, n_valid=enc.count, k=k,
            mode=mode)

    stream_bytes = N * D  # int8 codes
else:
    enc = qt.BinaryQuantizer.encode(data, params)
    eq = enc.encode_query(queries)
    opa, opb = jnp.asarray(eq.planes), None
    from quantization_tpu.ops.pallas.bq_kernel import bq_search_mxu

    def one(qa, qb, k, mode):
        return bq_search_mxu(
            qa, enc.planes, distance_type=params.distance_type,
            invert=False, dim=D, n_valid=enc.count, k=k, mode=mode)

    stream_bytes = N * D // 8


def bench(q, mode):

    @jax.jit
    def chain(a, b):
        outs = []
        for c in range(CHAIN):
            qa = jax.lax.dynamic_slice_in_dim(a, c * q, q, 0)
            qb = (jax.lax.dynamic_slice_in_dim(b, c * q, q, 0)
                  if b is not None else None)
            s, i = one(qa, qb, K, mode)
            outs.append((s, i))
        return outs

    r = chain(opa, opb)
    np.asarray(jax.tree_util.tree_leaves(r)[0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            r = chain(opa, opb)
        np.asarray(jax.tree_util.tree_leaves(r)[0])
        best = min(best, (time.perf_counter() - t0) / ITERS / CHAIN)
    gbs = stream_bytes / best / 1e9
    tops = q * N * D * 2 / best / 1e12  # int8 MAC rate (BQ: post-unpack)
    print(f"{WHICH} {mode:6s} Q={q:5d}: {best*1e3:7.3f} ms/batch "
          f"{q/best:10,.0f} qps  {gbs:6.0f} GB/s-equiv  {tops:5.1f} TOPS",
          flush=True)


for q in QS:
    for mode in ("approx", "exact"):
        bench(q, mode)

"""Verify the widened query tiles (approx tq=256, BQ exact corpus-outer
with unpack scratch, PQ tq=256) lower on real hardware and measure them
at Q=256, N=100k. Chained independent slices (see PERF_NOTES)."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from quantization_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from quantization_tpu.core.types import DistanceType  # noqa: E402
from quantization_tpu.ops.pallas.bq_kernel import bq_search_mxu  # noqa: E402
from quantization_tpu.ops.pallas.pq_kernel import pq_scores_pallas  # noqa: E402
from quantization_tpu.ops.pallas.sq_kernel import sq_search_pallas  # noqa: E402

Q, N, D, K = 256, 100_000, 1024, 10
NPAD = N + (-N) % 2048
CHAIN = 8

rng = np.random.default_rng(0)
qcodes_all = jnp.asarray(rng.integers(0, 128, (CHAIN * Q, D), dtype=np.int8))
codes = jnp.asarray(rng.integers(0, 128, (NPAD, D), dtype=np.int8))
qoff_all = jnp.asarray(rng.random(CHAIN * Q, dtype=np.float32))
voff = jnp.asarray(rng.random(NPAD, dtype=np.float32))
mult = jnp.float32(0.001)

# BQ operands
W8 = ((D // 32) + 7) // 8 * 8
planes = jnp.asarray(
    rng.integers(0, 2**32, (W8, NPAD), dtype=np.uint32)
)
qplanes_all = jnp.asarray(
    rng.integers(0, 2**32, (CHAIN * Q, D // 32), dtype=np.uint32)
)

# PQ operands (m=96 at D=768-equivalent byte budget)
M = 96
MPAD = 96
PQN = N + (-N) % 1024
codes_t = jnp.asarray(
    rng.integers(0, 256, (MPAD, PQN), dtype=np.uint8)
)
lut_all = jnp.asarray(
    rng.standard_normal((CHAIN * 32, M, 256)).astype(np.float32)
)
jax.block_until_ready((qcodes_all, codes, planes, codes_t, lut_all))
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


def sq(mode):
    @jax.jit
    def fn(qc, qo, c, vo):
        outs = []
        for b in range(CHAIN):
            qcb = jax.lax.dynamic_slice_in_dim(qc, b * Q, Q, 0)
            qob = jax.lax.dynamic_slice_in_dim(qo, b * Q, Q, 0)
            outs.append(sq_search_pallas(
                qcb, qob, c, vo, mult,
                distance_type=DistanceType.DOT, n_valid=N, k=K, mode=mode,
                interpret=False,
            ))
        return outs

    return fn


def bq(mode, k):
    @jax.jit
    def fn(qp, pls):
        outs = []
        for b in range(CHAIN):
            qpb = jax.lax.dynamic_slice_in_dim(qp, b * Q, Q, 0)
            outs.append(bq_search_mxu(
                qpb, pls,
                distance_type=DistanceType.DOT, invert=False, dim=D,
                n_valid=N, k=k, mode=mode, interpret=False,
            ))
        return outs

    return fn


@jax.jit
def pqs(lut, ct):
    outs = []
    for b in range(CHAIN):
        lb = jax.lax.dynamic_slice_in_dim(lut, b * 32, 32, 0)
        s = pq_scores_pallas(lb, ct, n_valid=N, interpret=False)
        outs.append(jnp.max(s, axis=1))
    return outs


bench("SQ exact k=10 (corpus-outer)", sq("exact"), qcodes_all, qoff_all, codes, voff)
bench("SQ approx k=10 (tq=256)", sq("approx"), qcodes_all, qoff_all, codes, voff)
bench("BQ exact k=10 (outer+scratch)", bq("exact", 10), qplanes_all, planes)
bench("BQ approx k=80 (tq=256)", bq("approx", 80), qplanes_all, planes)
bench("PQ scores m=96 Q=32 int8 (tq<=256)", pqs, lut_all, codes_t)

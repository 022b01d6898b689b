"""SUPERSEDED: these measurements were polluted by large-output drains (~13 MB/s tunnel readback) — see exp_sq4.py for the corrected run.

SQ matmul-pipeline variants: isolate why the fused kernel runs ~6x off
roofline (8us/tile vs 1.4us MXU + 2.4us DMA at [128,1024]x[1024,2048] int8).

Variants (all emit tiny outputs; k=0 'extraction' = per-tile segment max):
  A. current layout: c[TN, D], dot contracting (1,1)
  B. transposed corpus: c_t[D, TN], contracting (1,0)  (natural MXU rhs)
  C. A with tile_q=256 (corpus streamed once)
  D. B with tile_q=256
  E. bf16 operands (same tiles as A)  — is int8 actually faster than bf16?
  F. DMA floor: load tiles, no matmul
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from quantization_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

Q, N, D = 256, 100_000, 1024
NPAD = N + (-N) % 2048
TILE_N = 2048

rng = np.random.default_rng(0)
qcodes = jnp.asarray(rng.integers(0, 128, (Q, D), dtype=np.int8))
codes = jnp.asarray(rng.integers(0, 128, (NPAD, D), dtype=np.int8))
codes_t = jnp.asarray(np.ascontiguousarray(np.asarray(codes).T))  # [D, NPAD]
q_bf = qcodes.astype(jnp.bfloat16)
c_bf = codes.astype(jnp.bfloat16)
jax.block_until_ready((qcodes, codes, codes_t, q_bf, c_bf))
print(f"device: {jax.devices()[0]}", flush=True)


def bench(name, fn, *args, iters=50, repeats=3):
    for _ in range(3):
        r = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(r)[0])
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(r)[0])
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"{name:46s} {best * 1e3:8.3f} ms/call", flush=True)
    return best


def seg_max(acc):
    # one-pass strided segment max -> [TQ, 128] (cheap, bounded output)
    tq, tn = acc.shape
    v = acc[:, :128]
    for s in range(1, tn // 128):
        v = jnp.maximum(v, acc[:, s * 128 : (s + 1) * 128])
    return v


def make_nt(tile_q, transposed, dtype):
    def kernel(q_ref, c_ref, out_ref):
        if transposed:
            acc = jax.lax.dot_general(
                q_ref[:], c_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32 if dtype == jnp.bfloat16 else jnp.int32,
            )
        else:
            acc = jax.lax.dot_general(
                q_ref[:], c_ref[:], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32 if dtype == jnp.bfloat16 else jnp.int32,
            )
        out_ref[:] = seg_max(acc.astype(jnp.float32))

    nt = NPAD // TILE_N
    if transposed:
        c_spec = pl.BlockSpec((D, TILE_N), lambda i, j: (0, j), memory_space=pltpu.VMEM)
    else:
        c_spec = pl.BlockSpec((TILE_N, D), lambda i, j: (j, 0), memory_space=pltpu.VMEM)

    @jax.jit
    def run(q, c):
        return pl.pallas_call(
            kernel,
            grid=(Q // tile_q, nt),
            in_specs=[
                pl.BlockSpec((tile_q, D), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                c_spec,
            ],
            out_specs=pl.BlockSpec((tile_q, 128), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Q, nt * 128), jnp.float32),
        )(q, c)

    return run


def make_dma_floor(tile_q):
    def kernel(q_ref, c_ref, out_ref):
        # consume one sublane-block so the loads aren't dead-code eliminated
        out_ref[:] = q_ref[0:tile_q, 0:128].astype(jnp.float32) + jnp.sum(
            c_ref[0:8, 0:128].astype(jnp.float32)
        )

    nt = NPAD // TILE_N

    @jax.jit
    def run(q, c):
        return pl.pallas_call(
            kernel,
            grid=(Q // tile_q, nt),
            in_specs=[
                pl.BlockSpec((tile_q, D), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE_N, D), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile_q, 128), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Q, nt * 128), jnp.float32),
        )(q, c)

    return run


bench("A int8 c[TN,D] contract(1,1) tq=128", make_nt(128, False, jnp.int8), qcodes, codes)
bench("B int8 c_t[D,TN] contract(1,0) tq=128", make_nt(128, True, jnp.int8), qcodes, codes_t)
bench("C int8 c[TN,D] tq=256", make_nt(256, False, jnp.int8), qcodes, codes)
bench("D int8 c_t[D,TN] tq=256", make_nt(256, True, jnp.int8), qcodes, codes_t)
bench("E bf16 c[TN,D] tq=128", make_nt(128, False, jnp.bfloat16), q_bf, c_bf)
bench("F DMA floor tq=256 (no matmul)", make_dma_floor(256), qcodes, codes)

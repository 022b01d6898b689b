"""PQ scan experiments (VERDICT item 3):

  1. one-hot MXU kernel, int8 LUT vs bf16 LUT (chained dispatch timing)
  2. XLA LUT-gather path across Q = 1..256 (the one-hot-vs-gather
     crossover table for PERF_NOTES)
  3. an actual VMEM-resident-LUT dynamic-index gather kernel attempt
     (SURVEY §7 design inversion 5a) — records the Mosaic lowering
     outcome either way.
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

from quantization_tpu.ops import pq as pq_ops  # noqa: E402
from quantization_tpu.ops.pallas.pq_kernel import (  # noqa: E402
    M_BLK,
    TILE_N,
    pq_scores_pallas,
)

N, M = 100_000, 96
NPAD = N + (-N) % TILE_N
MPAD = M + (-M) % M_BLK

rng = np.random.default_rng(0)
codes_np = np.zeros((NPAD, MPAD), np.uint8)
codes_np[:N, :M] = rng.integers(0, 256, (N, M), dtype=np.uint8)
codes_t = jnp.asarray(codes_np.T.copy())
codes_nm = jnp.asarray(codes_np[:N, :M])
jax.block_until_ready(codes_t)
print(f"device: {jax.devices()[0]}  N={N} M={M}", flush=True)

CHAIN = 4


def bench(name, fn, *args, iters=10, repeats=3, per=CHAIN):
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
    print(f"{name:52s} {best * 1e3 / per:8.3f} ms/scan", flush=True)
    return best / per


def chained_onehot(precision):
    def fn(lut):
        out = None
        for _ in range(CHAIN):
            s = pq_scores_pallas.__wrapped__(
                lut, codes_t, n_valid=N, interpret=False, precision=precision
            )
            red = jnp.max(s, axis=1)
            lut = lut + red[0] * 1e-30
            out = red
        return out

    return jax.jit(fn)


def chained_xla(lut):
    out = None
    for _ in range(CHAIN):
        s = pq_ops.score_lut_xla(lut, codes_nm)
        red = jnp.max(s, axis=1)
        lut = lut + red[0] * 1e-30
        out = red
    return out


chained_xla = jax.jit(chained_xla)

for q in (1, 8, 16, 64, 256):
    lut = jnp.asarray(rng.standard_normal((q, M, 256)).astype(np.float32))
    jax.block_until_ready(lut)
    bench(f"one-hot int8 Q={q}", chained_onehot("int8"), lut)
    if q in (16, 256):
        bench(f"one-hot bf16 Q={q}", chained_onehot("bf16"), lut)
    bench(f"XLA LUT gather Q={q}", chained_xla, lut)

# ---- 5a: VMEM-resident-LUT dynamic-index gather kernel (Q=1) ----


def gather_kernel(codes_ref, lut_ref, out_ref):
    codes = codes_ref[:].astype(jnp.int32)  # [M_BLK, TILE_N]
    acc = jnp.zeros((8, TILE_N), jnp.float32)
    lut_row = lut_ref[0, :]  # [M_BLK*256] VMEM-resident
    for m_local in range(M_BLK):
        idx = codes[m_local, :] + m_local * 256  # [TILE_N] dynamic indices
        acc = acc.at[0].add(jnp.take(lut_row, idx))
    out_ref[:] = acc


def try_gather():
    lut1 = jnp.asarray(
        rng.standard_normal((1, MPAD * 256)).astype(np.float32)
    )
    try:
        out = pl.pallas_call(
            gather_kernel,
            grid=(NPAD // TILE_N, MPAD // M_BLK),
            in_specs=[
                pl.BlockSpec(
                    (M_BLK, TILE_N), lambda j, l: (l, j),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, M_BLK * 256), lambda j, l: (0, l),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (8, TILE_N), lambda j, l: (0, j), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((8, NPAD), jnp.float32),
        )(codes_t, lut1)
        jax.block_until_ready(out)
        print("5a gather kernel: LOWERED AND RAN", flush=True)

        @jax.jit
        def run(c, l):
            s = pl.pallas_call(
                gather_kernel,
                grid=(NPAD // TILE_N, MPAD // M_BLK),
                in_specs=[
                    pl.BlockSpec(
                        (M_BLK, TILE_N), lambda j, l: (l, j),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (1, M_BLK * 256), lambda j, l: (0, l),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                out_specs=pl.BlockSpec(
                    (8, TILE_N), lambda j, l: (0, j), memory_space=pltpu.VMEM
                ),
                out_shape=jax.ShapeDtypeStruct((8, NPAD), jnp.float32),
            )(c, l)
            return jnp.max(s)

        bench("5a VMEM-LUT gather kernel Q=1", run, codes_t, lut1, per=1)
    except Exception as e:  # noqa: BLE001
        msg = str(e).splitlines()
        print("5a gather kernel: LOWERING FAILED:", flush=True)
        for line in msg[:6]:
            print("   ", line, flush=True)


try_gather()

"""Second attempt at design-inversion 5a: Mosaic said 'Only 2D gather is
supported' — try the 2D formulation: per chunk row m, gather
lut2d[m, codes[m, :]] via take_along_axis on a [M_BLK, 256] LUT block
against [M_BLK, TILE_N] code indices (a lane-axis gather). If it lowers,
measure it against the one-hot path at Q=1 and Q=256."""

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

from quantization_tpu.ops.pallas.pq_kernel import M_BLK, TILE_N  # noqa: E402

N, M = 100_000, 96
NPAD = N + (-N) % TILE_N
MPAD = M + (-M) % M_BLK

rng = np.random.default_rng(0)
codes_np = np.zeros((MPAD, NPAD), np.uint8)
codes_np[:M, :N] = rng.integers(0, 256, (M, N), dtype=np.uint8)
codes_t = jnp.asarray(codes_np)
jax.block_until_ready(codes_t)
print(f"device: {jax.devices()[0]}", flush=True)


def bench(name, fn, *args, iters=15, repeats=3):
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
    print(f"{name:44s} {best * 1e3:8.3f} ms/scan", flush=True)


def gather_kernel_2d(codes_ref, lut_ref, out_ref, acc_ref):
    """lut_ref [M_BLK, 256] f32 (one query); codes [M_BLK, TILE_N].
    Accumulate sum over chunk rows of lut[m, code[m, n]]."""
    li = pl.program_id(2)

    @pl.when(li == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    idx = codes_ref[:].astype(jnp.int32)  # [M_BLK, TILE_N]
    picked = jnp.take_along_axis(lut_ref[:], idx, axis=1)  # [M_BLK, TILE_N]
    acc_ref[:] = acc_ref[:] + jnp.sum(picked, axis=0, keepdims=True)

    @pl.when(li == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = acc_ref[:]


def try_2d_gather():
    lut = jnp.asarray(
        rng.standard_normal((MPAD, 256)).astype(np.float32)
    )  # ONE query's LUT, chunk-major
    grid = (1, NPAD // TILE_N, MPAD // M_BLK)
    try:
        @jax.jit
        def run(ct, l):
            out = pl.pallas_call(
                gather_kernel_2d,
                grid=grid,
                in_specs=[
                    pl.BlockSpec(
                        (M_BLK, TILE_N), lambda q, j, m: (m, j),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (M_BLK, 256), lambda q, j, m: (m, 0),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                out_specs=pl.BlockSpec(
                    (1, TILE_N), lambda q, j, m: (0, j),
                    memory_space=pltpu.VMEM,
                ),
                out_shape=jax.ShapeDtypeStruct((1, NPAD), jnp.float32),
                scratch_shapes=[pltpu.VMEM((1, TILE_N), jnp.float32)],
            )(ct, l)
            return jnp.max(out)

        r = run(codes_t, lut)
        jax.block_until_ready(r)
        print("2D take_along_axis gather: LOWERED AND RAN", flush=True)
        bench("5a 2D-gather LUT scan Q=1", run, codes_t, lut)
        # correctness spot check
        out_full = np.zeros(NPAD, np.float32)
        lut_np = np.asarray(lut)
        for m in range(MPAD):
            out_full += lut_np[m, codes_np[m]]
        got = float(np.asarray(run(codes_t, lut)))
        want = float(out_full.max())
        print(f"   max check: got={got:.4f} want={want:.4f}", flush=True)
    except Exception as e:  # noqa: BLE001
        print("5a 2D gather: LOWERING FAILED:", flush=True)
        for line in str(e).splitlines()[:5]:
            print("   ", line, flush=True)


try_2d_gather()

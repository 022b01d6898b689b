"""SUPERSEDED: V1-V4 numbers include ~10 ms/call of [Q, nt*128] readback pollution; the bisect CONCLUSION (control is clean, variants were drain-bound) is what mattered — see exp_sq4.py.

Bisect: why do standalone kernel variants run 5-10x slower than the
production sq_search_pallas at identical tiling?"""

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

from quantization_tpu.core.types import DistanceType  # noqa: E402
from quantization_tpu.ops.pallas.sq_kernel import sq_search_pallas  # noqa: E402
from quantization_tpu.ops.pallas.ktile import extract_topk_tile  # noqa: E402

Q, N, D = 256, 100_000, 1024
NPAD = N + (-N) % 2048
TILE_N = 2048

rng = np.random.default_rng(0)
qcodes = jnp.asarray(rng.integers(0, 128, (Q, D), dtype=np.int8))
codes = jnp.asarray(rng.integers(0, 128, (NPAD, D), dtype=np.int8))
qoff = jnp.asarray(rng.random(Q, dtype=np.float32))
voff = jnp.asarray(rng.random(NPAD, dtype=np.float32))
mult = jnp.float32(0.001)
jax.block_until_ready((qcodes, codes, qoff, voff))
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
    print(f"{name:52s} {best * 1e3:8.3f} ms/call", flush=True)
    return best


@jax.jit
def control(qc, qo, c, vo):
    return sq_search_pallas(
        qc, qo, c, vo, mult,
        distance_type=DistanceType.DOT, n_valid=N, k=1, mode="exact",
        interpret=False,
    )


# V1: replicate production structure exactly by hand (k=1 extraction,
# SMEM multiplier, same specs, same out shape), NO merge afterwards.
def make_v1(tile_q, with_extract, with_epilogue, out128):
    nt = NPAD // TILE_N

    def kernel(mult_ref, q_ref, c_ref, qoff_ref, voff_ref, outv_ref):
        acc = jax.lax.dot_general(
            q_ref[:], c_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        if with_epilogue:
            scores = (
                mult_ref[0] * acc.astype(jnp.float32)
                + qoff_ref[:] + voff_ref[:]
            )
        else:
            scores = acc.astype(jnp.float32)
        if with_extract:
            vals, _ = extract_topk_tile(scores, 1, 0)
            outv_ref[:] = vals
        else:
            outv_ref[:] = scores[:, :128]

    @jax.jit
    def run(qc, qo, c, vo):
        qoff2 = qo.reshape(-1, 1)
        voff2 = vo.reshape(1, -1)
        return pl.pallas_call(
            kernel,
            grid=(Q // tile_q, nt),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((tile_q, D), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE_N, D), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_q, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TILE_N), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (tile_q, 128), lambda i, j: (i, j), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((Q, nt * 128), jnp.float32),
        )(mult.reshape(1), qc, c, qoff2, voff2)

    return run


bench("control: production sq_search k=1", control, qcodes, qoff, codes, voff)
bench("V1 full replica (extract+epilogue) tq=128",
      make_v1(128, True, True, True), qcodes, qoff, codes, voff)
bench("V2 no extract (write scores[:, :128]) tq=128",
      make_v1(128, False, True, True), qcodes, qoff, codes, voff)
bench("V3 no extract, no epilogue tq=128",
      make_v1(128, False, False, True), qcodes, qoff, codes, voff)
bench("V4 full replica tq=256",
      make_v1(256, True, True, True), qcodes, qoff, codes, voff)

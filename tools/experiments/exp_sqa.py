"""Why is SQ approx ~3x off its roofline at scale (63 ms vs ~22+10 ms at
10M) while BQ approx hits its roofline? Bisect at 2M x 768 (1.5 GB)."""

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

Q, D = 256, 768
N = 2 ** 21
TILE_N = 2048
NT = N // TILE_N

rng = np.random.default_rng(0)
qcodes = jnp.asarray(rng.integers(0, 128, (Q, D), dtype=np.int8))
codes = jnp.asarray(rng.integers(0, 128, (N, D), dtype=np.int8))
qoff = jnp.asarray(rng.random(Q, dtype=np.float32))
voff = jnp.asarray(rng.random(N, dtype=np.float32))
mult = jnp.float32(0.001)
jax.block_until_ready((qcodes, codes))
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
    print(f"{name:52s} {best * 1e3:8.3f} ms/scan", flush=True)


@jax.jit
def prod_approx(qc, qo, c, vo):
    return sq_search_pallas(
        qc, qo, c, vo, mult,
        distance_type=DistanceType.DOT, n_valid=N, k=10, mode="approx",
        interpret=False,
    )


@jax.jit
def prod_exact1(qc, qo, c, vo):
    return sq_search_pallas(
        qc, qo, c, vo, mult,
        distance_type=DistanceType.DOT, n_valid=N, k=1, mode="exact",
        interpret=False,
    )


def seg_max(acc):
    tq, tn = acc.shape
    v = acc[:, :128]
    for s in range(1, tn // 128):
        v = jnp.maximum(v, acc[:, s * 128 : (s + 1) * 128])
    return v


def variant(tile_q, with_matmul, with_seg):
    def kernel(q_ref, c_ref, out_ref):
        if not with_matmul:
            out_ref[:] = jnp.sum(
                c_ref[0:8, 0:128].astype(jnp.float32)
            ) + jnp.zeros((tile_q, 128), jnp.float32)
            return
        acc = jax.lax.dot_general(
            q_ref[:], c_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        out_ref[:] = seg_max(acc) if with_seg else acc[:, :128]

    @jax.jit
    def run(q, c):
        out = pl.pallas_call(
            kernel,
            grid=(Q // tile_q, NT),
            in_specs=[
                pl.BlockSpec((tile_q, D), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE_N, D), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile_q, 128), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Q, NT * 128), jnp.float32),
        )(q, c)
        return jnp.max(out, axis=1)

    return run


bench("production approx k=10 (tq=256)", prod_approx, qcodes, qoff, codes, voff)
bench("production exact k=1 (tq=128, corpus-outer)", prod_exact1, qcodes, qoff, codes, voff)
bench("V: matmul+segmax tq=256", variant(256, True, True), qcodes, codes)
bench("V: matmul+segmax tq=128", variant(128, True, True), qcodes, codes)
bench("V: matmul only tq=256", variant(256, True, False), qcodes, codes)
bench("V: DMA floor tq=256", variant(256, False, False), qcodes, codes)

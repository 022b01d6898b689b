"""SQ kernel geometry variants, with all outputs REDUCED ON DEVICE before
readback (the tunnel downloads leaves at ~13MB/s — a [Q, nt*128] output adds
~10ms/call of pure measurement pollution; see exp_sq3).

Questions:
  * is the 0.8-0.93ms pipeline floor corpus-streaming bound? (tq=256 halves
    corpus passes)
  * does a transposed corpus layout [D, N] help the MXU?
  * is int8 actually beating bf16?
  * what is the raw streaming floor (no matmul)?
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

from quantization_tpu.core.types import DistanceType  # noqa: E402
from quantization_tpu.ops.pallas.sq_kernel import sq_search_pallas  # noqa: E402

Q, N, D = 256, 100_000, 1024
NPAD = N + (-N) % 2048
TILE_N = 2048

rng = np.random.default_rng(0)
qcodes = jnp.asarray(rng.integers(0, 128, (Q, D), dtype=np.int8))
codes = jnp.asarray(rng.integers(0, 128, (NPAD, D), dtype=np.int8))
codes_t = jnp.asarray(np.ascontiguousarray(np.asarray(codes).T))  # [D, NPAD]
q_bf = qcodes.astype(jnp.bfloat16)
c_bf = codes.astype(jnp.bfloat16)
qoff = jnp.asarray(rng.random(Q, dtype=np.float32))
voff = jnp.asarray(rng.random(NPAD, dtype=np.float32))
mult = jnp.float32(0.001)
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
    print(f"{name:52s} {best * 1e3:8.3f} ms/call", flush=True)
    return best


@jax.jit
def control(qc, qo, c, vo):
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


def make_nt(tile_q, transposed, dtype, dma_only=False):
    nt = NPAD // TILE_N

    def kernel(q_ref, c_ref, out_ref):
        if dma_only:
            out_ref[:] = q_ref[:, 0:128].astype(jnp.float32) + jnp.sum(
                c_ref[0:8, 0:128].astype(jnp.float32)
            )
            return
        if transposed:
            acc = jax.lax.dot_general(
                q_ref[:], c_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32
                if dtype == jnp.bfloat16 else jnp.int32,
            )
        else:
            acc = jax.lax.dot_general(
                q_ref[:], c_ref[:], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32
                if dtype == jnp.bfloat16 else jnp.int32,
            )
        out_ref[:] = seg_max(acc.astype(jnp.float32))

    if transposed:
        c_spec = pl.BlockSpec((D, TILE_N), lambda i, j: (0, j), memory_space=pltpu.VMEM)
    else:
        c_spec = pl.BlockSpec((TILE_N, D), lambda i, j: (j, 0), memory_space=pltpu.VMEM)

    @jax.jit
    def run(q, c):
        out = pl.pallas_call(
            kernel,
            grid=(Q // tile_q, nt),
            in_specs=[
                pl.BlockSpec((tile_q, D), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                c_spec,
            ],
            out_specs=pl.BlockSpec((tile_q, 128), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Q, nt * 128), jnp.float32),
        )(q, c)
        return jnp.max(out, axis=1)  # [Q] tiny readback

    return run


bench("control: production sq_search k=1", control, qcodes, qoff, codes, voff)
bench("A int8 c[TN,D] (1,1) tq=128", make_nt(128, False, jnp.int8), qcodes, codes)
bench("B int8 c_t[D,TN] (1,0) tq=128", make_nt(128, True, jnp.int8), qcodes, codes_t)
bench("C int8 c[TN,D] tq=256", make_nt(256, False, jnp.int8), qcodes, codes)
bench("D int8 c_t[D,TN] tq=256", make_nt(256, True, jnp.int8), qcodes, codes_t)
bench("E bf16 c[TN,D] tq=128", make_nt(128, False, jnp.bfloat16), q_bf, c_bf)
bench("F DMA floor tq=256 (no matmul)", make_nt(256, False, jnp.int8, True), qcodes, codes)
bench("G DMA floor tq=128 (no matmul)", make_nt(128, False, jnp.int8, True), qcodes, codes)

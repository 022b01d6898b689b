"""Dissect the round-3 streaming-exact SQ search on the real chip:
where do the ~1.3 ms/batch go (kernel vs merge lax.top_k vs the
verification lax.cond)? One variant per process (compile-cache regime);
chained independent slices per the dispatch-floor methodology.

    python tools/experiments/exp_stream.py {kernel,merge,noverify,full,approx}
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

VARIANT = sys.argv[1] if len(sys.argv) > 1 else "full"
N, D, Q, K, CH = 100_000, 1024, 256, 10, 8

rng = np.random.default_rng(3)
data = rng.random((N, D), np.float32)
params = qt.VectorParameters(D, N, qt.DistanceType.DOT, False)
enc = qt.ScalarQuantizerU8.encode(data, params)
qq = rng.random((CH * Q, D), np.float32)
eq = enc.encode_query(qq)
qcs, qos = jnp.asarray(eq.codes), jnp.asarray(eq.offsets)


def one(qc, qo):
    from quantization_tpu.ops.pallas import ktile
    from quantization_tpu.ops.pallas import sq_kernel as sk

    if VARIANT == "full":
        s, i = sk.sq_search_pallas(
            qc, qo, enc.codes, enc.voffsets, enc._mult_dev,
            distance_type=params.distance_type, n_valid=enc.count, k=K,
        )
        return jnp.max(s) + jnp.sum(i % 7)
    if VARIANT == "approx":
        s, i = sk.sq_search_pallas(
            qc, qo, enc.codes, enc.voffsets, enc._mult_dev,
            distance_type=params.distance_type, n_valid=enc.count, k=K,
            mode="approx",
        )
        return jnp.max(s) + jnp.sum(i % 7)
    # manual re-assembly of the wrapper's pieces
    n = enc.codes.shape[0]
    tile_n = 512
    while tile_n * 2 <= 2048 and n % (tile_n * 2) == 0:
        tile_n *= 2
    nt = n // tile_n
    r, span = ktile.exact_stream_params(nt, K)
    nt_out = -(-nt // span)
    width = nt_out * r * ktile.SLOT
    kernel = sk._make_dot_stream_kernel(enc.count, tile_n, r, span)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    tq = 256
    vals, idxs, spill = pl.pallas_call(
        kernel,
        grid=(1, nt),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tq, D), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (tile_n, D), lambda i, j: (j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((tq, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, tile_n), lambda i, j: (0, j), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (tq, r * 128), lambda i, j: (i, j // span),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tq, r * 128), lambda i, j: (i, j // span),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tq, 128), lambda i, j: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((tq, width), jnp.float32),
            jax.ShapeDtypeStruct((tq, width), jnp.int32),
            jax.ShapeDtypeStruct((tq, 128), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((tq, 128), jnp.float32)],
    )(
        enc._mult_dev.reshape(1).astype(jnp.float32),
        qc,
        enc.codes,
        qo.reshape(-1, 1).astype(jnp.float32),
        enc.voffsets.reshape(1, -1).astype(jnp.float32),
    )
    if VARIANT == "kernel":
        return jnp.max(vals) + jnp.sum(idxs % 7) + jnp.max(spill)
    s, gi = jax.lax.top_k(vals, K)
    gi = jnp.take_along_axis(idxs, gi, axis=1) if False else gi  # noqa
    if VARIANT == "merge":
        return jnp.max(s) + jnp.sum(gi % 7) + jnp.max(spill)
    tau = s[:, K - 1 : K]
    viol = jnp.any(jnp.max(spill, axis=1, keepdims=True) > tau)
    if VARIANT == "noverify":
        return jnp.max(s) + jnp.sum(gi % 7) + viol.astype(jnp.float32)
    raise SystemExit(f"unknown variant {VARIANT}")


@jax.jit
def chain(qcs, qos):
    outs = []
    for c in range(CH):
        qc = jax.lax.dynamic_slice_in_dim(qcs, c * Q, Q, 0)
        qo = jax.lax.dynamic_slice_in_dim(qos, c * Q, Q, 0)
        outs.append(one(qc, qo))
    return jnp.stack(outs)


t0 = time.time()
r = chain(qcs, qos)
np.asarray(r)
print(f"{VARIANT}: compile {time.time()-t0:.0f}s", flush=True)
reps = 8
t0 = time.time()
for _ in range(reps):
    r = chain(qcs, qos)
np.asarray(r)
dt = (time.time() - t0) / (reps * CH) * 1000
print(f"{VARIANT}: {dt:.3f} ms/batch ({Q/dt*1000:.0f} qps)", flush=True)

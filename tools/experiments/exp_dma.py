"""Effective HBM->VMEM streaming bandwidth vs corpus tile size (D=768
int8 rows, device-reduced outputs, chained timing). Is the ~200 GB/s
effective rate a tile-size artifact?"""

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

D = 768
N = 2 ** 21  # 1.5 GB corpus, divisible by all tile sizes
rng = np.random.default_rng(0)
codes = jnp.asarray(rng.integers(0, 128, (N, D), dtype=np.int8))
jax.block_until_ready(codes)
print(f"device: {jax.devices()[0]}, corpus {N*D/2**30:.2f} GiB", flush=True)


def bench(name, fn, *args, iters=10, repeats=3, per=1):
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
    gbps = N * D / (best / per) / 1e9
    print(f"{name:40s} {best * 1e3 / per:8.3f} ms/pass  = {gbps:6.0f} GB/s", flush=True)


def dma_floor(tile_n):
    nt = N // tile_n

    def kernel(c_ref, out_ref):
        out_ref[:] = jnp.sum(
            c_ref[0:8, 0:128].astype(jnp.float32)
        ) + jnp.zeros((8, 128), jnp.float32)

    @jax.jit
    def run(c):
        out = pl.pallas_call(
            kernel,
            grid=(nt,),
            in_specs=[
                pl.BlockSpec((tile_n, D), lambda j: (j, 0), memory_space=pltpu.VMEM)
            ],
            out_specs=pl.BlockSpec((8, 128), lambda j: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )(c)
        return jnp.max(out)

    return run


@jax.jit
def xla_reduce(c):
    # XLA's own full-corpus streaming reduce as the bandwidth reference
    return jnp.sum(c.astype(jnp.int32))


for tn in (1024, 2048, 4096, 8192):
    if N % tn == 0:
        bench(f"pallas DMA floor tile_n={tn}", dma_floor(tn), codes)
bench("XLA int8 sum (stream reduce)", xla_reduce, codes)

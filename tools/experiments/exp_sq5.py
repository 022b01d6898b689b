"""Is the ~0.8ms floor per-call dispatch overhead (host->tunnel enqueue
rate) rather than device time?

Probes:
  1. trivial jitted op in the same enqueue loop     -> pure dispatch rate
  2. production search, 8 calls CHAINED inside ONE jit -> device time /8
  3. same chained probe for the DMA floor kernel
  4. N=50k vs N=100k inside-jit scaling
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from quantization_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from quantization_tpu.core.types import DistanceType  # noqa: E402
from quantization_tpu.ops.pallas.sq_kernel import sq_search_pallas  # noqa: E402

Q, N, D, K = 256, 100_000, 1024, 10
NPAD = N + (-N) % 2048
N2 = NPAD // 2  # 49152... must stay multiple of 2048

rng = np.random.default_rng(0)
qcodes = jnp.asarray(rng.integers(0, 128, (Q, D), dtype=np.int8))
codes = jnp.asarray(rng.integers(0, 128, (NPAD, D), dtype=np.int8))
qoff = jnp.asarray(rng.random(Q, dtype=np.float32))
voff = jnp.asarray(rng.random(NPAD, dtype=np.float32))
mult = jnp.float32(0.001)
jax.block_until_ready((qcodes, codes, qoff, voff))
print(f"device: {jax.devices()[0]}", flush=True)


def bench(name, fn, *args, iters=50, repeats=3, per=1):
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
    print(f"{name:52s} {best * 1e3 / per:8.3f} ms/unit", flush=True)
    return best


@jax.jit
def trivial(x):
    return x + 1.0


bench("trivial dispatch (x+1 on [8])", trivial, jnp.zeros(8))


def searched(qc, qo, c, vo, k=K):
    return sq_search_pallas(
        qc, qo, c, vo, mult,
        distance_type=DistanceType.DOT, n_valid=c.shape[0], k=k,
        mode="exact", interpret=False,
    )


@jax.jit
def one_search(qc, qo, c, vo):
    return searched(qc, qo, c, vo)


@jax.jit
def chained8(qc, qo, c, vo):
    s = None
    for _ in range(8):
        sv, si = searched(qc, qo, c, vo)
        # force sequential dependency: perturb the query offset by a scalar
        # derived from the previous result
        qo = qo + sv[0, 0] * 1e-12
        s = (sv, si)
    return s


@jax.jit
def chained8_half(qc, qo, c, vo):
    s = None
    for _ in range(8):
        sv, si = searched(qc, qo, c[:N2], vo[:N2])
        qo = qo + sv[0, 0] * 1e-12
        s = (sv, si)
    return s


bench("one search (per-call)", one_search, qcodes, qoff, codes, voff)
bench("8 chained searches in one jit (/8)", chained8, qcodes, qoff, codes, voff, per=8)
bench("8 chained searches N/2 (/8)", chained8_half, qcodes, qoff, codes, voff, per=8)

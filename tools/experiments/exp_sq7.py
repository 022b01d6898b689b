"""Chained-dispatch timing of ONE production fused-search variant
(argv[1] = exact10 | approx10 | exact1 | exact16), Q=256 N=100k D=1024.
One variant per process to keep cold compiles inside the driver timeout;
the persistent compile cache makes reruns cheap."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from quantization_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402

from quantization_tpu.core.types import DistanceType  # noqa: E402
from quantization_tpu.ops.pallas.sq_kernel import sq_search_pallas  # noqa: E402

Q, N, D = 256, 100_000, 1024
NPAD = N + (-N) % 2048
CHAIN = 8

variant = sys.argv[1] if len(sys.argv) > 1 else "exact10"
k, mode = {
    "exact10": (10, "exact"),
    "approx10": (10, "approx"),
    "exact1": (1, "exact"),
    "exact16": (16, "exact"),
}[variant]

rng = np.random.default_rng(0)
qcodes = jax.numpy.asarray(rng.integers(0, 128, (Q, D), dtype=np.int8))
codes = jax.numpy.asarray(rng.integers(0, 128, (NPAD, D), dtype=np.int8))
qoff = jax.numpy.asarray(rng.random(Q, dtype=np.float32))
voff = jax.numpy.asarray(rng.random(NPAD, dtype=np.float32))
mult = jax.numpy.float32(0.001)
jax.block_until_ready((qcodes, codes, qoff, voff))


@jax.jit
def chained(qc, qo, c, vo):
    s = None
    for _ in range(CHAIN):
        sv, si = sq_search_pallas(
            qc, qo, c, vo, mult,
            distance_type=DistanceType.DOT, n_valid=N, k=k, mode=mode,
            interpret=False,
        )
        qo = qo + sv[0, 0] * 1e-12
        s = (sv, si)
    return s


t0 = time.perf_counter()
r = chained(qcodes, qoff, codes, voff)
np.asarray(r[0])
print(f"compile+first: {time.perf_counter() - t0:.1f}s", flush=True)

best = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    for _ in range(25):
        r = chained(qcodes, qoff, codes, voff)
    np.asarray(r[0])
    best = min(best, (time.perf_counter() - t0) / 25)
print(f"{variant}: {best * 1e3 / CHAIN:.3f} ms/search (chained)", flush=True)

"""Sharded engine on the REAL TPU backend: 1-device mesh, 1.25M x 768 SQ.
Corpus codes are generated ON DEVICE (host f32 upload measured >30 min
through the tunnel); sharded and single-device paths serve the identical
quantizer state, so the parity check and timing are unaffected."""
import sys, time
import numpy as np
sys.path.insert(0, __file__.rsplit("/", 3)[0])
import jax, jax.numpy as jnp
import quantization_tpu as qt
from quantization_tpu.models.sq import SQMetadata
from quantization_tpu.ops import sq as sq_ops
from quantization_tpu.ops.pallas.sq_kernel import TILE_N as SQ_TILE
from quantization_tpu.utils.compile_cache import enable_compilation_cache
from quantization_tpu.parallel.sharded import ShardedScalarQuantizer, make_mesh
enable_compilation_cache()

N, D, Q, K = 1_250_000, 768, 256, 10
actual = sq_ops.actual_dim(D)
lane = sq_ops.lane_dim(D)
npad = N + (-N) % SQ_TILE
alpha, offset = sq_ops.alpha_offset_from_min_max(-1.0, 1.0)
params = qt.VectorParameters(D, N, qt.DistanceType.DOT, False)
mult = sq_ops.multiplier_for(qt.DistanceType.DOT, False, alpha)

key = jax.random.key(3)
k1, k2, k3 = jax.random.split(key, 3)
codes = jax.random.randint(k1, (npad, lane), 0, 128, dtype=jnp.int8)
voff = jax.random.uniform(k2, (npad,), jnp.float32)
sq = qt.ScalarQuantizerU8(codes, voff, SQMetadata(actual, alpha, offset, mult, params))
queries = np.asarray(jax.random.uniform(k3, (Q, D), jnp.float32))

mesh = make_mesh()
print("mesh devices:", mesh.devices.ravel(), flush=True)
sh = ShardedScalarQuantizer(sq, mesh)
eq = sq.encode_query(queries)

def timeit(fn, iters=12):
    r = fn()
    np.asarray(jax.tree_util.tree_leaves(r)[0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn()
        np.asarray(jax.tree_util.tree_leaves(r)[0])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best

for method in ("exact", "approx"):
    ss, si = sh.top_k_device(eq, K, method=method)
    us, ui = sq.top_k_device(eq, K, method=method)
    ssn, usn = np.asarray(ss), np.asarray(us)
    if method == "exact":
        np.testing.assert_allclose(ssn, usn, rtol=1e-5, atol=1e-4)
    ov = np.mean([len(set(np.asarray(si)[r]) & set(np.asarray(ui)[r]))/K for r in range(Q)])
    t_sh = timeit(lambda: sh.top_k_device(eq, K, method=method))
    t_un = timeit(lambda: sq.top_k_device(eq, K, method=method))
    print(f"{method:6s}: sharded {t_sh*1e3:6.2f} ms/batch ({Q/t_sh:8,.0f} qps)  "
          f"single {t_un*1e3:6.2f} ms  overlap {ov:.3f}", flush=True)
print("SHARDED-ON-TPU OK", flush=True)

"""BQ + PQ sharded fused paths on the REAL TPU: 1-device mesh, parity +
timing vs single-device (the SQ twin ran earlier: 4.58 vs 4.50 ms)."""
import sys, time
import numpy as np
sys.path.insert(0, __file__.rsplit("/", 3)[0])
import jax, jax.numpy as jnp
import quantization_tpu as qt
from quantization_tpu.models.bq import BQMetadata
from quantization_tpu.utils.compile_cache import enable_compilation_cache
from quantization_tpu.parallel.sharded import (
    ShardedBinaryQuantizer, ShardedProductQuantizer, make_mesh,
)
enable_compilation_cache()

Q, K, D = 256, 10, 768
rng = np.random.default_rng(11)
mesh = make_mesh()

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

def compare(name, single, sharded, eq):
    for method in ("exact", "approx"):
        ss, si = sharded.top_k_device(eq, K, method=method)
        us, ui = single.top_k_device(eq, K, method=method)
        np.testing.assert_allclose(np.asarray(ss), np.asarray(us),
                                   rtol=1e-5, atol=1e-4)
        ov = np.mean([len(set(np.asarray(si)[r]) & set(np.asarray(ui)[r]))/K
                      for r in range(Q)])
        t_sh = timeit(lambda: sharded.top_k_device(eq, K, method=method))
        t_un = timeit(lambda: single.top_k_device(eq, K, method=method))
        print(f"{name} {method:6s}: sharded {t_sh*1e3:6.2f} ms "
              f"single {t_un*1e3:6.2f} ms  overlap {ov:.3f}", flush=True)

# --- BQ at 1.25M x 768: planes built on device, wrap single -> sharded
N = 1_250_000
w = -(-D // 32)
w8 = w + (-w) % 8
key = jax.random.key(5)
planes = jax.random.randint(key, (w8, N), 0, 2**31 - 1, dtype=jnp.int32).astype(jnp.uint32)
params = qt.VectorParameters(D, N, qt.DistanceType.DOT, False)
bq = qt.BinaryQuantizer(planes, BQMetadata(params))
queries = rng.standard_normal((Q, D)).astype(np.float32)
eq = bq.encode_query(queries)
compare("BQ 1.25M", bq, ShardedBinaryQuantizer(bq, mesh), eq)

# --- PQ at 200k x 768 (PQ scan is FLOP-heavy; 200k keeps the drive quick)
N2 = 200_000
data = rng.standard_normal((N2, D)).astype(np.float32)
params2 = qt.VectorParameters(D, N2, qt.DistanceType.DOT, False)
pq = qt.ProductQuantizer.encode(data, params2, chunk_size=8)
eq2 = pq.encode_query(queries)
compare("PQ 200k", pq, ShardedProductQuantizer(pq, mesh), eq2)
print("BQ/PQ SHARDED-ON-TPU OK", flush=True)

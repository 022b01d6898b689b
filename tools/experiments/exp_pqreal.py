"""PQ-on-realistic-data diagnostic (round 3): is the 10M realistic
recall collapse (0.004) a bug or the data regime?

Reproduces bench_10m's realistic generator at 200k and measures the
ENGINE's PQ recall plus centroid usage. Finding: recall@10 = 0.539 at
200k with all 256 centroids in use per chunk -> the path is healthy; the
10M collapse is margin shrinkage vs PQ's constant reconstruction noise
(BQ's angle-proportional sign-bit noise does not collapse: 0.332).
NOTE: the reconstruction cross-check at the bottom references a
metadata attribute by an old name and was not rerun; the verdict rests
on the engine-recall + usage numbers above it.
"""
import sys, numpy as np
sys.path.insert(0, __file__.rsplit("/", 3)[0])
import jax, jax.numpy as jnp
import quantization_tpu as qt
from quantization_tpu.utils.compile_cache import enable_compilation_cache
enable_compilation_cache()

# Reproduce bench_10m's realistic generator at small scale
D, N, Q, K, CL = 768, 200_000, 256, 10, 1024
host_rng = np.random.default_rng(7)
base_key = jax.random.key(42)
spectrum = jnp.asarray(((1.0 + np.arange(D)) ** -0.7).astype(np.float32))
rot = jnp.asarray(np.linalg.qr(host_rng.standard_normal((D, D)))[0].astype(np.float32))
centers = jnp.asarray(host_rng.standard_normal((CL, D)).astype(np.float32)) * spectrum[None, :]

def _lat_rows(ids):
    def row(i):
        k1, k2, k3 = jax.random.split(jax.random.fold_in(base_key, i), 3)
        assign = jax.random.randint(k1, (), 0, CL)
        noise = jax.random.normal(k2, (D,), jnp.float32) * 0.5 * spectrum
        radial = jnp.exp(0.25 * jax.random.normal(k3, (), jnp.float32))
        return (centers[assign] + noise) * radial
    return jax.vmap(row)(ids) @ rot

def gen_rows(ids):
    x = _lat_rows(jnp.asarray(ids, jnp.int32))
    return x / jnp.linalg.norm(x, axis=1, keepdims=True)

data = np.asarray(jax.jit(gen_rows)(np.arange(N)))
queries = np.asarray(jax.jit(gen_rows)(N + np.arange(Q)))
gt_scores = queries @ data.T
gt = np.argsort(-gt_scores, axis=1)[:, :K]

params = qt.VectorParameters(D, N, qt.DistanceType.DOT, False)
pq = qt.ProductQuantizer.encode(data, params, chunk_size=8)
eq = pq.encode_query(queries)
s, ids = pq.top_k(eq, K)
ids = np.asarray(ids)
rec = np.mean([len(set(ids[r]) & set(gt[r]))/K for r in range(Q)])
print(f"engine PQ recall@10 @200k realistic: {rec:.3f}", flush=True)

# centroid usage
codes = np.asarray(pq.codes)[:N]
use = [len(np.unique(codes[:, c])) for c in (0, 20, 50, 95)]
print("centroids used (chunks 0/20/50/95):", use, flush=True)

# reconstruction-based score cross-check on a query subset
cent = np.asarray(pq.metadata.centroids)  # [256, D]? check layout
print("centroid table shape:", cent.shape, flush=True)
# reconstruct first 1000 rows from codes via per-chunk centroid slices
division = pq.metadata.division
recon = np.zeros((1000, D), np.float32)
for ci, (a, b) in enumerate(division):
    recon[:, a:b] = cent[codes[:1000, ci], a:b]
err = np.abs(queries[:16] @ recon.T - queries[:16] @ data[:1000].T)
print(f"PQ score err vs f32 (1000 rows): mean {err.mean():.3f} max {err.max():.3f} "
      f"(dim*0.05 bound = {D*0.05:.1f}); GT margin (s1-s10) mean "
      f"{(gt_scores[np.arange(Q), gt[:,0]] - gt_scores[np.arange(Q), gt[:,9]]).mean():.4f}",
      flush=True)
# engine score vs reconstruction score agreement
es = np.asarray(pq.score_batch(eq))[:16, :1000]
rs = queries[:16] @ recon.T
print(f"engine-vs-recon max diff: {np.abs(es - rs).max():.4f}", flush=True)

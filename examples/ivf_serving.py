"""IVF serving demo: probe-limited coarse search + original-vector rescore.

Round-3 measurements on one v5e chip (BASELINE.md "IVF probe-limited
serving") put this configuration past every full-scan config at 10M x
768: 2s IVF-SQ->f32 = 22-24k qps at recall@10 0.975-0.979 (vs 15.7k for
the full-scan two-stage), and 146 us/query in the small-batch latency
regime where a full scan is stuck at 403 (its corpus stream cannot
shrink with the batch).

Build from public parts (clustered corpus so probing has structure to
find — IVF on uniform noise degenerates to a full scan):

    IVFIndex.encode(data, params, quantizer="sq", nlist=..., bucket_size=...)
    TwoStageIndex(ivf, ExactRescorer(data, ...), oversampling=4)
    index.top_k(index.encode_query(q), 10)

Geometry rules that make probing pay (all measured, PERF_NOTES /
BASELINE.md): ``bucket_size`` should be well under the average cluster
size (several buckets per cluster; a bucket bigger than its cluster is
mostly padding), and wider buckets scan faster per byte — 2048-row
buckets stream at dense-scan speed — so large corpora want big clusters
AND big buckets. ``nscan`` must cover (distinct clusters in the batch)
x (buckets per cluster), since a query's neighbors spread over its
whole cluster; the scan fraction — IVF's whole advantage — comes from
the corpus having many more clusters than the batch touches.

    python examples/ivf_serving.py [--n 200000] [--nscan 160]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--d", type=int, default=768)
    ap.add_argument("--queries", type=int, default=64)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--clusters", type=int, default=256)
    ap.add_argument("--nlist", type=int, default=256)
    ap.add_argument("--bucket-size", type=int, default=512)
    ap.add_argument("--nprobe", type=int, default=16)
    ap.add_argument("--nscan", type=int, default=160)
    ap.add_argument("--oversampling", type=float, default=8.0)
    args = ap.parse_args()

    import jax

    from quantization_tpu import (
        DistanceType,
        IVFIndex,
        VectorParameters,
    )
    from quantization_tpu.models.pipeline import ExactRescorer, TwoStageIndex
    from quantization_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    n, d, q, k = args.n, args.d, args.queries, args.k
    rng = np.random.default_rng(7)
    centers = rng.standard_normal((args.clusters, d)).astype(np.float32)
    assign = rng.integers(0, args.clusters, n)
    data = centers[assign] + 0.25 * rng.standard_normal((n, d)).astype(
        np.float32
    )
    data /= np.linalg.norm(data, axis=1, keepdims=True)
    qi = rng.integers(0, n, q)
    queries = data[qi] + 0.05 * rng.standard_normal((q, d)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)

    params = VectorParameters(d, n, DistanceType.DOT, False)
    t0 = time.perf_counter()
    ivf = IVFIndex.encode(
        data, params, quantizer="sq", nlist=args.nlist,
        bucket_size=args.bucket_size, nprobe=args.nprobe, nscan=args.nscan,
    )
    fine = ExactRescorer(data, DistanceType.DOT, invert=False)
    index = TwoStageIndex(
        ivf, fine, oversampling=args.oversampling, coarse_method="approx"
    )
    print(f"build: {time.perf_counter() - t0:.1f}s "
          f"({ivf.metadata.nbuckets} buckets x {args.bucket_size})")

    eq = index.encode_query(queries)
    _, ids = index.top_k_device(eq, k)
    ids_np = np.asarray(ids)

    import jax.numpy as jnp

    gt_scores = jnp.asarray(queries) @ jnp.asarray(data).T
    _, gt = jax.lax.top_k(gt_scores, k)
    gt_np = np.asarray(gt)
    recall = np.mean([
        len(set(ids_np[r]) & set(gt_np[r])) / k for r in range(q)
    ])
    scanned = min(args.nscan, ivf.metadata.nbuckets) * args.bucket_size
    print(f"recall@{k} vs exact f32: {recall:.3f} "
          f"(scanned <= {scanned:,} of {n:,} rows/batch)")

    def run():
        return index.top_k_device(eq, k)

    r = run()
    np.asarray(jax.tree_util.tree_leaves(r)[0])
    iters = 20
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            r = run()
        np.asarray(jax.tree_util.tree_leaves(r)[0])
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"serve: {best * 1e3:.2f} ms/batch ({q / best:,.0f} qps, "
          f"Q={q}, N={n:,})")
    assert recall >= 0.85, "probed two-stage should be near-exact here"
    print("OK")


if __name__ == "__main__":
    main()

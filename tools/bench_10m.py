"""10M x 768 serve benchmark with DEVICE-SIDE corpus generation.

The tunnel environment uploads at single-digit MB/s, so streaming 30GB of
f32 host batches (examples/streaming_ingest.py, the real-ingestion demo)
takes hours here. For serve-path benchmarking the corpus content only
needs to be a reproducible clustered distribution — so this harness
generates every batch ON DEVICE (jax.random), encodes SQ+BQ+PQ into
preallocated device buffers, maintains the exact f32 top-K ground truth
incrementally, and then times the serve paths. Nothing big ever crosses
the host<->device link.

    python tools/bench_10m.py --n 10000000 --d 768
"""

from __future__ import annotations

import argparse
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10_000_000)
    ap.add_argument("--d", type=int, default=768)
    ap.add_argument("--batch", type=int, default=250_000)  # must divide --n
    ap.add_argument("--queries", type=int, default=256)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--chunk-size", type=int, default=8)
    ap.add_argument("--clusters", type=int, default=1024)
    ap.add_argument("--sigma", type=float, default=0.5,
                    help="within-cluster noise scale; 0.5 is the "
                    "adversarial regime (noise ~ signal), 0.25 is "
                    "closer to real embedding manifolds")
    ap.add_argument("--normalize", action="store_true",
                    help="L2-normalize vectors (cosine regime — the "
                    "ann-benchmarks angular datasets; BQ sign bits are "
                    "only informative on normalized/centered data)")
    ap.add_argument("--dist", choices=("clustered", "realistic"),
                    default="clustered",
                    help="corpus distribution. 'clustered': isotropic "
                    "gaussian clusters (the adversarial regime for "
                    "sub-byte codes — every direction carries equal "
                    "within-cluster signal). 'realistic': mimics "
                    "SIFT/GloVe-style embedding statistics — power-law "
                    "covariance spectrum ((1+j)^-0.7 per latent dim, so "
                    "variance concentrates in a low effective rank), "
                    "anisotropic clusters drawn in the same spectrum, "
                    "lognormal radial scale (heavy-tailed norms), and a "
                    "fixed dense rotation so no coordinate is axis-"
                    "aligned. Recall numbers on it anchor the engine "
                    "against the adversarial synthetic (VERDICT r2 "
                    "missing #1).")
    ap.add_argument("--only", choices=("all", "sq", "bq", "pq", "none"),
                    default="all",
                    help="bench only one quantizer family (skips the other "
                    "encode passes — for shard-size scaling curves); "
                    "'none' skips every FULL-SCAN leg (GT still streams) "
                    "so --ivf* runs measure only the probe-limited index")
    ap.add_argument("--k-sweep", action="store_true",
                    help="additionally time SQ fused exact at k=64 and "
                    "k=256 (the exact-selection k-scaling bar)")
    ap.add_argument("--opq", action="store_true",
                    help="additionally train + bench OPQ (learned-rotation "
                    "PQ, ops/opq.py) at the same m/chunk-size — search "
                    "cost is identical to plain PQ, only recall changes")
    ap.add_argument("--ivf", action="store_true",
                    help="additionally build + bench the IVF probe-limited "
                    "index (models/ivf.py) over SQ and OPQ codes, with the "
                    "IVF-OPQ -> f32-rescore serving ladder (requires "
                    "--only all or sq: runs after the SQ section)")
    ap.add_argument("--nlist", type=int, default=0,
                    help="IVF cluster count (0 = the repo's measured "
                    "auto_geometry rule: nlist * S ~ N/3; pass e.g. "
                    "4096 to pin the round-3/4 anchor geometry)")
    ap.add_argument("--ivf-bucket", type=int, default=0,
                    help="IVF bucket size S (0 = auto_geometry: the "
                    "widest indexed-kernel tile, 1024 at >= 25k rows)")
    ap.add_argument("--ivf-base", choices=("all", "sq", "bq", "opq", "none"),
                    default="all",
                    help="which NON-residual IVF inner-code legs to run "
                    "(sq+bq+opq = all). 'none' skips them — pair with "
                    "--ivf-residual for a residual-only run; 'bq' or "
                    "'opq' select ONE family for the capacity runs at "
                    "--n >= 50M, where only one family's codes fit in "
                    "HBM at a time (both are 96 B/row at d=768: BQ is "
                    "the throughput-first capacity code, OPQ(+residual) "
                    "the quality-first one)")
    ap.add_argument("--sync-latency", action="store_true",
                    help="additionally report per-call BLOCKED latency "
                    "(block_until_ready every call) next to the chained-"
                    "dispatch number — the Q=1 serving-latency leg, with "
                    "and without the tunnel's dispatch floor")
    ap.add_argument("--ivf-residual", action="store_true",
                    help="additionally build + bench RESIDUAL inner codes "
                    "over the same bucket layout (models/ivf.py "
                    "residual=True — the IVF-PQ/IVFADC recipe): "
                    "residual-calibrated SQ and residual-trained OPQ, "
                    "coarse + ->f32-rescore rows (implies --ivf)")
    args = ap.parse_args()
    args.ivf = args.ivf or args.ivf_residual

    import jax
    import jax.numpy as jnp

    import quantization_tpu as qt
    from quantization_tpu.models.bq import BQMetadata
    from quantization_tpu.models.pq import PQMetadata
    from quantization_tpu.models.sq import SQMetadata
    from quantization_tpu.ops import pq as pq_ops
    from quantization_tpu.ops import sq as sq_ops
    from quantization_tpu.ops.kmeans import kmeans_batched
    from quantization_tpu.ops.pallas.sq_kernel import TILE_N as SQ_TILE
    from quantization_tpu.utils.compile_cache import enable_compilation_cache
    from quantization_tpu.utils.device_store import DeviceAppender

    enable_compilation_cache()

    def hbm_probe(tag):
        """Binary-probe allocable HBM (QTPU_HBM_PROBE=1): the axon backend
        has no memory_stats, so measure the largest free alloc directly.
        block_until_ready is NOT a true barrier over the tunnel (deferred
        allocation: 24 GiB of 'ready' zeros accepted on a 16 GiB chip) —
        a scalar D2H fetch is, so probe with fill + fetch."""
        import os

        if not os.environ.get("QTPU_HBM_PROBE"):
            return
        lo, hi, ok = 0.05, 15.8, 0.0
        while hi - lo > 0.2:
            mid = (lo + hi) / 2
            try:
                x = jnp.full((int(mid * 2**30 // 4),), jnp.float32(1.25))
                float(x[0])  # genuine sync; raises if the alloc failed
                del x
                ok, lo = mid, mid
            except Exception:
                hi = mid
        print(f"[hbm] {tag}: ~{ok:.1f} GiB allocable", flush=True)

    N, D, B, Q, K = args.n, args.d, args.batch, args.queries, args.k
    assert N % B == 0, "--batch must divide --n (fixed-shape device gen)"
    assert D % args.chunk_size == 0
    m = D // args.chunk_size
    nb = -(-N // B)

    # ---- corpus generation, addressable BY GLOBAL ROW ID ----
    # Every row's randomness derives from fold_in(base, id) (counter-based
    # threefry: per-row keys are exactly as cheap vmapped as batch draws),
    # so ANY subset of f32 rows can be re-materialized later from ids
    # alone. That is what makes the two-stage "rescore with ORIGINAL
    # vectors" config (the reference/qdrant serving pattern) measurable at
    # 10M: the 30GB f32 corpus never exists, but the [Q, R] coarse
    # candidates' true rows are regenerated on device in microseconds.
    # (In production the equivalent fetch is a host->device gather of the
    # original vectors — ~126MB at R=160, pipelined over PCIe; this
    # harness measures the device-side scoring cost and models the fetch
    # as non-bottleneck, which a real v5e host's ~10+ GB/s PCIe supports.)
    host_rng = np.random.default_rng(7)
    base_key = jax.random.key(42)
    if args.dist == "realistic":
        # Latent spectrum + fixed rotation (host: D x D is tiny). QR gives
        # an exact orthogonal basis so the spectrum is preserved in the
        # ambient space.
        spectrum = jnp.asarray(
            ((1.0 + np.arange(D)) ** -0.7).astype(np.float32)
        )
        rot = jnp.asarray(
            np.linalg.qr(host_rng.standard_normal((D, D)))[0].astype(
                np.float32
            )
        )
        centers = jnp.asarray(
            host_rng.standard_normal((args.clusters, D)).astype(np.float32)
        ) * spectrum[None, :]

        def _lat_rows(ids):
            def row(i):
                k1, k2, k3 = jax.random.split(
                    jax.random.fold_in(base_key, i), 3
                )
                assign = jax.random.randint(k1, (), 0, args.clusters)
                noise = (
                    jax.random.normal(k2, (D,), jnp.float32)
                    * args.sigma
                    * spectrum
                )
                radial = jnp.exp(0.25 * jax.random.normal(k3, (), jnp.float32))
                return (centers[assign] + noise) * radial

            return jax.vmap(row)(ids) @ rot
    else:
        centers = jnp.asarray(
            host_rng.random((args.clusters, D), np.float32) * 2 - 1
        )

        def _lat_rows(ids):
            def row(i):
                k1, k2 = jax.random.split(jax.random.fold_in(base_key, i))
                assign = jax.random.randint(k1, (), 0, args.clusters)
                noise = jax.random.normal(k2, (D,), jnp.float32) * args.sigma
                return centers[assign] + noise

            return jax.vmap(row)(ids)

    def gen_rows(ids):
        """f32 rows for arbitrary global ids (corpus: 0..N-1; queries use
        ids >= N so they share the distribution, disjoint randomness)."""
        x = _lat_rows(jnp.asarray(ids, jnp.int32))
        if args.normalize:
            x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
        return x

    gen_dev = jax.jit(
        lambda b: gen_rows(b * B + jnp.arange(B, dtype=jnp.int32))
    )
    keys = jnp.arange(nb, dtype=jnp.int32)  # batch index IS the seed now

    # --- pass 0 (device): min/max calibration + PQ training sample ---
    # Running device-side accumulators, ONE host sync at the end: a
    # per-batch float() sync cost ~29s/batch through the tunnel (measured).
    t0 = time.perf_counter()

    @jax.jit
    def minmax_step(key, mn, mx):
        x = gen_dev(key)
        return jnp.minimum(mn, jnp.min(x)), jnp.maximum(mx, jnp.max(x))

    mn_d = jnp.float32(np.inf)
    mx_d = jnp.float32(-np.inf)
    for i in range(nb):
        mn_d, mx_d = minmax_step(keys[i], mn_d, mx_d)
    mn, mx = float(mn_d), float(mx_d)
    sample = np.asarray(gen_dev(keys[0])[:10_000])  # train sample (one batch)
    print(f"pass0 (device calibration): {time.perf_counter()-t0:.0f}s", flush=True)
    hbm_probe("after pass0")

    division = pq_ops.get_vector_division(D, args.chunk_size)
    centroids = None
    if args.only in ("all", "pq"):
        t0 = time.perf_counter()
        sample_chunks = jnp.asarray(pq_ops.chunk_tensor(sample, division))
        cent_chunks = kmeans_batched(sample_chunks, pq_ops.CENTROIDS_COUNT)
        centroids = pq_ops.chunks_to_centroids(
            np.asarray(cent_chunks), division, D
        )
        print(f"PQ k-means ({m} chunks x 256): {time.perf_counter()-t0:.0f}s",
              flush=True)

    # --- pass 1 (device): encode SQ+BQ+PQ + running exact GT ---
    params_dot = qt.VectorParameters(D, N, qt.DistanceType.DOT, False)
    alpha, offset = sq_ops.alpha_offset_from_min_max(mn, mx)
    actual = sq_ops.actual_dim(D)
    lane = sq_ops.lane_dim(D)
    npad = N + (-N) % SQ_TILE
    w = -(-D // 32)
    w8 = w + (-w) % 8
    dp = w8 * 32

    pow2 = jnp.left_shift(jnp.uint32(1), jnp.arange(32, dtype=jnp.uint32))

    # Queries follow the SAME generative process as the corpus (ids >= N:
    # same distribution, randomness disjoint from every corpus row).
    queries = np.asarray(gen_rows(N + np.arange(Q))).astype(np.float32)
    queries_dev = jnp.asarray(queries)

    cents_dev = (
        jnp.asarray(pq_ops.centroids_to_chunks(centroids, division))
        if centroids is not None else None
    )

    # One encode pass per quantizer family, benched then FREED: holding
    # SQ codes (7.9GB) + BQ + PQ (+2GB) simultaneously pushes HBM to
    # ~12.5/15.75GB and the serve calls degrade ~4x (measured: SQ approx
    # 63 ms in the crowded layout vs 15.8 ms isolated — allocator
    # fragmentation at near-capacity). GT is computed in the first pass.
    def quantize_sq(xb):
        return sq_ops.quantize_batch(
            xb, alpha=alpha, offset=offset,
            distance_type=qt.DistanceType.DOT, invert=False, dpad=actual,
            lane=lane,
        )

    def pack_bq(xb):
        bits = (xb > 0).astype(jnp.uint32)
        bits = jnp.pad(bits, ((0, 0), (0, dp - D)))
        return jnp.sum(
            bits.reshape(-1, w8, 32) * pow2[None, None, :], axis=2,
            dtype=jnp.uint32,
        )

    def encode_pq(xb):
        xc = jnp.transpose(xb.reshape(-1, m, args.chunk_size), (1, 0, 2))
        return pq_ops.encode_batch(xc, cents_dev).astype(jnp.uint8)

    best_s = jnp.full((Q, K), -np.inf, jnp.float32)
    best_i = jnp.full((Q, K), -1, jnp.int32)

    @jax.jit
    def gt_update(key, best_s, best_i, base):
        xb = gen_dev(key)
        s = queries_dev @ xb.T
        ii = base + jnp.arange(xb.shape[0], dtype=jnp.int32)
        cs = jnp.concatenate([best_s, s], axis=1)
        ci = jnp.concatenate(
            [best_i, jnp.broadcast_to(ii[None, :], s.shape)], axis=1
        )
        ts, tp = jax.lax.top_k(cs, K)
        return ts, jnp.take_along_axis(ci, tp, axis=1)

    def timeit(fn, iters=10):
        r = fn()
        np.asarray(jax.tree_util.tree_leaves(r)[0])
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn()
        np.asarray(jax.tree_util.tree_leaves(r)[0])
        return (time.perf_counter() - t0) / iters

    def recall(ids, gt):
        ids = np.asarray(ids)
        return float(np.mean([
            len(set(ids[r].tolist()) & set(gt[r].tolist())) / K
            for r in range(Q)
        ]))

    def timeit_sync(fn, iters=10):
        """Per-call BLOCKED latency: drain after every call, so each
        iteration pays the full dispatch + tunnel round-trip. The delta
        vs ``timeit`` (chained dispatch) is the host-side floor a Q=1
        serving loop would see through this tunnel. Drain = D2H fetch:
        block_until_ready is NOT a true barrier over the tunnel."""
        def drain():
            np.asarray(jax.tree_util.tree_leaves(fn())[0])

        drain()
        t0 = time.perf_counter()
        for _ in range(iters):
            drain()
        return (time.perf_counter() - t0) / iters

    def report(name, fn, gt):
        try:
            t = timeit(fn)
            extra = ""
            if args.sync_latency:
                ts = timeit_sync(fn)
                extra = (f"  [sync {ts*1e6/Q:,.0f} us/q, "
                         f"chained {t*1e6/Q:,.0f} us/q]")
            _, ids = fn()
            print(
                f"{name:18s}: {Q/t:10.0f} qps  ({t*1e3:7.2f} ms/batch)  "
                f"recall@{K} vs exact = {recall(ids, gt):.3f}{extra}",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001
            print(f"{name:18s}: FAILED {type(e).__name__}: {e}", flush=True)

    # ---- public serving API (VERDICT r4 #3): the SQ/IVF serving legs
    # below are measured THROUGH PipelinedSearcher — the packaged
    # enqueue-depth/drain-one loop — not a harness-local idiom. Queries
    # are submitted pre-encoded (encoded=True): the tunnel charges ~1 ms
    # of serialized host time per extra dispatch, which would bill the
    # microseconds-cheap encode_query at Q=1 scale.
    from quantization_tpu.serving import PipelinedSearcher

    class GenRescorer:
        """f32 rescoring stage whose "original vectors" are re-
        materialized on device from row ids (``gen_rows``) — the
        harness twin of models.pipeline.ExactRescorer (production
        fetches the rows over PCIe; BASELINE models that fetch as
        non-bottleneck)."""

        def __init__(self):
            @jax.jit
            def _score(eqf, cand):
                rr = cand.shape[1]
                rows = gen_rows(
                    jnp.maximum(cand, 0).reshape(-1)
                ).reshape(Q, rr, D)
                return jnp.einsum("qd,qrd->qr", eqf, rows)

            self._score = _score

        def encode_query(self, q):
            return jnp.asarray(q, jnp.float32)

        def score_candidates(self, eqf, cand):
            return self._score(eqf, cand)

    gen_rescorer = GenRescorer()

    def report_serve(name, index, eq, gt, iters=10, **knobs):
        """`report`, but measured through the public PipelinedSearcher:
        steady-state chained throughput at depth 8 (each submit drains
        the oldest in-flight result), plus the blocking per-call column
        under --sync-latency (searcher.search = the documented
        blocking-wrapper regime)."""
        try:
            # materialize=False: through this tunnel EVERY per-result
            # D2H fetch costs a ~25 ms round trip (measured on a ready
            # 40-byte result — PERF_NOTES "Measurement methodology"),
            # so the loop consumes device-resident results and drains
            # ONE leaf per timing block, like every other leg. On-prem
            # the default materialize=True costs microseconds.
            s = PipelinedSearcher(
                index, k=K, depth=8, materialize=False, **knobs
            )
            s.warmup(eq, encoded=True)
            for _ in range(8):
                s.submit(eq, encoded=True)
            s.sync()  # fill batches complete OUTSIDE the timed window
            t0 = time.perf_counter()
            for _ in range(iters):
                s.submit(eq, encoded=True)
            s.sync()  # window = exactly `iters` searches + one RTT
            t = (time.perf_counter() - t0) / iters
            ids = None
            for _, ids in s.flush():
                pass
            ids = np.asarray(ids)
            extra = ""
            if args.sync_latency:
                # Blocked per-call column: materialize=False hands back
                # lazy device arrays, so force the drain each call.
                def sync_once():
                    np.asarray(s.search(eq, encoded=True)[0][:1])

                sync_once()
                t0 = time.perf_counter()
                for _ in range(iters):
                    sync_once()
                ts = (time.perf_counter() - t0) / iters
                extra = (f"  [sync {ts*1e6/Q:,.0f} us/q, "
                         f"chained {t*1e6/Q:,.0f} us/q]")
            print(
                f"{name:18s}: {Q/t:10.0f} qps  ({t*1e3:7.2f} ms/batch)  "
                f"recall@{K} vs exact = {recall(ids, gt):.3f}{extra}"
                "  [serve-api]",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001
            print(f"{name:18s}: FAILED {type(e).__name__}: {e}", flush=True)

    mult = sq_ops.multiplier_for(qt.DistanceType.DOT, False, alpha)
    want_bq = args.only in ("all", "bq")
    want_pq = args.only in ("all", "pq")
    want_sq = args.only in ("all", "sq")

    # --- pass A: GT (+ BQ + PQ small codes) ---
    bq_planes_t = DeviceAppender((npad, w8), jnp.uint32) if want_bq else None
    pq_codes = DeviceAppender((npad, m), jnp.uint8) if want_pq else None
    bq_enc = jax.jit(lambda k: pack_bq(gen_dev(k)))  # jit ONCE: a fresh
    pq_enc = jax.jit(lambda k: encode_pq(gen_dev(k)))  # jit per loop
    # iteration retraces every batch (~9s/batch through the tunnel)
    t0 = time.perf_counter()
    for i in range(nb):
        best_s, best_i = gt_update(keys[i], best_s, best_i, jnp.int32(i * B))
        if want_bq:
            bq_planes_t.append(bq_enc(keys[i]))
        if want_pq:
            pq_codes.append(pq_enc(keys[i]))
    gt = np.asarray(best_i)  # true drain (block_until_ready isn't)
    print(f"pass A (GT + BQ + PQ encode): {time.perf_counter()-t0:.0f}s", flush=True)
    hbm_probe("after passA")

    bq = eq_bq = None
    if want_bq:
        bq = qt.BinaryQuantizer(
            jnp.transpose(bq_planes_t.finish()), BQMetadata(params_dot)
        )
        eq_bq = bq.encode_query(queries)
        report("BQ fused exact", lambda: bq.top_k_device(eq_bq, K), gt)
        report("BQ fused approx", lambda: bq.top_k_device(eq_bq, K, method="approx"), gt)
    if want_pq:
        pq = qt.ProductQuantizer(
            pq_codes.finish(), PQMetadata(centroids, division, params_dot)
        )
        eq_pq = pq.encode_query(queries)
        report("PQ fused exact", lambda: pq.top_k_device(eq_pq, K), gt)
        report("PQ fused approx", lambda: pq.top_k_device(eq_pq, K, method="approx"), gt)
        del pq, eq_pq  # free ~2GB before the SQ pass

        # --- 4-bit PQ at EQUAL code bytes: 2x chunks of half the width, 16
        # centroids each — 12x fewer one-hot MACs than 8-bit (Quick-ADC) ---
        cs4 = max(1, args.chunk_size // 2)
        division4 = pq_ops.get_vector_division(D, cs4)
        m4 = len(division4)
        sample_chunks4 = jnp.asarray(pq_ops.chunk_tensor(sample, division4))
        cent4 = kmeans_batched(sample_chunks4, pq_ops.CENTROIDS_COUNT4)
        centroids4 = pq_ops.chunks_to_centroids(np.asarray(cent4), division4, D)
        cents4_dev = jnp.asarray(
            pq_ops.centroids_to_chunks(centroids4, division4)
        )

        def encode_pq4(xb):
            xc = jnp.transpose(xb.reshape(-1, m4, cs4), (1, 0, 2))
            return pq_ops.encode_batch(xc, cents4_dev).astype(jnp.uint8)

        pq4_codes = DeviceAppender((npad, m4), jnp.uint8)
        pq4_enc = jax.jit(lambda kk: encode_pq4(gen_dev(kk)))
        for i in range(nb):
            pq4_codes.append(pq4_enc(keys[i]))
        pq4 = qt.ProductQuantizer(
            pq4_codes.finish(),
            PQMetadata(centroids4, division4, params_dot, bits=4),
        )
        eq_pq4 = pq4.encode_query(queries)
        report("PQ4 fused exact", lambda: pq4.top_k_device(eq_pq4, K), gt)
        report(
            "PQ4 fused approx",
            lambda: pq4.top_k_device(eq_pq4, K, method="approx"), gt,
        )
        del pq4, eq_pq4

        if args.opq:
            # OPQ at the same m: identical code bytes and scan cost, the
            # rotation only changes what the codes capture (ops/opq.py).
            from quantization_tpu.ops.opq import train_opq

            t0 = time.perf_counter()
            rot_opq, cents_opq = train_opq(
                sample, division, pq_ops.CENTROIDS_COUNT
            )
            print(f"OPQ train (rotation + {m} chunks x 256): "
                  f"{time.perf_counter()-t0:.0f}s", flush=True)
            cents_opq_dev = jnp.asarray(
                pq_ops.centroids_to_chunks(cents_opq, division)
            )
            rot_opq_dev = jnp.asarray(rot_opq)

            def encode_opq(xb):
                xr = xb @ rot_opq_dev
                xc = jnp.transpose(
                    xr.reshape(-1, m, args.chunk_size), (1, 0, 2)
                )
                return pq_ops.encode_batch(xc, cents_opq_dev).astype(jnp.uint8)

            opq_codes = DeviceAppender((npad, m), jnp.uint8)
            opq_enc = jax.jit(lambda kk: encode_opq(gen_dev(kk)))
            for i in range(nb):
                opq_codes.append(opq_enc(keys[i]))
            opq = qt.ProductQuantizer(
                opq_codes.finish(),
                PQMetadata(cents_opq, division, params_dot, rotation=rot_opq),
            )
            eq_opq = opq.encode_query(queries)
            report("OPQ fused exact", lambda: opq.top_k_device(eq_opq, K), gt)
            report(
                "OPQ fused approx",
                lambda: opq.top_k_device(eq_opq, K, method="approx"), gt,
            )

            # OPQ-coarse -> ORIGINAL-VECTOR rescore: the compressed-index
            # serving config (codes are ~1GB at m=96 vs SQ's 7.7GB; the
            # rescore recovers the recall the 8x compression costs).
            def opq_f32_two_stage(rr):
                @partial(jax.jit, static_argnames=("rr",))
                def rescore(ids, rr):
                    rows = gen_rows(ids.reshape(-1)).reshape(Q, rr, D)
                    fs = jnp.einsum("qd,qrd->qr", queries_dev, rows)
                    ts, tp = jax.lax.top_k(fs, K)
                    return ts, jnp.take_along_axis(ids, tp, axis=1)

                def run():
                    _, ids = opq.top_k_device(eq_opq, rr, method="approx")
                    return rescore(ids, rr)

                return run

            for ov in (4, 16, 64):
                report(f"2s OPQ->f32 ov={ov:g}", opq_f32_two_stage(ov * K), gt)
            del opq, eq_opq

    if not want_sq and not args.ivf:
        return

    if want_sq:
        # --- pass B: SQ codes (7.9GB) ---
        sq_codes = DeviceAppender((npad, lane), jnp.int8)
        sq_voff = DeviceAppender((npad,), jnp.float32)
        sq_enc = jax.jit(lambda k: quantize_sq(gen_dev(k)))
        t0 = time.perf_counter()
        for i in range(nb):
            c, v = sq_enc(keys[i])
            sq_codes.append(c)
            sq_voff.append(v)
        print(f"pass B (SQ encode): {time.perf_counter()-t0:.0f}s "
              f"({N/(time.perf_counter()-t0):,.0f} vec/s)", flush=True)
        sq = qt.ScalarQuantizerU8(
            sq_codes.finish(), sq_voff.finish(),
            SQMetadata(actual, alpha, offset, mult, params_dot),
        )
        eq_sq = sq.encode_query(queries)
        report_serve("SQ fused exact", sq, eq_sq, gt)
        report_serve("SQ fused approx", sq, eq_sq, gt, method="approx")
        import os as _os
        if _os.environ.get("QTPU_BENCH_COMPARE"):
            report("SQ exact [old]", lambda: sq.top_k_device(eq_sq, K), gt)
            report("SQ approx [old]",
                   lambda: sq.top_k_device(eq_sq, K, method="approx"), gt)
        if args.k_sweep:
            # k-scaling of the streaming exact selection (extraction cost is
            # k-independent; only the final merge width grows).
            for kk in (64, 256):
                report(
                    f"SQ fused exact k={kk}",
                    lambda kk=kk: sq.top_k_device(eq_sq, kk), gt,
                )

        # --- two-stage: SQ-approx coarse -> ORIGINAL-VECTOR (f32) rescore ---
        # The reference/qdrant serving pattern: quantized coarse search, then
        # rescore the R survivors with the original f32 vectors (GenRescorer
        # re-materializes the rows from ids; production fetches them over
        # PCIe). Measured through the public TwoStageIndex + PipelinedSearcher
        # path — model methods pass the 7.7GB code arrays as jit ARGUMENTS,
        # never as closure constants (which hang the AOT compiler).
        for ov in (4, 8, 16):
            ts2 = qt.TwoStageIndex(
                sq, gen_rescorer, oversampling=float(ov),
                coarse_method="approx",
            )
            report_serve(
                f"2s SQ->f32 ov={ov:g}", ts2, (eq_sq, queries_dev), gt
            )
        del ts2  # the loop variable pins sq's codes past `del sq` below

        # Oversampling sweep: on noise-dominated clustered data the BQ coarse
        # stage needs a wide candidate pool before rescoring recovers recall
        # (each cluster holds ~N/clusters points the sign bits cannot rank).
        # ov=512 (R=5120) would gather 1.3M rows and score a [Q, R, D] f32
        # intermediate (~4GB) next to the resident codes — out of budget.
        if want_bq:
            for ov in (8.0, 32.0, 128.0):
                two = qt.TwoStageIndex(bq, sq, oversampling=ov)
                eq2 = (eq_bq, eq_sq)
                report(f"two-stage ov={ov:g}", lambda: two.top_k_device(eq2, K), gt)
            # BQ coarse -> f32 rescore: same rescorer, weaker coarse signal.
            from quantization_tpu.ops.pallas.bq_kernel import (
                bq_search_mxu as _bq_search,
            )

            def bq_f32_two_stage(rr):
                # Planes passed as jit ARGUMENTS (not closure constants) for
                # the same reason as the SQ two-stage above.
                @partial(jax.jit, static_argnames=("rr",))
                def run(qplanes, planes, rr):
                    _, ids = _bq_search(
                        qplanes, planes,
                        distance_type=qt.DistanceType.DOT, invert=False,
                        dim=D, n_valid=bq.count, k=rr, mode="approx",
                    )
                    rows = gen_rows(ids.reshape(-1)).reshape(Q, rr, D)
                    fs = jnp.einsum("qd,qrd->qr", queries_dev, rows)
                    ts, tp = jax.lax.top_k(fs, K)
                    return ts, jnp.take_along_axis(ids, tp, axis=1)

                return lambda: run(jnp.asarray(eq_bq.planes), bq.planes, rr)

            for ov in (16, 64):
                report(f"2s BQ->f32 ov={ov:g}", bq_f32_two_stage(ov * K), gt)

    if not args.ivf:
        return

    # --- IVF: probe-limited serving (models/ivf.py, no reference
    # counterpart). Build is fully device-side like everything above:
    # assignment + bucket means + permuted encode all consume gen_rows,
    # only the bucket bookkeeping (argsort of 10M i32) runs on host. ---
    from quantization_tpu.models.ivf import IVFIndex, IVFMetadata
    from quantization_tpu.ops import ivf as ivf_ops

    if want_sq:
        del sq, eq_sq  # rebuilt permuted below; keep HBM headroom

    from quantization_tpu.models.ivf import auto_geometry

    auto_s = auto_geometry(N, args.ivf_residual)[1]
    S = args.ivf_bucket or auto_s
    nlist = args.nlist or max(1, N // (3 * S))
    print(f"IVF geometry: nlist={nlist} S={S}"
          f"{' (auto)' if not (args.nlist and args.ivf_bucket) else ''}",
          flush=True)
    t0 = time.perf_counter()
    smp = np.asarray(gen_dev(keys[0]))[: min(B, 131_072)]
    # Coarse-center training sample: >= IVF_SAMPLE_PER_CENTER rows per
    # center (capped), assembled ON DEVICE from corpus batches — at the
    # capacity geometries (nlist ~ 32k -> ~2M training rows) the sample
    # must not round-trip the tunnel; train_centers' streamed blocked-
    # Lloyd path keeps it device-resident throughout.
    # NB: do not name anything here `centers` — that would rebind the
    # corpus generator's closure variable (gen_rows reads it).
    sample_n = min(
        N, max(nlist, ivf_ops.IVF_SAMPLE_PER_CENTER * nlist),
        ivf_ops.sample_cap(nlist),
    )
    if sample_n <= min(B, 131_072):
        train_smp = smp
    else:
        train_smp = jnp.concatenate(
            [gen_dev(keys[i]) for i in range(-(-sample_n // B))]
        )[:sample_n]
    ivf_centers = ivf_ops.train_centers(train_smp, nlist)
    del train_smp
    cents_dev = jnp.asarray(ivf_centers)
    ccn = jnp.sum(cents_dev * cents_dev, axis=1)
    cblk_a, ccblk_a = ivf_ops._pad_centers(cents_dev, nlist)
    rb_a = B // (-(-B // 16_384))  # row sub-block: bounded score transient
    assert B % rb_a == 0

    @jax.jit
    def assign_batch(key):
        x = gen_dev(key)

        def body(_, bi):
            xb = jax.lax.dynamic_slice_in_dim(x, bi * rb_a, rb_a)
            return None, ivf_ops._assign_blocked(xb, cblk_a, ccblk_a)

        _, parts = jax.lax.scan(
            body, None, jnp.arange(B // rb_a, dtype=jnp.int32)
        )
        return parts.reshape(-1)

    assign = np.concatenate(
        [np.asarray(assign_batch(keys[i])) for i in range(nb)]
    )[:N]
    perm, bucket_ids = ivf_ops.build_buckets(assign, S)
    nbk = bucket_ids.shape[0]
    total_rows = nbk * S
    print(
        f"IVF build: centers+assign+buckets {time.perf_counter()-t0:.0f}s "
        f"({nbk} buckets x {S}, pad {total_rows - N} rows)", flush=True,
    )

    # Bucket means on device, G buckets per fixed-shape call.
    t0 = time.perf_counter()
    G = max(1, 262_144 // S)
    bpad = -(-nbk // G) * G
    perm_pad = np.concatenate(
        [perm, np.zeros(((bpad - nbk) * S,), np.int64)]
    )
    ids_pad = np.concatenate(
        [bucket_ids, np.full((bpad - nbk, S), -1, np.int32)]
    )

    @jax.jit
    def means_block(pids, vids):
        rows = gen_rows(pids).reshape(G, S, D)
        valid = (vids >= 0).astype(jnp.float32)[:, :, None]
        return (rows * valid).sum(axis=1) / jnp.maximum(
            valid.sum(axis=1), 1.0
        )

    means = np.concatenate([
        np.asarray(means_block(
            jnp.asarray(perm_pad[g * G * S : (g + 1) * G * S], jnp.int32),
            jnp.asarray(ids_pad[g * G : (g + 1) * G]),
        ))
        for g in range(bpad // G)
    ])[:nbk]
    print(f"IVF bucket means: {time.perf_counter()-t0:.0f}s", flush=True)
    hbm_probe("after means")

    params_inner = qt.VectorParameters(
        D, total_rows, qt.DistanceType.DOT, False
    )
    rows_pad = -(-total_rows // B) * B
    perm_enc = np.concatenate(
        [perm, np.zeros((rows_pad - total_rows,), np.int64)]
    )

    def encode_permuted(appenders, enc_fn):
        """Stream gen_rows(perm) blocks through enc_fn into appenders,
        trimming the final partial block. ``enc_fn(pids, slot0)`` also
        receives the block's first PERMUTED-SLOT index (traced i32) so
        residual encoders can map each row to its bucket (slot // S)."""
        for i in range(rows_pad // B):
            outs = enc_fn(
                jnp.asarray(perm_enc[i * B : (i + 1) * B], jnp.int32),
                jnp.int32(i * B),
            )
            outs = outs if isinstance(outs, tuple) else (outs,)
            left = min(B, total_rows - i * B)
            for app, o in zip(appenders, outs):
                app.append(o[:, :left] if app._axis == 1 else o[:left])

    # Pad the permuted-corpus axis to the LCM of every family's Pallas tile
    # (sq 512, pq 1024, bq 2048) so NO model __init__ re-pads: at capacity
    # scale a re-pad is a full copy holding 2x the codes live (models/bq.py).
    npad_i = total_rows + (-total_rows) % 2048

    # IVF coarse -> f32 rescore: probe-limited coarse at the family's
    # full-scan recall quality (the coarse errors are quantization noise,
    # not probe misses, once nscan covers the queries' clusters), then
    # the same original-vector rescore as the full-scan two-stage — the
    # serving ladder's qps frontier.
    @partial(jax.jit, static_argnames=("rr",))
    def _rescore_f32(ids, rr):
        rows = gen_rows(
            jnp.maximum(ids, 0).reshape(-1)
        ).reshape(Q, rr, D)
        fs = jnp.einsum("qd,qrd->qr", queries_dev, rows)
        fs = jnp.where(ids >= 0, fs, -jnp.inf)
        ts, tp = jax.lax.top_k(fs, K)
        return ts, jnp.take_along_axis(ids, tp, axis=1)

    def ivf_f32(index, eq, rr, p, u):
        def run():
            _, ids = index.top_k_device(
                eq, rr, method="approx", nprobe=p, nscan=u
            )
            return _rescore_f32(ids, rr)

        return run

    def serve_ivf_rescored(index, rr, u):
        """The rescored IVF ladder as the PRODUCT stack: a ServingPlan
        (pins method/nscan without touching the index) built over the
        gen-backed f32 rescorer, driven by report_serve's
        PipelinedSearcher. nprobe rides the index metadata (64 here)."""
        plan = qt.ServingPlan(
            method="approx", nscan=int(u), oversampling=rr / K
        )
        return plan.build(index, rescorer=gen_rescorer, k=K)

    def ladder(fracs):
        """nscan values at the given scanned-bucket FRACTIONS of nbk,
        rounded to 256-bucket multiples so the 10M anchor geometry
        (nbk=21,587, S=512) reproduces the round-3 absolute ladder
        (256 / 1024 / 2560 / 5120) exactly while the same fractions
        scale to any corpus size (the capacity runs)."""
        return sorted({
            max(64, 256 * max(1, round(f * nbk / 256))) for f in fracs
        })

    if Q <= 32:
        # Latency regime: the batch union narrows with the query mix —
        # thousand-bucket scans are the Q=256 regime's cost, not this
        # one's (BASELINE "Latency regime").
        sq_coarse_ladder = [(64, u) for u in (64, 256, 1024)]
        sq_rescore_ladder = [(40, 64, 256), (40, 64, 1024)]
    else:
        sq_coarse_ladder = [
            (64, u) for u in ladder((0.0119, 0.0475, 0.1186, 0.2372))
        ]
        _fr = ladder((0.0475, 0.1186, 0.2372))
        sq_rescore_ladder = [
            (rr, 64, u) for u in _fr
            for rr in ((40,) if u == _fr[0] else (40, 80))
        ]

    if args.ivf_base in ("all", "sq"):
        # ---- IVF-SQ ----
        t0 = time.perf_counter()
        isq_codes = DeviceAppender((npad_i, lane), jnp.int8)
        isq_voff = DeviceAppender((npad_i,), jnp.float32)
        encode_permuted(
            (isq_codes, isq_voff),
            jax.jit(lambda pids, _s0: quantize_sq(gen_rows(pids))),
        )
        sq_inner = qt.ScalarQuantizerU8(
            isq_codes.finish(), isq_voff.finish(),
            SQMetadata(actual, alpha, offset, mult, params_inner),
        )
        print(f"IVF-SQ permuted encode: {time.perf_counter()-t0:.0f}s",
              flush=True)
        ivf_sq = IVFIndex(
            sq_inner, bucket_ids, means,
            IVFMetadata(nlist=nlist, bucket_size=S, nprobe=64,
                        kind="sq", nbuckets=nbk,
                        vector_parameters=params_dot),
        )
        eq_ivf = ivf_sq.encode_query(queries)
        # Q=256 queries spread over the clusters touch ~Q distinct ones, and
        # each cluster spans ~10k/S buckets — high recall at this batch size
        # needs a union of a few thousand buckets (the latency regime Q<=32
        # probes far narrower; tests cover it).
        for p, u in sq_coarse_ladder:
            report_serve(
                f"IVF-SQ p={p} nscan={u}", ivf_sq, eq_ivf, gt,
                method="approx", nprobe=p, nscan=u,
            )

        for rr, p, u in sq_rescore_ladder:
            report_serve(
                f"2s IVF-SQ->f32 R={rr} p={p} nscan={u}",
                serve_ivf_rescored(ivf_sq, rr, u),
                (eq_ivf, queries_dev), gt,
            )
        del ivf_sq, sq_inner, eq_ivf, isq_codes, isq_voff

    if args.ivf_base in ("all", "bq"):
        # ---- IVF-BQ (+ f32 rescore): 1-bit probed scans. On realistic data
        # the full-scan BQ coarse rescored reaches ~0.98 recall; the IVF scan
        # makes the already-cheap plane stream ~probed-fraction cheap, so
        # this is the candidate ceiling of the qps-at-high-recall frontier.
        # Planes are appended directly in the kernel's [w8, N] plane-major
        # layout (axis=1 commits of cheap per-batch transposes): the
        # full-array transpose this replaces double-buffers the planes —
        # ~10GB of transient at the 100M capacity scale, the difference
        # between fitting and OOM on one chip.
        t0 = time.perf_counter()
        ibq_planes = DeviceAppender((w8, npad_i), jnp.uint32, axis=1)
        encode_permuted(
            (ibq_planes,),
            jax.jit(lambda pids, _s0: pack_bq(gen_rows(pids)).T),
        )
        bq_inner = qt.BinaryQuantizer(
            ibq_planes.finish(), BQMetadata(params_inner)
        )
        print(f"IVF-BQ permuted encode: {time.perf_counter()-t0:.0f}s",
              flush=True)
        hbm_probe("after bq encode")
        ivf_bq = IVFIndex(
            bq_inner, bucket_ids, means,
            IVFMetadata(nlist=nlist, bucket_size=S, nprobe=64,
                        kind="bq", nbuckets=nbk,
                        vector_parameters=params_dot),
        )
        eq_ibq = ivf_bq.encode_query(queries)
        for p, u in [(64, u) for u in ladder((0.0475, 0.1186, 0.2372))]:
            report_serve(
                f"IVF-BQ p={p} nscan={u}", ivf_bq, eq_ibq, gt,
                method="approx", nprobe=p, nscan=u,
            )
        bq_rescore_rows = [
            (rr, 64, u) for u in ladder((0.1186, 0.2372))
            for rr in (160, 320)
        ]
        if N >= 50_000_000:
            # Capacity scale: the 1-bit coarse ceiling compresses with N,
            # so the rescore does most of the work — measure how far
            # deeper R pushes recall (VERDICT r4 #2).
            bq_rescore_rows += [
                (rr, 64, ladder((0.2372,))[0]) for rr in (640, 1280)
            ]
        for rr, p, u in bq_rescore_rows:
            report_serve(
                f"2s IVF-BQ->f32 R={rr} p={p} nscan={u}",
                serve_ivf_rescored(ivf_bq, rr, u),
                (eq_ibq, queries_dev), gt,
            )
        del ivf_bq, bq_inner, eq_ibq, ibq_planes

    import os as _os
    if args.ivf_base in ("all", "opq") and not _os.environ.get(
        "QTPU_RESIDUAL_ONLY"
    ):
        # ---- IVF-OPQ (+ f32 rescore: the compressed serving ladder) ----
        from quantization_tpu.ops.opq import train_opq

        t0 = time.perf_counter()
        rot_i, cents_i = train_opq(sample, division, pq_ops.CENTROIDS_COUNT)
        rot_dev = jnp.asarray(rot_i)
        ci_dev = jnp.asarray(pq_ops.centroids_to_chunks(cents_i, division))

        def enc_opq_rows(pids, _s0):
            xr = gen_rows(pids) @ rot_dev
            xc = jnp.transpose(xr.reshape(-1, m, args.chunk_size), (1, 0, 2))
            # CHUNK-MAJOR commits: [m, N] u8 tiles with no lane padding
            # (row-major [N, 96] lane-pads to 128 B/row — +3.7 GB dead
            # HBM at 100M) and IS the indexed scan's layout.
            return pq_ops.encode_batch(xc, ci_dev).astype(jnp.uint8).T

        iopq_codes = DeviceAppender((m, npad_i), jnp.uint8, axis=1)
        encode_permuted((iopq_codes,), jax.jit(enc_opq_rows))
        opq_inner = qt.ProductQuantizer.from_transposed(
            iopq_codes.finish(),
            PQMetadata(cents_i, division, params_inner, rotation=rot_i),
        )
        print(f"IVF-OPQ train+permuted encode: {time.perf_counter()-t0:.0f}s",
              flush=True)
        ivf_opq = IVFIndex(
            opq_inner, bucket_ids, means,
            IVFMetadata(nlist=nlist, bucket_size=S, nprobe=64,
                        kind="pq", nbuckets=nbk,
                        vector_parameters=params_dot),
        )
        eq_o = ivf_opq.encode_query(queries)
        # Capacity scale: cap the OPQ scan at ~12% — the compact gather's
        # [union, m] copy rides beside 11+ GB of resident codes, and the
        # BQ leg measured coarse saturation by a 12% scan anyway.
        opq_fracs = (
            (0.0475, 0.1186) if N >= 50_000_000
            else (0.0475, 0.1186, 0.2372)
        )
        opq_deep = ladder((0.1186,))[0] if N >= 50_000_000 else \
            ladder((0.2372,))[0]
        for p, u in [(64, u) for u in ladder(opq_fracs)]:
            report(
                f"IVF-OPQ p={p} nscan={u}",
                lambda p=p, u=u: ivf_opq.top_k_device(
                    eq_o, K, method="approx", nprobe=p, nscan=u
                ), gt,
            )

        for rr, p, u in [(80, 64, ladder((0.1186,))[0]),
                         (160, 64, ladder((0.1186,))[0]),
                         (160, 64, opq_deep)] + (
                             [(320, 64, opq_deep), (640, 64, opq_deep)]
                             if N >= 50_000_000 else []):
            report(
                f"2s IVF-OPQ->f32 R={rr} p={p} nscan={u}",
                ivf_f32(ivf_opq, eq_o, rr, p, u), gt,
            )
        del ivf_opq, opq_inner, eq_o, iopq_codes

    if not args.ivf_residual:
        return

    # --- residual inner codes over the SAME bucket layout (the
    # IVF-PQ/IVFADC recipe, models/ivf.py residual=True): the code budget
    # is re-spent on r = v - bucket_mean, whose range is the within-
    # bucket spread rather than the data scale — quantization noise
    # shrinks by that ratio at bit-identical scan cost (the bucket term
    # q.c_b rides the kernels' additive-correction path). ---
    from quantization_tpu.ops.pallas.sq_kernel import CORR_BLK

    if S % CORR_BLK:
        print(f"--ivf-residual needs --ivf-bucket % {CORR_BLK} == 0; skip",
              flush=True)
        return

    # Residual calibration sample: each sample row minus its assigned
    # CLUSTER center (bucket means of a cluster all sit at the cluster
    # mean, so the center is the right residual origin for range
    # estimation without materializing the permuted corpus).
    # Blocked over both axes: [131k, nlist] scores at the capacity
    # geometry (nlist ~ 32k) would be a 17 GB transient.
    smp_assign = ivf_ops.assign_clusters(smp, ivf_centers)
    r_smp = smp - ivf_centers[smp_assign]
    means_enc = np.zeros((-(-rows_pad // S), D), np.float32)
    means_enc[:nbk] = means
    means_enc_dev = jnp.asarray(means_enc)

    if args.ivf_base in ("all", "bq"):
        # ---- residual IVF-BQ (the capacity configuration's residual
        # form): 1-bit SIGNS of r = v - bucket_mean scored asymmetrically
        # against the query's quantized VALUES (models/ivf.py
        # _ResidualQueryBQ), plus the f32 bucket term. Same 96 B/row
        # footprint as plain IVF-BQ — the candidate upgrade for the
        # >=100M capacity leg, where plain sign bits are nearly constant
        # within a bucket and the coarse ceiling compresses with N
        # (BASELINE capacity leg). Runs FIRST so `--ivf-base bq
        # --ivf-residual` measures it without building the SQ/OPQ
        # residual codes (7.7 GB / 960 MB at 100M — they no longer fit
        # beside the planes at capacity scale).
        beta = max(float(np.mean(np.abs(r_smp))), 1e-30)
        t0 = time.perf_counter()
        ibqr_planes = DeviceAppender((w8, npad_i), jnp.uint32, axis=1)

        @jax.jit
        def _pack_bq_res(pids, slot0, mtab):
            x = gen_rows(pids)
            b = (slot0 + jnp.arange(x.shape[0], dtype=jnp.int32)) // S
            return pack_bq(x - mtab[b]).T

        encode_permuted(
            (ibqr_planes,),
            lambda pids, s0: _pack_bq_res(pids, s0, means_enc_dev),
        )
        bqr_inner = qt.BinaryQuantizer(
            ibqr_planes.finish(), BQMetadata(params_inner)
        )
        print(f"IVF-BQ residual encode: {time.perf_counter()-t0:.0f}s "
              f"(beta={beta:.4f})", flush=True)
        ivf_bqr = IVFIndex(
            bqr_inner, bucket_ids, means,
            IVFMetadata(nlist=nlist, bucket_size=S, nprobe=64,
                        kind="bq", nbuckets=nbk,
                        vector_parameters=params_dot, residual=True,
                        residual_scale=beta),
        )
        eq_bqr = ivf_bqr.encode_query(queries)
        for p, u in [(64, u) for u in ladder((0.0475, 0.1186, 0.2372))]:
            report(
                f"IVF-BQr p={p} nscan={u}",
                lambda p=p, u=u: ivf_bqr.top_k_device(
                    eq_bqr, K, method="approx", nprobe=p, nscan=u
                ), gt,
            )
        for rr, p, u in [
            (rr, 64, u)
            for u in ladder((0.1186, 0.2372)) for rr in (160, 320)
        ]:
            report(
                f"2s IVF-BQr->f32 R={rr} p={p} nscan={u}",
                ivf_f32(ivf_bqr, eq_bqr, rr, p, u), gt,
            )
        del ivf_bqr, bqr_inner, eq_bqr, ibqr_planes

    if args.ivf_base == "bq":
        return  # capacity-scale residual run: skip the SQ/OPQ legs

    if args.ivf_base in ("all", "sq"):
        # ---- residual IVF-SQ ----
        # Quantile calibration, not min/max: residuals are concentrated with
        # heavy tails (cluster outliers), so the min/max affine wastes the
        # code range on a handful of extreme elements (measured: only 1.2x
        # finer than the data affine at 1M). A two-sided 0.99 cut clips those
        # tails (codes saturate at 0/127) and spends the 7-bit budget on the
        # bulk of the residual mass — the reference's --quantile option
        # applied where it matters most.
        from quantization_tpu.ops.quantile import find_quantile_interval

        qi = find_quantile_interval(r_smp, N, 0.99)
        mn_r, mx_r = qi if qi is not None else (
            float(r_smp.min()), float(r_smp.max())
        )
        alpha_r, offset_r = sq_ops.alpha_offset_from_min_max(mn_r, mx_r)
        mult_r = sq_ops.multiplier_for(qt.DistanceType.DOT, False, alpha_r)
        print(f"residual SQ affine (q=0.99): alpha {alpha_r:.2e} vs data "
              f"{alpha:.2e} ({alpha/alpha_r:.1f}x finer)", flush=True)

        @jax.jit
        def _quantize_sq_res(pids, slot0, mtab):
            x = gen_rows(pids)
            b = (slot0 + jnp.arange(x.shape[0], dtype=jnp.int32)) // S
            r = x - mtab[b]
            return sq_ops.quantize_batch(
                r, alpha=alpha_r, offset=offset_r,
                distance_type=qt.DistanceType.DOT, invert=False, dpad=actual,
                lane=lane,
            )

        t0 = time.perf_counter()
        isqr_codes = DeviceAppender((npad_i, lane), jnp.int8)
        isqr_voff = DeviceAppender((npad_i,), jnp.float32)
        encode_permuted(
            (isqr_codes, isqr_voff),
            lambda pids, s0: _quantize_sq_res(pids, s0, means_enc_dev),
        )
        sqr_inner = qt.ScalarQuantizerU8(
            isqr_codes.finish(), isqr_voff.finish(),
            SQMetadata(actual, alpha_r, offset_r, mult_r, params_inner),
        )
        print(f"IVF-SQ residual encode: {time.perf_counter()-t0:.0f}s",
              flush=True)
        ivf_sqr = IVFIndex(
            sqr_inner, bucket_ids, means,
            IVFMetadata(nlist=nlist, bucket_size=S, nprobe=64,
                        kind="sq", nbuckets=nbk,
                        vector_parameters=params_dot, residual=True),
        )
        eq_sqr = ivf_sqr.encode_query(queries)
        for p, u in [(64, u) for u in ladder((0.0475, 0.1186, 0.2372))]:
            report(
                f"IVF-SQr p={p} nscan={u}",
                lambda p=p, u=u: ivf_sqr.top_k_device(
                    eq_sqr, K, method="approx", nprobe=p, nscan=u
                ), gt,
            )
        for rr, p, u in [(40, 64, u) for u in ladder((0.1186, 0.2372))]:
            report(
                f"2s IVF-SQr->f32 R={rr} p={p} nscan={u}",
                ivf_f32(ivf_sqr, eq_sqr, rr, p, u), gt,
            )
        del ivf_sqr, sqr_inner, eq_sqr, isqr_codes, isqr_voff


    if args.ivf_base in ("all", "opq"):
        # ---- residual IVF-OPQ (rotation + codebooks trained on residuals) --
        from quantization_tpu.ops.opq import train_opq

        t0 = time.perf_counter()
        rot_r, cents_r = train_opq(
            r_smp[:20_000], division, pq_ops.CENTROIDS_COUNT
        )
        rotr_dev = jnp.asarray(rot_r)
        cr_dev = jnp.asarray(pq_ops.centroids_to_chunks(cents_r, division))

        @jax.jit
        def _enc_opqr_rows(pids, slot0, mtab):
            x = gen_rows(pids)
            b = (slot0 + jnp.arange(x.shape[0], dtype=jnp.int32)) // S
            xr = (x - mtab[b]) @ rotr_dev
            xc = jnp.transpose(xr.reshape(-1, m, args.chunk_size), (1, 0, 2))
            return pq_ops.encode_batch(xc, cr_dev).astype(jnp.uint8).T

        iopqr_codes = DeviceAppender((m, npad_i), jnp.uint8, axis=1)
        encode_permuted(
            (iopqr_codes,),
            lambda pids, s0: _enc_opqr_rows(pids, s0, means_enc_dev),
        )
        opqr_inner = qt.ProductQuantizer.from_transposed(
            iopqr_codes.finish(),
            PQMetadata(cents_r, division, params_inner, rotation=rot_r),
        )
        print(f"IVF-OPQ residual train+encode: {time.perf_counter()-t0:.0f}s",
              flush=True)
        ivf_opqr = IVFIndex(
            opqr_inner, bucket_ids, means,
            IVFMetadata(nlist=nlist, bucket_size=S, nprobe=64,
                        kind="pq", nbuckets=nbk,
                        vector_parameters=params_dot, residual=True),
        )
        eq_or = ivf_opqr.encode_query(queries)
        opqr_fracs = (
            (0.0475, 0.1186) if N >= 50_000_000
            else (0.0475, 0.1186, 0.2372)
        )
        opqr_deep = ladder((0.1186,))[0] if N >= 50_000_000 else \
            ladder((0.2372,))[0]
        for p, u in [(64, u) for u in ladder(opqr_fracs)]:
            report(
                f"IVF-OPQr p={p} nscan={u}",
                lambda p=p, u=u: ivf_opqr.top_k_device(
                    eq_or, K, method="approx", nprobe=p, nscan=u
                ), gt,
            )
        opqr_rescue = [(40, 64, ladder((0.1186,))[0]),
                       (40, 64, opqr_deep),
                       (160, 64, opqr_deep)]
        if N >= 50_000_000:
            # Coarse saturates by the ~5% scan at capacity; measure the
            # rescored rows at BOTH widths — if the candidate pool also
            # saturates, the >=0.9 point serves at the cheap width.
            u_lo = ladder((0.0475,))[0]
            opqr_rescue = [
                (40, 64, u_lo), (160, 64, u_lo), (320, 64, u_lo),
                (160, 64, opqr_deep), (320, 64, opqr_deep),
            ]
        for rr, p, u in opqr_rescue:
            report(
                f"2s IVF-OPQr->f32 R={rr} p={p} nscan={u}",
                ivf_f32(ivf_opqr, eq_or, rr, p, u), gt,
            )
if __name__ == "__main__":
    main()

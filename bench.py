#!/usr/bin/env python
"""Headline benchmark: SQ-u8 batched scoring + top-10 vs the unquantized f32
baseline, 100k x 1024-d (the reference's criterion `encode` bench config,
demos/benches/encode.rs:15-16, with the f32 SIMD baselines of
demos/src/metrics/ replaced by a plain jnp f32 matmul on the MXU).

Both sides use the same blocked two-stage top-k; the quantized side scores
through the production path (Pallas int8 MXU kernel on TPU, XLA elsewhere).

Prints ONE JSON line:
  {"metric": ..., "value": qps, "unit": "queries/s", "vs_baseline": x_f32}
Extended per-stage timings go to stderr.
"""

import json
import sys
import time

import numpy as np

N, D, Q, K = 100_000, 1024, 256, 10


def timeit(fn, iters=20, warmup=3):
    for _ in range(warmup):
        fn()
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from quantization_tpu import DistanceType, ScalarQuantizerU8, VectorParameters
    from quantization_tpu.ops import sq as sq_ops
    from quantization_tpu.ops.dispatch import use_pallas
    from quantization_tpu.ops.topk import topk_exact

    rng = np.random.default_rng(42)
    data = rng.random((N, D), dtype=np.float32) * 2.0 - 1.0
    queries = rng.random((Q, D), dtype=np.float32) * 2.0 - 1.0

    params = VectorParameters(D, N, DistanceType.DOT, False)
    enc = ScalarQuantizerU8.encode(data, params)
    eq = enc.encode_query(queries)
    mult = jnp.float32(enc.metadata.multiplier)

    pallas = use_pallas()
    if pallas:
        from quantization_tpu.ops.pallas.sq_kernel import sq_scores_pallas

        @jax.jit
        def quant_search(qc, qo, c, vo):
            s = sq_scores_pallas(
                qc, qo, c, vo, mult,
                distance_type=DistanceType.DOT, n_valid=N, interpret=False,
            )
            return topk_exact(s, K)
    else:

        @jax.jit
        def quant_search(qc, qo, c, vo):
            s = sq_ops.score_batch_xla(
                qc, qo, c[:N], vo[:N], mult, distance_type=DistanceType.DOT
            )
            return topk_exact(s, K)

    data_dev = jnp.asarray(data)
    queries_dev = jnp.asarray(queries)

    @jax.jit
    def f32_search(q, x):
        return topk_exact(q @ x.T, K)

    def run_quant():
        jax.block_until_ready(
            quant_search(eq.codes, eq.offsets, enc.codes, enc.voffsets)
        )

    def run_f32():
        jax.block_until_ready(f32_search(queries_dev, data_dev))

    t_quant = timeit(run_quant)
    t_f32 = timeit(run_f32)

    qps = Q / t_quant
    qps_f32 = Q / t_f32
    print(
        f"quantized: {t_quant * 1e3:.2f} ms/batch  "
        f"f32: {t_f32 * 1e3:.2f} ms/batch  (Q={Q}, N={N}, D={D}, "
        f"pallas={pallas})",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "sq_u8_dot_top10_qps_100k_x_1024",
                "value": round(qps, 1),
                "unit": "queries/s",
                "vs_baseline": round(qps / qps_f32, 3),
            }
        )
    )


if __name__ == "__main__":
    main()

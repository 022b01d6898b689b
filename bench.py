#!/usr/bin/env python
"""Headline benchmark: SQ-u8 batched scoring + top-10 vs the unquantized f32
baseline, 100k x 1024-d (the reference's criterion `encode` bench config,
demos/benches/encode.rs:15-16, with the f32 SIMD baseline of demos/src/metrics/
replaced by a plain jnp f32 matmul).

Prints ONE JSON line:
  {"metric": ..., "value": qps, "unit": "qps", "vs_baseline": speedup_vs_f32}
"""

import json
import time

import numpy as np


def timeit(fn, iters=10, warmup=3):
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

    N, D, Q, K = 100_000, 1024, 256, 10
    rng = np.random.default_rng(42)
    data = rng.random((N, D), dtype=np.float32) * 2.0 - 1.0
    queries = rng.random((Q, D), dtype=np.float32) * 2.0 - 1.0

    params = VectorParameters(D, N, DistanceType.DOT, False)
    enc = ScalarQuantizerU8.encode(data, params)
    eq = enc.encode_query(queries)

    @jax.jit
    def quantized_topk(qcodes, qoff, codes, voff):
        raw = jax.lax.dot_general(
            qcodes, codes, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        scores = (
            enc.metadata.multiplier * raw.astype(jnp.float32)
            + qoff[:, None]
            + voff[None, :]
        )
        return jax.lax.top_k(scores, K)

    data_dev = jnp.asarray(data)
    queries_dev = jnp.asarray(queries)

    @jax.jit
    def f32_topk(q, x):
        return jax.lax.top_k(q @ x.T, K)

    def run_quant():
        s, i = quantized_topk(eq.codes, eq.offsets, enc.codes, enc.voffsets)
        jax.block_until_ready((s, i))

    def run_f32():
        s, i = f32_topk(queries_dev, data_dev)
        jax.block_until_ready((s, i))

    t_quant = timeit(run_quant)
    t_f32 = timeit(run_f32)

    qps = Q / t_quant
    qps_f32 = Q / t_f32
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

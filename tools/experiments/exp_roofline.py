"""Round 5: decompose the approx/exact fused-scan roofline gap.

VERDICT r4 weak #3: the flagship approx scan measured ~41% of int8 peak
at 100k x 1024 / Q=256 and ~65% of the compute/HBM co-roofline at
10M x 768; the exact path is the headline (bench.py). This experiment
isolates where the non-roofline time goes by running the SAME grid and
block specs with progressively more of the kernel body enabled:

  E0  XLA int8 dot_general -> int32 (no Pallas): the MXU+HBM floor XLA
      itself achieves on the identical operands.
  E1  Pallas matmul only (acc written to a [TQ, SLOT] slice): MXU + DMA
      pipeline under Mosaic, no epilogue/extraction.
  E2  E1 + f32 affine epilogue (mult/qoff/voff adds).
  E3  full approx kernel (extraction + slot combine + merge).
  E4  full exact kernel (class ladder + verified merge).

Timing: 8 independent query batches CHAINED inside one jit (bench.py's
methodology — on slow-tunnel days per-dispatch overhead reaches ~2.5 ms,
swamping sub-ms kernels; the first run of this experiment measured every
variant at ~3 ms for that reason), enqueue-10/drain-one, best of 3.
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 3)[0])

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from quantization_tpu.ops.pallas.sq_kernel import sq_search_pallas
from quantization_tpu.core.types import DistanceType
from quantization_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

Q, N, D, K = 256, 100_352, 1024, 10  # N padded to 2048 already
SLOT = 128
CHAIN = 8  # independent query batches per dispatch (see module docstring)


def timeit(fn, iters=10, best_of=3):
    """Two-point slope (bench.py methodology): cancels the per-pass
    drain round trip (~24 ms through the tunnel), which at sub-ms batch
    times otherwise pollutes the measurement by ~+0.1-0.5 ms/batch."""
    fn()
    np.asarray(jax.tree_util.tree_leaves(fn())[0])[:1]
    legs = []
    for n_it in (iters, 3 * iters):
        best = 1e9
        for _ in range(best_of):
            t0 = time.perf_counter()
            out = None
            for _ in range(n_it):
                out = fn()
            leaf = jax.tree_util.tree_leaves(out)[0]
            np.asarray(leaf[(slice(0, 1),) * leaf.ndim])
            best = min(best, time.perf_counter() - t0)
        legs.append(best)
    return (legs[1] - legs[0]) / (2 * iters) / CHAIN * 1e3




def main():
    rng = np.random.default_rng(0)
    q8 = jnp.asarray(
        rng.integers(0, 127, (CHAIN, Q, D), np.int8), jnp.int8
    )
    codes = jnp.asarray(
        rng.integers(0, 127, (N, D), np.int8), jnp.int8
    )
    qoff = jnp.asarray(rng.random(Q), jnp.float32)
    voff = jnp.asarray(rng.random(N), jnp.float32)
    mult = jnp.float32(1e-4)

    tile_q, tile_n = 256, 2048
    nt = N // tile_n
    gops = 2 * Q * N * D / 1e9

    # ---- E0: XLA dot_general (score matrix materialized, no select) ----
    @jax.jit
    def e0(q8_, c):
        outs = []
        for b in range(CHAIN):
            acc = jax.lax.dot_general(
                q8_[b], c, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            outs.append(jnp.max(acc, axis=1)[:1])  # tiny drain
        return jnp.stack(outs)

    t = timeit(lambda: e0(q8, codes))
    print(f"E0 XLA int8 matmul+rowmax : {t:7.3f} ms  "
          f"({gops / t:6.0f} GOP/ms -> {gops/t:4.0f} TOPS)")

    # ---- E1: Pallas matmul only ----
    def k1(q_ref, c_ref, out_ref):
        acc = jax.lax.dot_general(
            q_ref[:], c_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        out_ref[:] = acc[:, :SLOT].astype(jnp.float32)

    def e1(qc, c):
        return pl.pallas_call(
            k1,
            grid=(1, nt),
            in_specs=[
                pl.BlockSpec((tile_q, D), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_n, D), lambda i, j: (j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile_q, SLOT), lambda i, j: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Q, SLOT), jnp.float32),
        )(qc, c)

    @jax.jit
    def e1j(q8_, c):
        return jnp.stack([e1(q8_[b], c)[:1, :1] for b in range(CHAIN)])

    t1 = timeit(lambda: e1j(q8, codes))
    print(f"E1 pallas matmul only     : {t1:7.3f} ms  ({gops/t1:4.0f} TOPS)")

    # ---- E2: + affine epilogue ----
    def k2(q_ref, c_ref, qo_ref, vo_ref, out_ref):
        acc = jax.lax.dot_general(
            q_ref[:], c_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        s = 1e-4 * acc.astype(jnp.float32) + qo_ref[:] + vo_ref[:]
        out_ref[:] = s[:, :SLOT]

    def e2(qc, c, qo, vo):
        return pl.pallas_call(
            k2,
            grid=(1, nt),
            in_specs=[
                pl.BlockSpec((tile_q, D), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_n, D), lambda i, j: (j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_q, 1), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_n), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile_q, SLOT), lambda i, j: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Q, SLOT), jnp.float32),
        )(qc, c, qo, vo)

    @jax.jit
    def e2j(q8_, c, qo, vo):
        return jnp.stack(
            [e2(q8_[b], c, qo, vo)[:1, :1] for b in range(CHAIN)]
        )

    t2 = timeit(lambda: e2j(q8, codes, qoff.reshape(-1, 1),
                            voff.reshape(1, -1)))
    print(f"E2 + affine epilogue      : {t2:7.3f} ms  ({gops/t2:4.0f} TOPS)")

    # ---- E3/E4: the product kernels ----
    for mode, tag in (("approx", "E3 full approx"), ("exact", "E4 full exact")):
        def one(qc, qo, c, vo, mode=mode):
            return sq_search_pallas(
                qc, qo, c, vo, mult,
                distance_type=DistanceType.DOT, n_valid=100_000, k=K,
                mode=mode,
            )

        # Return FULL outputs: slicing [:1,:1] in-jit lets XLA narrow
        # the merge chain and once measured an impossible 0.108 ms
        # "full approx" (below the HBM floor). The drain fetches one
        # leaf element either way.
        f = jax.jit(
            lambda q8_, qo, c, vo, one=one: [
                one(q8_[b], qo, c, vo) for b in range(CHAIN)
            ]
        )
        t = timeit(lambda: f(q8, qoff, codes, voff))
        print(f"{tag:26s}: {t:7.3f} ms  ({gops/t:4.0f} TOPS, "
              f"{Q/t*1000:,.0f} qps)")

    hbm_ms = (N * D) / 819e9 * 1e3
    mxu_ms = gops / 394 / 1e3 * 1e3
    print(f"roofline: HBM {hbm_ms:.3f} ms, int8 MXU {mxu_ms:.3f} ms")


if __name__ == "__main__":
    main()

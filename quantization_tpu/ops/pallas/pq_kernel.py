"""Pallas PQ scoring kernel: LUT lookup as one-hot MXU matmuls.

The reference scores PQ with an SSE gather loop over a per-query LUT
(encoded_vectors_pq.rs:405-440). TPUs have no fast vector gather, so the
lookup is re-expressed as compute (SURVEY.md §7, design inversion 5b):

    score[q, n] = sum_m lut[q, m, code[n, m]]
                = sum_m lut_m[TQ, 256] . onehot(code[:, m])[TILE_N, 256]^T

The one-hot matrix is built on the VPU with a compare against an iota and
immediately consumed by the MXU — 256x more FLOPs than a gather, but FLOPs
the MXU has to spare, against near-zero gather throughput.

Layouts (all lane-aligned):
  codes int8[Npad, Mpad]   — chunk codes on lanes, Mpad multiple of 128;
                             padded chunks are code 0 and hit zero LUT rows.
  lut   f32[Qpad, Mpad*256] — flattened chunk-major LUT; chunk m occupies the
                             256-lane slice [m*256, (m+1)*256).
The grid accumulates over chunk blocks of M_BLK=128 into a revisited
[TILE_Q, TILE_N] output block.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils.padding import pad_dim_to, round_up
from ..dispatch import interpret_mode

TILE_N = 256
TILE_Q = 32
M_BLK = 128
K = 256  # centroids per chunk


def _kernel(codes_ref, lut_ref, out_ref):
    """grid (nq, nn, nm); out block revisited across the innermost m axis."""
    mi = pl.program_id(2)

    @pl.when(mi == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    codes = codes_ref[:].astype(jnp.int32) & 0xFF  # [TILE_N, M_BLK] in 0..255
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)

    # Static unroll over the chunk block: Mosaic has no dynamic_slice on
    # register values, and 1-lane dynamic ref loads are unsupported for int8.
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for m_local in range(M_BLK):
        onehot = (codes[:, m_local][:, None] == iota_k).astype(jnp.bfloat16)
        lut_m = lut_ref[:, m_local * K : (m_local + 1) * K]  # [TILE_Q, K]
        # [TILE_Q, TILE_N]: contract over the 256 centroids on the MXU.
        acc = acc + jax.lax.dot_general(
            lut_m.astype(jnp.bfloat16),
            onehot,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    out_ref[:] += acc


@partial(jax.jit, static_argnames=("n_valid", "interpret"))
def pq_scores_pallas(
    lut: jax.Array,  # f32 [Q, m, 256]
    codes: jax.Array,  # int8/uint8 [Npad, Mpad]  (Mpad multiple of M_BLK)
    *,
    n_valid: int,
    interpret: bool = None,
) -> jax.Array:
    """[Q, n_valid] f32 PQ scores via one-hot MXU accumulation."""
    if interpret is None:
        interpret = interpret_mode()
    q, m, k = lut.shape
    assert k == K
    n, mpad = codes.shape
    assert n % TILE_N == 0, f"N={n} must be padded to {TILE_N}"
    assert mpad % M_BLK == 0
    tile_q = min(TILE_Q, round_up(q, 8))
    qp = round_up(q, tile_q)
    # lut -> [Qpad, Mpad*K] with zero entries for chunk padding
    lut_flat = pad_dim_to(pad_dim_to(lut, 1, mpad), 0, qp).reshape(qp, mpad * K)

    grid = (qp // tile_q, n // TILE_N, mpad // M_BLK)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (TILE_N, M_BLK), lambda i, j, l: (j, l), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile_q, M_BLK * K),
                lambda i, j, l: (i, l),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (tile_q, TILE_N), lambda i, j, l: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((qp, n), jnp.float32),
        interpret=interpret,
    )(codes.astype(jnp.int8), lut_flat.astype(jnp.float32))
    return out[:q, :n_valid]

"""Pallas BQ scoring kernel: XOR + popcount over bit-planes on the VPU.

The TPU replacement for impl_xor_popcnt_sse_uint128 (cpp/sse.c:49-70) and its
NEON twin. Codes live as uint32 bit-planes [W8, Npad] with the corpus axis N
on TPU lanes (W8 = plane words rounded up to the 8-sublane tile); queries are
a small [QP, 128] word matrix with queries on sublanes. Each of the W plane
rows XORs a broadcast query-word column against a corpus lane tile — a fully
vectorized [QP, TILE_N] VPU op per word — and ``lax.population_count``
accumulates. The Hamming->metric map (encoded_vectors_binary.rs:242-252) is
the fused epilogue.

Zero-padded plane words are skipped entirely (the loop runs over the true W),
and zero-padded corpus columns are sliced off by the wrapper.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.types import DistanceType
from ...utils.padding import pad_dim_to, round_up
from ..dispatch import interpret_mode

TILE_N = 2048
W_ALIGN = 8  # sublane tile for 32-bit planes
Q_LANES = 128  # query-word matrix lane padding


def _make_kernel(w: int, distance_type: DistanceType, invert: bool, dim: int):
    d = float(dim)
    dot = distance_type == DistanceType.DOT

    def kernel(qp_ref, p_ref, out_ref):
        acc = jnp.zeros(out_ref.shape, jnp.int32)
        for wi in range(w):  # static unroll over true plane words
            x = jnp.bitwise_xor(
                qp_ref[:, wi][:, None], p_ref[wi, :][None, :]
            )
            acc = acc + jax.lax.population_count(x).astype(jnp.int32)
        two_x = acc.astype(jnp.float32) * 2.0
        if dot:
            score = two_x - d if invert else d - two_x
        else:
            score = d - two_x if invert else two_x - d
        out_ref[:] = score

    return kernel


@partial(
    jax.jit,
    static_argnames=("distance_type", "invert", "dim", "n_valid", "interpret"),
)
def bq_scores_pallas(
    qplanes: jax.Array,  # uint32 [Q, W]  (word-major query rows)
    planes: jax.Array,  # uint32 [W8, Npad]
    *,
    distance_type: DistanceType,
    invert: bool,
    dim: int,
    n_valid: int,
    interpret: bool = None,
) -> jax.Array:
    """[Q, n_valid] f32 binary scores; Npad must be a TILE_N multiple."""
    if interpret is None:
        interpret = interpret_mode()
    q, w = qplanes.shape
    w8, n = planes.shape
    assert n % TILE_N == 0, f"N={n} must be padded to {TILE_N}"
    assert w <= w8
    qp = round_up(q, 8)
    qpad = pad_dim_to(pad_dim_to(qplanes, 0, qp), 1, Q_LANES)

    kernel = _make_kernel(w, distance_type, invert, dim)
    out = pl.pallas_call(
        kernel,
        grid=(n // TILE_N,),
        in_specs=[
            pl.BlockSpec((qp, Q_LANES), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w8, TILE_N), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (qp, TILE_N), lambda j: (0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((qp, n), jnp.float32),
        interpret=interpret,
    )(qpad, planes)
    return out[:q, :n_valid]

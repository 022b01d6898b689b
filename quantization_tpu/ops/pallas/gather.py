"""DMA row gather: candidate code rows from HBM without XLA's gather.

Two-stage rescoring reads R candidate rows per query from the code matrix.
XLA lowers that gather to a dynamic-slice loop measured at ~10us/row on v5e
— it dominates the fine stage at scale. This kernel instead issues one
async DMA per candidate for the 8-row aligned group containing it (Mosaic
memref slices must align to the 8-sublane tile), keeps a block of copies in
flight (the DMA engines pipeline them), and selects the wanted row from
each group on the VPU with an 8-way masked sum. Output is a dense [R, D]
tile for the regular MXU rescoring ops.

The reference has no analogue (CPU pointer chasing is free —
get_vector_data at encoded_storage.rs:33); on TPU random row access is a
latency problem the DMA engines solve.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils.padding import round_up
from ..dispatch import interpret_mode

ROWS_PER_STEP = 512
_GRP = 8  # sublane-aligned DMA group
_INFLIGHT = 256  # semaphore window (sflag memory caps at ~512 flags; 256
# measured 1.6x over a 32-deep window at 1M x 768)
_MAX_IDS = 131072  # ids per pallas_call: the prefetched scalar operand
# lives in SMEM (~1MB); 128k ids = 512KB leaves headroom


def _gather_kernel(ids_ref, sel_ref, src_ref, out_ref, scratch, sems):
    """One grid step: ROWS_PER_STEP group DMAs through a rolling window of
    _INFLIGHT outstanding copies, then select rows."""
    g = pl.program_id(0)
    rb = out_ref.shape[0]

    def make(r):
        row0 = (ids_ref[g * rb + r] // _GRP) * _GRP
        return pltpu.make_async_copy(
            src_ref.at[pl.ds(row0, _GRP), :],
            scratch.at[r],
            sems.at[r % _INFLIGHT],
        )

    def pipelined(r, _):
        @pl.when(r >= _INFLIGHT)
        def _():
            make(r - _INFLIGHT).wait()  # free the semaphore slot

        make(r).start()
        return 0

    def drain(r, _):
        make(r).wait()
        return 0

    jax.lax.fori_loop(0, rb, pipelined, 0)
    jax.lax.fori_loop(max(0, rb - _INFLIGHT), rb, drain, 0)

    # Select row (id % 8) from each group: 8-way where-chain on the VPU,
    # kept in the source dtype (int32 temporaries would overflow the
    # scoped-VMEM stack at ROWS_PER_STEP width).
    sel = sel_ref[:]  # i32 [rb, 1]
    out = scratch[:, 0, :]
    for s in range(1, _GRP):
        out = jnp.where(sel == s, scratch[:, s, :], out)
    out_ref[:] = out


@partial(jax.jit, static_argnames=("interpret",))
def gather_rows_pallas(
    src: jax.Array,  # [N, D] int8/uint8, HBM-resident; N a multiple of 8
    ids: jax.Array,  # [R] int32 (values in [0, N))
    *,
    interpret: bool = None,
) -> jax.Array:
    """[R, D] rows of ``src`` at ``ids`` via pipelined group DMAs."""
    if interpret is None:
        interpret = interpret_mode()
    (r,) = ids.shape
    n, d = src.shape
    assert n % _GRP == 0, f"N={n} must be a multiple of {_GRP}"
    if r > _MAX_IDS:
        # The prefetched scalar operand (the id array) lives in SMEM
        # (~1MB): chunk large gathers — e.g. a wide two-stage candidate
        # pool at Q=256, R=1280 is 1.3MB of ids in one call.
        parts = [
            gather_rows_pallas(
                src, jax.lax.dynamic_slice_in_dim(ids, s, _MAX_IDS, 0),
                interpret=interpret,
            )
            for s in range(0, r - r % _MAX_IDS, _MAX_IDS)
        ]
        tail = r % _MAX_IDS
        if tail:
            parts.append(
                gather_rows_pallas(
                    src,
                    jax.lax.dynamic_slice_in_dim(ids, r - tail, tail, 0),
                    interpret=interpret,
                )
            )
        return jnp.concatenate(parts, axis=0)
    # Per-step scoped-VMEM footprint scales with d (group scratch 8*d +
    # the 8-way select temporaries + double-buffered blocks — measured
    # ~34 bytes/row/dim on v5e): cap the step so it stays inside the 16MB
    # stack. d=768 keeps the measured-optimal 512; d=1024 drops to 384.
    fit = (13 * 2**20) // (34 * d) // 8 * 8
    rb = min(ROWS_PER_STEP, max(64, fit), round_up(r, 8))
    rp = round_up(r, rb)
    ids_p = jnp.pad(ids.astype(jnp.int32), (0, rp - r))
    sel = (ids_p % _GRP).astype(jnp.int32).reshape(rp, 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(rp // rb,),
        in_specs=[
            pl.BlockSpec((rb, 1), lambda g, ids: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (rb, d), lambda g, ids: (g, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((rb, _GRP, d), src.dtype),
            pltpu.SemaphoreType.DMA((_INFLIGHT,)),
        ],
    )
    out = pl.pallas_call(
        _gather_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rp, d), src.dtype),
        interpret=interpret,
    )(ids_p, sel, src)
    return out[:r]

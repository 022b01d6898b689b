"""Sharded corpus scoring over a TPU mesh — all three quantizers.

The reference's entire parallelism surface is intra-process rayon threading
(SURVEY.md §2); its scaling axis is corpus size, sharded by the caller. Here
sharding is first-class: the code matrix is sharded over the mesh's ``shard``
axis (the points axis), every chip scores its shard with one quantized
matmul/popcount pass and computes a *local* top-k, and the only collective is
an ``all_gather`` of (k scores, k global indices) per shard followed by a
final merge — scores ride ICI, never the host.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.types import ArgumentsError, DistanceType
from ..models.bq import BinaryQuantizer, EncodedQueryBin
from ..models.pq import EncodedQueryPQ, ProductQuantizer
from ..models.sq import EncodedQueryU8, ScalarQuantizerU8
from ..ops import dispatch

NEG_INF = jnp.float32(-jnp.inf)


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("shard",),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """Build a mesh over the first ``n_devices`` devices.

    Default is a 1-D ``('shard',)`` mesh over all devices. Pass
    ``axis_names=('shard', 'qdp')`` with a ``shape`` to add query data
    parallelism.
    """
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices > len(devices):
        raise ArgumentsError(
            f"requested {n_devices} devices but only {len(devices)} available"
        )
    devices = np.asarray(devices[:n_devices])
    if shape is None:
        shape = (n_devices,) if len(axis_names) == 1 else None
    if shape is None:
        raise ArgumentsError("shape required for multi-axis meshes")
    return Mesh(devices.reshape(tuple(shape)), tuple(axis_names))


def local_topk_merge(
    scores: jax.Array,  # [Q, n_local] this shard's scores
    axis: str,
    k: int,
    count: int,
) -> Tuple[jax.Array, jax.Array]:
    """Shared tail of every sharded scorer: mask shard padding, local top-k,
    all-gather k rows per shard over ICI, merge. Replaces the reference
    caller's point loop + heap (ann_benchmark_data.rs:151-166)."""
    n_local = scores.shape[1]
    n_shards = jax.lax.psum(1, axis)
    shard_idx = jax.lax.axis_index(axis)
    gidx = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) + (
        shard_idx * n_local
    )
    scores = jnp.where(gidx < count, scores, NEG_INF)
    kk = min(k, n_local)
    s, i = jax.lax.top_k(scores, kk)
    gi = jnp.take_along_axis(gidx, i, axis=1)
    s_all = jax.lax.all_gather(s, axis, axis=1, tiled=True)
    gi_all = jax.lax.all_gather(gi, axis, axis=1, tiled=True)
    s_out, pos = jax.lax.top_k(s_all, min(k, s_all.shape[1]))
    gi_out = jnp.take_along_axis(gi_all, pos, axis=1)
    return s_out, gi_out


def _pad_rows(arr: np.ndarray, target: int, fill=0) -> np.ndarray:
    if arr.shape[0] == target:
        return arr
    pad = [(0, target - arr.shape[0])] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(arr, pad, constant_values=fill)


class _ShardedBase:
    """Common construction: re-lay host copies of the quantizer's arrays with
    a NamedSharding over the points axis."""

    def __init__(self, quantizer, mesh: Optional[Mesh], axis: str):
        self.mesh = mesh if mesh is not None else make_mesh()
        self.axis = axis
        self.quantizer = quantizer
        self.count = quantizer.count
        self.n_shards = self.mesh.shape[axis]

    def encode_query(self, queries):
        return self.quantizer.encode_query(queries)

    def _shard_dim(self, n: int, tile: int = 1) -> int:
        """Pad the corpus axis so every shard is a multiple of ``tile``
        (the per-shard Pallas kernels need tile-aligned local slices; the
        padding is masked out by ``count`` in local_topk_merge)."""
        step = self.n_shards * tile
        return n + (-n) % step


class ShardedScalarQuantizer(_ShardedBase):
    """SQ corpus sharded over the mesh: codes int8[N/s, D] per chip."""

    def __init__(
        self,
        quantizer: ScalarQuantizerU8,
        mesh: Optional[Mesh] = None,
        axis: str = "shard",
    ):
        super().__init__(quantizer, mesh, axis)
        from ..ops.pallas.sq_kernel import TILE_N as SQ_TILE

        n_pad = self._shard_dim(self.count, SQ_TILE)
        codes = _pad_rows(np.asarray(quantizer.codes)[: self.count], n_pad)
        voff = _pad_rows(np.asarray(quantizer.voffsets)[: self.count], n_pad)
        self.codes = jax.device_put(
            codes, NamedSharding(self.mesh, P(axis, None))
        )
        self.voffsets = jax.device_put(voff, NamedSharding(self.mesh, P(axis)))

    def top_k(
        self, equery: EncodedQueryU8, k: int, method: str = "exact"
    ) -> Tuple[np.ndarray, np.ndarray]:
        s, i = _sq_sharded_topk(
            equery.codes,
            equery.offsets,
            self.codes,
            self.voffsets,
            jnp.float32(self.quantizer.metadata.multiplier),
            mesh=self.mesh,
            axis=self.axis,
            k=k,
            count=self.count,
            distance_type=self.quantizer.params.distance_type,
        )
        return np.asarray(s), np.asarray(i)


@partial(
    jax.jit,
    static_argnames=("mesh", "axis", "k", "count", "distance_type"),
)
def _sq_sharded_topk(
    qcodes, qoff, codes, voff, multiplier, *, mesh, axis, k, count, distance_type
):
    from ..ops import sq as sq_ops

    def local(qc, qo, c, vo, mult):
        from ..ops.pallas.sq_kernel import TILE_N as SQ_TILE, sq_scores_pallas

        n_local = c.shape[0]
        if (
            dispatch.use_pallas()
            and distance_type != DistanceType.L1
            and n_local % SQ_TILE == 0
        ):
            # Per-shard Pallas MXU kernel; padding rows are masked by
            # `count` in local_topk_merge, so n_valid = n_local here.
            scores = sq_scores_pallas(
                qc, qo, c, vo, mult,
                distance_type=distance_type, n_valid=n_local,
            )
        else:
            if distance_type == DistanceType.L1:
                raw = sq_ops.int_l1(qc, c)
            else:
                raw = sq_ops.int_dot(qc, c)
            scores = (
                mult * raw.astype(jnp.float32) + qo[:, None] + vo[None, :]
            )
        return local_topk_merge(scores, axis, k, count)

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, None), P(None), P(axis, None), P(axis), P()),
        out_specs=(P(None, None), P(None, None)),
        check_vma=False,
    )
    return fn(qcodes, qoff, codes, voff, multiplier)


class ShardedBinaryQuantizer(_ShardedBase):
    """BQ bit-planes sharded over the corpus axis: uint32[W, N/s] per chip."""

    def __init__(
        self,
        quantizer: BinaryQuantizer,
        mesh: Optional[Mesh] = None,
        axis: str = "shard",
    ):
        super().__init__(quantizer, mesh, axis)
        from ..ops.pallas.bq_kernel import MXU_TILE_N

        n_pad = self._shard_dim(self.count, MXU_TILE_N)
        planes = np.asarray(quantizer.planes)[:, : self.count]
        if planes.shape[1] < n_pad:
            planes = np.pad(planes, ((0, 0), (0, n_pad - planes.shape[1])))
        self.planes = jax.device_put(
            planes, NamedSharding(self.mesh, P(None, axis))
        )

    def top_k(
        self, equery: EncodedQueryBin, k: int, method: str = "exact"
    ) -> Tuple[np.ndarray, np.ndarray]:
        p = self.quantizer.params
        s, i = _bq_sharded_topk(
            equery.planes,
            self.planes,
            mesh=self.mesh,
            axis=self.axis,
            k=k,
            count=self.count,
            distance_type=p.distance_type,
            invert=p.invert,
            dim=p.dim,
        )
        return np.asarray(s), np.asarray(i)


@partial(
    jax.jit,
    static_argnames=("mesh", "axis", "k", "count", "distance_type", "invert", "dim"),
)
def _bq_sharded_topk(
    qplanes, planes, *, mesh, axis, k, count, distance_type, invert, dim
):
    from ..ops import bq as bq_ops

    def local(qp, pl_shard):
        from ..ops.pallas.bq_kernel import MXU_TILE_N, bq_scores_mxu

        n_local = pl_shard.shape[1]
        if (
            dispatch.use_pallas()
            and n_local % MXU_TILE_N == 0
            and pl_shard.shape[0] % 8 == 0
        ):
            scores = bq_scores_mxu(
                qp, pl_shard,
                distance_type=distance_type, invert=invert, dim=dim,
                n_valid=n_local,
            )
        else:
            scores = bq_ops.score_batch_xla(
                qp,
                pl_shard,
                distance_type=distance_type,
                invert=invert,
                dim=dim,
            )
        return local_topk_merge(scores, axis, k, count)

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, None), P(None, axis)),
        out_specs=(P(None, None), P(None, None)),
        check_vma=False,
    )
    return fn(qplanes, planes)


class ShardedProductQuantizer(_ShardedBase):
    """PQ codes sharded over the corpus axis: u8[N/s, m] per chip; the LUT is
    replicated (it is per-query, tiny)."""

    def __init__(
        self,
        quantizer: ProductQuantizer,
        mesh: Optional[Mesh] = None,
        axis: str = "shard",
    ):
        super().__init__(quantizer, mesh, axis)
        from ..ops.pallas.pq_kernel import TILE_N as PQ_TILE

        n_pad = self._shard_dim(self.count, PQ_TILE)
        self.num_chunks = quantizer.num_chunks
        # Transposed [Mpad, Npad] scoring layout sharded on the corpus
        # (lane) axis — the same layout the single-chip Pallas kernel uses.
        codes_t = np.asarray(quantizer.codes_t)[:, : self.count]
        if codes_t.shape[1] < n_pad:
            codes_t = np.pad(codes_t, ((0, 0), (0, n_pad - codes_t.shape[1])))
        self.codes_t = jax.device_put(
            codes_t, NamedSharding(self.mesh, P(None, axis))
        )

    def top_k(
        self, equery: EncodedQueryPQ, k: int, method: str = "exact"
    ) -> Tuple[np.ndarray, np.ndarray]:
        s, i = _pq_sharded_topk(
            equery.lut,
            self.codes_t,
            mesh=self.mesh,
            axis=self.axis,
            k=k,
            count=self.count,
            num_chunks=self.num_chunks,
        )
        return np.asarray(s), np.asarray(i)


@partial(jax.jit, static_argnames=("mesh", "axis", "k", "count", "num_chunks"))
def _pq_sharded_topk(lut, codes_t, *, mesh, axis, k, count, num_chunks):
    from ..ops import pq as pq_ops

    def local(lut_rep, codes_t_shard):
        from ..ops.pallas.pq_kernel import (
            M_BLK,
            TILE_N as PQ_TILE,
            pq_scores_pallas,
        )

        n_local = codes_t_shard.shape[1]
        if (
            dispatch.use_pallas()
            and n_local % PQ_TILE == 0
            and codes_t_shard.shape[0] % M_BLK == 0
        ):
            scores = pq_scores_pallas(lut_rep, codes_t_shard, n_valid=n_local)
        else:
            scores = pq_ops.score_lut_xla(
                lut_rep, codes_t_shard.T[:, :num_chunks]
            )
        return local_topk_merge(scores, axis, k, count)

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, None, None), P(None, axis)),
        out_specs=(P(None, None), P(None, None)),
        check_vma=False,
    )
    return fn(lut, codes_t)

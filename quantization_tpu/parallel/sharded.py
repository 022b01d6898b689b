"""Sharded corpus scoring over a TPU mesh.

The reference's entire parallelism surface is intra-process rayon threading
(SURVEY.md §2); its scaling axis is corpus size, sharded by the caller. Here
sharding is first-class: the code matrix is sharded over the mesh's ``shard``
axis (the points axis), every chip scores its shard with one quantized matmul
and computes a *local* top-k, and the only collective is an ``all_gather`` of
(k scores, k global indices) per shard followed by a final merge — scores ride
ICI, never the host.

Queries can additionally be data-parallel over an optional ``qdp`` mesh axis.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.types import ArgumentsError, DistanceType
from ..models.sq import EncodedQueryU8, ScalarQuantizerU8

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


def _pad_rows(arr: np.ndarray, target: int, fill=0) -> np.ndarray:
    if arr.shape[0] == target:
        return arr
    pad = [(0, target - arr.shape[0])] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(arr, pad, constant_values=fill)


@partial(
    jax.jit,
    static_argnames=("mesh", "axis", "k", "count", "distance_type"),
)
def _sq_sharded_topk(
    qcodes: jax.Array,
    qoff: jax.Array,
    codes: jax.Array,
    voff: jax.Array,
    multiplier: jax.Array,
    *,
    mesh: Mesh,
    axis: str,
    k: int,
    count: int,
    distance_type: DistanceType,
) -> Tuple[jax.Array, jax.Array]:
    """Per-shard SQ score + local top-k, then all-gather + merge.

    Replaces the reference's caller-side point loop + heap
    (ann_benchmark_data.rs:151-166) with an on-device two-stage top-k.
    """
    from ..ops import sq as sq_ops

    n_shards = mesh.shape[axis]
    qspec = P(*([None] * qcodes.ndim))

    def local(qc, qo, c, vo, mult):
        n_local = c.shape[0]
        if distance_type == DistanceType.L1:
            raw = sq_ops.int_l1(qc, c)
        else:
            raw = sq_ops.int_dot(qc, c)
        scores = mult * raw.astype(jnp.float32) + qo[:, None] + vo[None, :]
        shard_idx = jax.lax.axis_index(axis)
        base = shard_idx * n_local
        gidx = (
            jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) + base
        )
        # Mask padding rows introduced by shard-evening.
        scores = jnp.where(gidx < count, scores, NEG_INF)
        kk = min(k, n_local)
        s, i = jax.lax.top_k(scores, kk)
        gi = jnp.take_along_axis(gidx, i, axis=1)
        # The only collective: k rows per shard over ICI.
        s_all = jax.lax.all_gather(s, axis, axis=1, tiled=True)
        gi_all = jax.lax.all_gather(gi, axis, axis=1, tiled=True)
        s_out, pos = jax.lax.top_k(s_all, min(k, kk * n_shards))
        gi_out = jnp.take_along_axis(gi_all, pos, axis=1)
        return s_out, gi_out

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(qspec, P(None), P(axis, None), P(axis), P()),
        out_specs=(P(None, None), P(None, None)),
        check_vma=False,
    )
    return fn(qcodes, qoff, codes, voff, multiplier)


class ShardedScalarQuantizer:
    """A ScalarQuantizerU8 whose code matrix lives sharded across a mesh.

    Construction re-lays the quantizer's device arrays with a
    ``NamedSharding`` over the points axis (padding N up to a multiple of the
    shard count; padded rows are masked to -inf during top-k).
    """

    def __init__(
        self,
        quantizer: ScalarQuantizerU8,
        mesh: Optional[Mesh] = None,
        axis: str = "shard",
    ):
        self.mesh = mesh if mesh is not None else make_mesh()
        self.axis = axis
        self.quantizer = quantizer
        n_shards = self.mesh.shape[axis]
        n = quantizer.count
        n_pad = n + (-n) % n_shards
        codes = _pad_rows(np.asarray(quantizer.codes)[:n], n_pad)
        voff = _pad_rows(np.asarray(quantizer.voffsets)[:n], n_pad)
        code_sharding = NamedSharding(self.mesh, P(axis, None))
        off_sharding = NamedSharding(self.mesh, P(axis))
        self.codes = jax.device_put(codes, code_sharding)
        self.voffsets = jax.device_put(voff, off_sharding)
        self.count = n

    def encode_query(self, queries) -> EncodedQueryU8:
        return self.quantizer.encode_query(queries)

    def top_k(self, equery: EncodedQueryU8, k: int) -> Tuple[np.ndarray, np.ndarray]:
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

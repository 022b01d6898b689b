"""ShardedIVF — probe-limited IVF search over a TPU mesh.

Combines the engine's two scaling mechanisms: the corpus is clustered
into buckets (``models/ivf.py``) AND the bucket axis is sharded over the
mesh's ``shard`` axis, so a search scans only the probed fraction of the
rows and each chip scans only its own buckets. This is the >100M-row
serving shape: per-chip HBM holds N/shards rows of codes, per-query work
is the probed fraction of that, and the only collective is one
``all_gather`` of (kk scores, kk global ids) per shard (the same tail as
the full-scan sharded classes, parallel/sharded.py).

Design notes (TPU-first, no reference counterpart — the reference's
parallelism is intra-process rayon threading, SURVEY.md §2):

* **Round-robin bucket placement.** ``build_buckets`` lays buckets out
  cluster-major, so contiguous block sharding would put whole clusters
  on one chip and a query batch aimed at few clusters would stall on one
  shard. Buckets are therefore re-ordered at construction so shard ``s``
  owns original buckets ``{b : b % n_shards == s}`` — every cluster's
  buckets spread across the mesh and the per-shard probe load stays
  balanced for any query mix.
* **Per-shard union quota.** Each shard runs the same rank-fair priority
  (``_bucket_priority`` — replicated math over the replicated bucket
  means) but selects its top ``ceil(nscan / n_shards)`` buckets among
  the buckets IT OWNS. Total scanned width >= nscan, work is exactly
  balanced, and no bucket list crosses the wire. With ``nscan >= the
  bucket count`` every bucket is scanned and the result equals the
  full-scan sharded search.
* **Pad buckets duplicate real buckets.** The bucket count is padded to
  a multiple of the shard count with COPIES of real buckets (real codes,
  real slot ids), so a pad bucket that wins a union slot costs only
  wasted work — the final id-dedupe removes the copies. The dedupe
  margin accounts for the extra copy (``_max_dup + 1``).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.types import ArgumentsError, VectorParameters
from ..models.ivf import (
    NEG,
    IVFIndex,
    _bucket_priority,
    _dedupe_select,
    _scan_buckets_compact,
    _scan_buckets_indexed,
)
from .sharded import make_mesh


@partial(
    jax.jit,
    static_argnames=(
        "mesh", "axis", "kind", "k", "p", "u_loc", "b_loc", "method",
        "dt", "invert", "s", "dim", "use_fused", "kk2", "itile", "rt",
    ),
)
def _ivf_sharded_search(
    q, eq, means, slot_ids, inner, resid=None,
    *, mesh, axis, kind, k, p, u_loc, b_loc, method, dt, invert, s,
    dim, use_fused, kk2, itile=0, rt=0.95,
):
    """One-dispatch sharded IVF search: replicated probe/priority, local
    top-``u_loc`` bucket quota per shard, per-shard scan with the family's
    fused kernel (scalar-prefetch INDEXED when ``itile``, compact gather
    otherwise), one tiled all_gather, replicated dedupe.

    ``resid`` (residual indexes): ``(corr_scale,)`` for SQ or
    ``(corr_scale, rowadd)`` for PQ — the bucket term corr_scale *
    (q . c_b) is computed per shard against the replicated (reordered)
    means and sliced to the shard's own buckets; ``rowadd`` arrives
    already bucket-sharded (one slice per shard inside shard_map)."""
    nq = q.shape[0]

    def local(q, eq, means, sid_loc, inner, resid):
        prio = _bucket_priority(q, means, dt, invert, p)  # [B_pad], repl.
        sidx = jax.lax.axis_index(axis)
        my = jax.lax.dynamic_slice(prio, (sidx * b_loc,), (b_loc,))
        _, union_loc = jax.lax.top_k(my, u_loc)  # LOCAL bucket indices
        my_qc = rowadd_loc = None
        if resid is not None:
            qc = (q @ means.T) * resid[0]  # [Q, B_pad] replicated
            my_qc = jax.lax.dynamic_slice(
                qc, (0, sidx * b_loc), (nq, b_loc)
            )
            if len(resid) > 1:
                rowadd_loc = resid[1]  # this shard's [b_loc*s] slice
        if itile:
            # In-place probed scan over this shard's slice; gloc is a
            # slot position in the LOCAL arrays -> local slot-id map.
            corr_g = None
            if my_qc is not None:
                from ..ops.pallas.sq_kernel import CORR_BLK

                # Local rows are exactly b_loc*s (bucket_size % 512 == 0
                # is enforced at residual encode, so no kernel-pad rows).
                corr_g = jnp.repeat(my_qc, s // CORR_BLK, axis=1)
            sv, loc = _scan_buckets_indexed(
                kind, eq, inner, union_loc, s=s, itile=itile, dt=dt,
                invert=invert, dim=dim, kk2=kk2, method=method,
                corr=corr_g, rowadd=rowadd_loc, rt=rt,
            )
            gids = sid_loc.reshape(-1)
        else:
            sv, loc = _scan_buckets_compact(
                kind, eq, inner, union_loc, nb=b_loc, s=s, dt=dt,
                invert=invert, dim=dim, use_fused=use_fused, kk2=kk2,
                method=method,
                corr=(
                    None if my_qc is None
                    else jnp.take(my_qc, union_loc, axis=1)
                ),
                rowadd=rowadd_loc, rt=rt,
            )
            gids = jnp.take(sid_loc, union_loc, axis=0).reshape(-1)
        out_ids = jnp.where(
            loc >= 0, jnp.take(gids, jnp.maximum(loc, 0)), -1
        )
        sv = jnp.where(loc >= 0, sv, NEG)
        sv_all = jax.lax.all_gather(sv, axis, axis=1, tiled=True)
        ids_all = jax.lax.all_gather(out_ids, axis, axis=1, tiled=True)
        return sv_all, ids_all

    if kind == "sq":
        eq_spec = (P(), P())
        inner_spec = (P(axis, None), P(axis), P())
    elif kind == "bq":
        eq_spec = (P(),)
        inner_spec = (P(None, axis),)
    else:  # pq
        eq_spec = (P(),)
        inner_spec = (P(axis, None),)
    if resid is None:
        resid_spec = None
    elif len(resid) > 1:
        resid_spec = (P(), P(axis))
    else:
        resid_spec = (P(),)

    sv_all, ids_all = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), eq_spec, P(), P(axis, None), inner_spec, resid_spec),
        out_specs=(P(), P()),
        check_vma=False,
    )(q, eq, means, slot_ids, inner, resid)
    return _dedupe_select(sv_all, ids_all, nq, k, sv_all.shape[1])


class ShardedIVF:
    """IVF index with its bucket axis sharded over a device mesh.

    Wraps a built ``IVFIndex``: the inner quantizer's code arrays, the
    slot-id map, and the bucket means are re-laid bucket-round-robin
    under a ``NamedSharding`` (see module docstring). The wrapped index
    is kept for query encoding and save/load — on a real multi-chip mesh
    prefer building once, saving, and ``ShardedIVF.load`` on the serving
    job rather than holding both layouts live.
    """

    def __init__(
        self,
        ivf: IVFIndex,
        mesh: Optional[Mesh] = None,
        axis: str = "shard",
    ):
        self._ivf = ivf
        self.mesh = mesh if mesh is not None else make_mesh()
        self.axis = axis
        self.params = ivf.params
        self.metadata = ivf.metadata
        self.n_shards = int(self.mesh.shape[axis])

        b = ivf.metadata.nbuckets
        s = ivf.metadata.bucket_size
        ns = self.n_shards
        b_loc = -(-b // ns)
        b_pad = b_loc * ns
        self._b_loc = b_loc
        # Shard sh owns NEW positions [sh*b_loc, (sh+1)*b_loc), holding
        # ORIGINAL buckets sh, sh+ns, sh+2*ns, ... (round-robin); pad
        # positions past b wrap to copies of real buckets.
        old = np.concatenate(
            [np.arange(sh, b_pad, ns) for sh in range(ns)]
        ) % b
        self._max_dup = ivf._max_dup + (1 if b_pad > b else 0)

        means = np.asarray(ivf.bucket_means, np.float32)[old]
        slot_ids = np.asarray(ivf._slot_ids_dev).reshape(b, s)[old]
        self._means_dev = jax.device_put(
            means, NamedSharding(self.mesh, P())
        )
        self._slot_ids_dev = jax.device_put(
            slot_ids, NamedSharding(self.mesh, P(axis, None))
        )

        ridx = (old[:, None] * s + np.arange(s)[None, :]).reshape(-1)
        kind = ivf.metadata.kind
        qz = ivf.quantizer
        self._rowadd_dev = None
        if kind == "sq":
            codes = np.asarray(qz.codes)[ridx]
            # Residual indexes: the per-row term is the derived
            # |decoded|^2-or-NEG array, not the inner DOT voffsets
            # (models/ivf.py _init_residual); the multiplier is the
            # per-batch traced scalar and joins the tuple at call time.
            voff = np.asarray(
                ivf._resid_sq if ivf.metadata.residual else qz.voffsets
            )[ridx]
            self._inner = (
                jax.device_put(
                    codes, NamedSharding(self.mesh, P(axis, None))
                ),
                jax.device_put(voff, NamedSharding(self.mesh, P(axis))),
            )
        elif kind == "bq":
            planes = np.asarray(qz.planes)[:, ridx]
            self._inner = (
                jax.device_put(
                    planes, NamedSharding(self.mesh, P(None, axis))
                ),
            )
        else:  # pq
            codes = np.asarray(qz.codes[:, : qz.num_chunks])[ridx]
            self._inner = (
                jax.device_put(
                    codes, NamedSharding(self.mesh, P(axis, None))
                ),
            )
            if ivf.metadata.residual:
                self._rowadd_dev = jax.device_put(
                    np.asarray(ivf._resid_pq)[ridx],
                    NamedSharding(self.mesh, P(axis)),
                )

    # ------------------------------------------------------------- build
    @classmethod
    def encode(
        cls,
        data,
        params: VectorParameters,
        *,
        mesh: Optional[Mesh] = None,
        axis: str = "shard",
        **ivf_kwargs,
    ) -> "ShardedIVF":
        """Build an ``IVFIndex`` (clustering + inner encode) then shard it."""
        return cls(IVFIndex.encode(data, params, **ivf_kwargs), mesh, axis)

    # ------------------------------------------------------------- query
    @property
    def count(self) -> int:
        return self.params.count

    def encode_query(self, queries):
        return self._ivf.encode_query(queries)

    def top_k_device(
        self,
        equery,
        k: int,
        method: str = "exact",
        nprobe: Optional[int] = None,
        nscan: Optional[int] = None,
        scan: str = "auto",
        recall_target: Optional[float] = None,
    ):
        """Probe + per-shard probed-bucket scan + gather-merge, one jitted
        dispatch. ``nscan`` is the GLOBAL scanned-bucket budget; each
        shard scans ``ceil(nscan / n_shards)`` of its own buckets (see
        module docstring for the quota semantics). ``scan`` follows
        ``IVFIndex.top_k_device`` — except PQ, which always scans compact
        here (its indexed kernel needs a second, transposed code layout;
        the PQ scan is MXU-compute-bound, so the copy it saves is a small
        fraction)."""
        q, eq_inner = equery
        meta = self.metadata
        nb = meta.nbuckets
        p = min(int(nprobe or meta.nprobe), nb)
        if p < 1 or nb == 0:
            raise ArgumentsError("empty index or nprobe < 1")
        if nscan is None:
            nscan = meta.nscan
        u = min(int(nscan) if nscan else 4 * p, nb)
        u = max(u, p)
        u_loc = min(-(-u // self.n_shards), self._b_loc)
        kk2 = min(
            max(2 * int(k), int(k) * self._max_dup),
            u_loc * meta.bucket_size,
        )
        from ..models.ivf import DistanceType, _indexed_tile
        from ..ops import dispatch
        from ..ops.pallas.ktile import APPROX_K_MAX, FUSED_K_MAX

        cap = APPROX_K_MAX if method == "approx" else FUSED_K_MAX
        use_fused = bool(
            dispatch.use_pallas()
            and kk2 <= cap
            and not (
                meta.kind == "sq"
                and self.params.distance_type == DistanceType.L1
            )
            # Fused exact PQ extracts from the packed int accumulator,
            # which can't absorb the residual additives (models/ivf.py).
            and not (
                meta.residual and meta.kind == "pq" and method != "approx"
            )
        )
        if scan not in ("auto", "indexed", "compact"):
            raise ArgumentsError(f"unknown scan strategy {scan!r}")
        s = meta.bucket_size
        itile = _indexed_tile(
            meta.kind, s, method, scan,
            dp=(
                self._inner[0].shape[0] * 32
                if meta.kind == "bq" else None
            ),
            allow_pq=False,
        )
        if scan == "compact" or not use_fused:
            itile = 0
        if scan == "indexed" and not itile:
            raise ArgumentsError(
                "scan='indexed' needs the fused kernel path, bucket_size "
                "divisible by the family's kernel tile, and SQ or "
                "(approx) BQ — sharded PQ scans compact"
            )
        eq, _ = self._ivf._family_arrays(eq_inner)
        inner = self._inner
        resid = None
        if meta.kind == "sq":
            mult = (
                eq_inner.mult if meta.residual
                else self._ivf.quantizer._mult_dev
            )
            inner = (*self._inner, mult)
        if meta.residual:
            resid = (
                (self._ivf._corr_scale_dev,)
                if meta.kind == "sq"
                else (self._ivf._corr_scale_dev, self._rowadd_dev)
            )
        return _ivf_sharded_search(
            q, eq, self._means_dev, self._slot_ids_dev, inner, resid,
            mesh=self.mesh, axis=self.axis, kind=meta.kind, k=int(k),
            p=p, u_loc=u_loc, b_loc=self._b_loc, method=method,
            dt=self.params.distance_type, invert=self.params.invert,
            s=s, dim=self.params.dim,
            use_fused=use_fused, kk2=kk2, itile=itile,
            rt=(0.95 if recall_target is None else float(recall_target)),
        )

    def top_k(
        self, equery, k: int, method: str = "exact",
        nprobe: Optional[int] = None, nscan: Optional[int] = None,
        scan: str = "auto", recall_target: Optional[float] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        sv, ids = self.top_k_device(
            equery, k, method=method, nprobe=nprobe, nscan=nscan, scan=scan,
            recall_target=recall_target,
        )
        return np.asarray(sv), np.asarray(ids)

    # ----------------------------------------------------------- storage
    def save(self, data_path, meta_path) -> None:
        """Same four-file format as ``IVFIndex.save`` (the sharding is a
        runtime layout, not a storage property)."""
        self._ivf.save(data_path, meta_path)

    @classmethod
    def load(
        cls, data_path, meta_path, params: VectorParameters,
        mesh: Optional[Mesh] = None, axis: str = "shard",
    ) -> "ShardedIVF":
        return cls(IVFIndex.load(data_path, meta_path, params), mesh, axis)

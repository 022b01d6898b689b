"""Scalar u8 quantizer — the TPU-native EncodedVectorsU8.

Re-design of quantization/src/encoded_vectors_u8.rs. Differences from the
reference are deliberate TPU inversions (see SURVEY.md §7):

  * SoA storage on device — codes int8[N, D_pad] + offsets f32[N] — instead of
    per-row [f32 prefix | u8 codes] (encoded_vectors_u8.rs:78-116). The on-disk
    format keeps the reference's interleaved row layout for drop-in
    save/load compatibility (§3.5).
  * Batch scoring is the primitive: one int8 MXU matmul produces [Q, N]
    scores; the reference scores one (query, point) per call.
  * On-disk rows use the reference's 16-aligned actual_dim
    (encoded_vectors_u8.rs:12,252-259) in both directions: files written
    here pass the reference's exact-size check and vice versa, with
    voffsets computed over the 16-aligned width exactly as the reference
    computes them. In memory, codes are zero-padded further to the 128
    lane width — zero-codes on both operands contribute exactly 0 to both
    integer kernels, so scores are unchanged.

Scoring math (parity with encoded_vectors_u8.rs:145-158,386-453):
    score(q, i)        = multiplier * kernel(Q, V_i) + q.offset + v_offset[i]
    score_internal(i,j)= multiplier * kernel(V_i, V_j) + off_i + off_j - diff
    diff               = actual_dim * offset^2   (negated when invert)
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.interface import (
    DataLike,
    EncodedVectors,
    iter_batches,
    validate_vector_parameters,
)
from ..core.storage import EncodedStorage
from ..core.types import (
    ArgumentsError,
    DistanceType,
    StorageIOError,
    VectorParameters,
    check_stop,
)
from ..ops import dispatch
from ..ops import sq as sq_ops
from ..ops.quantile import (
    QUANTILE_SAMPLE_SIZE,
    find_min_max_batches,
    find_quantile_interval,
    sample_rows,
)


@dataclass
class SQMetadata:
    """Serialized metadata — field names match the reference serde struct
    (encoded_vectors_u8.rs:24-31)."""

    actual_dim: int
    alpha: float
    offset: float
    multiplier: float
    vector_parameters: VectorParameters

    def to_json(self) -> dict:
        return {
            "actual_dim": self.actual_dim,
            "alpha": self.alpha,
            "offset": self.offset,
            "multiplier": self.multiplier,
            "vector_parameters": self.vector_parameters.to_json(),
        }

    @classmethod
    def from_json(cls, obj: dict) -> "SQMetadata":
        return cls(
            actual_dim=int(obj["actual_dim"]),
            alpha=float(obj["alpha"]),
            offset=float(obj["offset"]),
            multiplier=float(obj["multiplier"]),
            vector_parameters=VectorParameters.from_json(obj["vector_parameters"]),
        )


@dataclass
class EncodedQueryU8:
    """Encoded query batch: int8 codes [Q, D_lane] + f32 correction [Q]."""

    codes: jax.Array
    offsets: jax.Array


def _lane_pad(n: int) -> int:
    return n + (-n) % sq_ops.LANE


# Corpus rows per L1 scoring block (see top_k_device): bounds the transient
# score matrix at [Q, 1M] (~1GB at Q=256) regardless of corpus size.
L1_BLOCK_ROWS = 1 << 20

# Gathered candidate rows per rescoring block (see score_candidates):
# 32k x 768 int8 is ~24MB, comfortably inside the VMEM stack budget the
# compiler uses for DMA-gather outputs.
_GATHER_ROWS_BUDGET = 32768


def calibrate_sq(
    batches_fn, params: VectorParameters, quantile, stop_condition, seed: int
):
    """Two-pass SQ calibration (encoded_vectors_u8.rs:57-71): full min/max
    scan, then an optional quantile interval over a <=100k-row sample.
    ``batches_fn`` is a zero-arg callable returning a fresh batch iterator.
    Returns (alpha, offset)."""
    mn, mx = find_min_max_batches(batches_fn())
    alpha, offset = sq_ops.alpha_offset_from_min_max(mn, mx)
    if quantile is not None:
        check_stop(stop_condition)
        sample = sample_rows(batches_fn, params.count, QUANTILE_SAMPLE_SIZE, seed)
        interval = find_quantile_interval(sample, params.count, float(quantile))
        if interval is not None:
            alpha, offset = sq_ops.alpha_offset_from_min_max(*interval)
    return alpha, offset


class ScalarQuantizerU8(EncodedVectors):
    """u8 affine codec with MXU integer scoring."""

    def __init__(
        self,
        codes: jax.Array,
        voffsets: jax.Array,
        metadata: SQMetadata,
    ):
        # codes int8 [Npad, lane_dim]: rows >= count and cols >= actual_dim
        # are zero (zero-padding is score-neutral for both integer kernels);
        # Npad is a multiple of the Pallas tile so the fast path never copies.
        from ..ops.pallas.sq_kernel import TILE_N

        count = metadata.vector_parameters.count
        npad = count + (-count) % TILE_N
        if codes.shape[0] < npad:
            codes = jnp.pad(codes, ((0, npad - codes.shape[0]), (0, 0)))
            voffsets = jnp.pad(voffsets, (0, npad - voffsets.shape[0]))
        self.codes = codes
        self.voffsets = voffsets
        self.metadata = metadata
        # Device-resident multiplier: passing a fresh jnp scalar per call
        # would upload it host->device on every search (~ms on tunneled
        # TPUs).
        self._mult_dev = jnp.float32(metadata.multiplier)
        self.params = metadata.vector_parameters
        self.count = count

    # ------------------------------------------------------------------ train
    @classmethod
    def encode(
        cls,
        data: DataLike,
        params: VectorParameters,
        quantile: Optional[float] = None,
        stop_condition=None,
        batch_size: int = 65536,
        seed: int = 0,
        use_native: bool = False,
        max_threads: int = 1,
    ) -> "ScalarQuantizerU8":
        """Calibrate + encode (reference encode, encoded_vectors_u8.rs:34-140).

        Two passes over ``data`` (which may be a re-iterable batch stream):
        pass 1 scans min/max (+ optional quantile sample), pass 2 quantizes
        batch-by-batch on device with a cancellation check between batches.
        """
        if not callable(data):
            validate_vector_parameters(data, params)
        actual = sq_ops.actual_dim(params.dim)
        if params.count == 0:
            # Early-out with zeroed metadata (encoded_vectors_u8.rs:43-54).
            meta = SQMetadata(actual, 0.0, 0.0, 0.0, params)
            return cls(
                jnp.zeros((0, _lane_pad(actual)), jnp.int8),
                jnp.zeros((0,), jnp.float32),
                meta,
            )

        def batches():
            return iter_batches(data, batch_size)

        alpha, offset = calibrate_sq(batches, params, quantile, stop_condition, seed)

        dt, inv = params.distance_type, params.invert
        native = None
        if use_native:
            from ..native import loader as native_loader

            if native_loader.available():
                native = native_loader
        code_chunks, off_chunks = [], []
        total = 0

        def encode_one(batch):
            if batch.shape[1] != params.dim:
                raise ArgumentsError(
                    f"Vector length {batch.shape[1]} does not match vector "
                    f"parameters dim {params.dim}"
                )
            if native is not None:
                dt_index = [
                    DistanceType.DOT,
                    DistanceType.L1,
                    DistanceType.L2,
                ].index(dt)
                codes_np, voff_np = native.quantize_u8(
                    batch,
                    actual,
                    alpha,
                    offset,
                    sq_ops.pad_code(dt, alpha, offset),
                    dt_index,
                    inv,
                )
                return codes_np.view(np.int8), voff_np
            # Device path: codes STAY on device — only the f32 batch crosses
            # the host->device link; the int8 codes never round-trip back
            # (on tunneled TPUs that round trip dominated 1M-scale encode).
            return sq_ops.quantize_batch(
                jnp.asarray(batch),
                alpha=alpha,
                offset=offset,
                distance_type=dt,
                invert=inv,
                dpad=actual,
                lane=_lane_pad(actual),
            )

        lane = _lane_pad(actual)
        if native is not None and max_threads > 1:
            # Ordered parallel host ingestion — the condvar-ring equivalent
            # (utils/parallel_encode.py).
            from ..utils.parallel_encode import ordered_parallel_map

            for codes_np, voff_np in ordered_parallel_map(
                encode_one, batches(), max_threads, stop_condition
            ):
                code_chunks.append(codes_np)
                off_chunks.append(voff_np)
                total += codes_np.shape[0]
        elif native is not None:
            for batch in batches():
                check_stop(stop_condition)
                codes_np, voff_np = encode_one(batch)
                code_chunks.append(codes_np)
                off_chunks.append(voff_np)
                total += codes_np.shape[0]
        else:
            # Streaming device accumulation into a preallocated buffer —
            # peak HBM is the padded corpus itself, not 2x (list+concat).
            from ..ops.pallas.sq_kernel import TILE_N
            from ..utils.device_store import DeviceAppender

            npad = params.count + (-params.count) % TILE_N
            codes_app = DeviceAppender((npad, lane), jnp.int8)
            voff_app = DeviceAppender((npad,), jnp.float32)
            for batch in batches():
                check_stop(stop_condition)
                codes, voff = encode_one(batch)
                if total + codes.shape[0] > params.count:
                    raise ArgumentsError(
                        f"Vector count exceeds vector parameters count "
                        f"{params.count}"
                    )
                codes_app.append(codes)
                voff_app.append(voff)
                total += codes.shape[0]
        if total != params.count:
            raise ArgumentsError(
                f"Vector count {total} does not match vector parameters count "
                f"{params.count}"
            )

        if native is not None:
            codes_np = np.concatenate(code_chunks, axis=0)
            if lane > actual:
                codes_np = np.pad(codes_np, ((0, 0), (0, lane - actual)))
            codes_all = jnp.asarray(codes_np)
            offs_all = jnp.asarray(np.concatenate(off_chunks))
        else:
            codes_all = codes_app.finish()
            offs_all = voff_app.finish()
        multiplier = sq_ops.multiplier_for(dt, inv, alpha)
        meta = SQMetadata(actual, alpha, offset, multiplier, params)
        return cls(codes_all, offs_all, meta)

    # ------------------------------------------------------------------ query
    def encode_query(self, queries) -> EncodedQueryU8:
        q = np.asarray(queries, dtype=np.float32)
        if q.ndim == 1:
            q = q[None, :]
        if q.shape[1] != self.params.dim:
            raise ArgumentsError(
                f"query dim {q.shape[1]} != corpus dim {self.params.dim}"
            )
        m = self.metadata
        codes, qoff = sq_ops.encode_query_batch(
            jnp.asarray(q),
            alpha=m.alpha,
            offset=m.offset,
            distance_type=self.params.distance_type,
            invert=self.params.invert,
            dpad=m.actual_dim,
            lane=self.codes.shape[1],
        )
        return EncodedQueryU8(codes, qoff)

    # ------------------------------------------------------------------ score
    def score_batch(self, equery: EncodedQueryU8) -> jax.Array:
        # L1 is VPU-bound elementwise work with no matmul structure; measured
        # on v5e the XLA fusion (54ms on 256x100k x 1024-d) beats the
        # hand-tiled Pallas cube (112ms), so L1 stays on the XLA path unless
        # Pallas is forced. DOT/L2 ride the fused int8 MXU kernel (3.9ms).
        l1 = self.params.distance_type == DistanceType.L1
        force = os.environ.get("QTPU_FORCE_PALLAS") == "1"
        if dispatch.use_pallas() and self.count and (not l1 or force):
            from ..ops.pallas.sq_kernel import sq_scores_pallas

            return sq_scores_pallas(
                equery.codes,
                equery.offsets,
                self.codes,
                self.voffsets,
                self._mult_dev,
                distance_type=self.params.distance_type,
                n_valid=self.count,
            )
        return sq_ops.score_batch_xla(
            equery.codes,
            equery.offsets,
            self.codes[: self.count],
            self.voffsets[: self.count],
            self._mult_dev,
            distance_type=self.params.distance_type,
        )

    def top_k_device(
        self, equery: EncodedQueryU8, k: int, method: str = "exact",
        recall_target: Optional[float] = None,
    ):
        """Fused Pallas search on TPU for DOT/L2: int8 MXU scoring with
        in-tile top-k extraction — the [Q, N] score matrix never touches
        HBM. L1 (no matmul structure — it rides the VPU through XLA's
        fusion, see PERF_NOTES "Kernels") blocks the corpus axis instead,
        so its peak HBM is [Q, block] + codes, never [Q, N]. Falls back to
        score-then-select otherwise."""
        from ..ops.pallas.ktile import APPROX_K_MAX, FUSED_K_MAX

        fused_ok = (
            (k <= FUSED_K_MAX) if method == "exact"
            else (k <= APPROX_K_MAX)
        )
        if (
            dispatch.use_pallas()
            and self.count
            and self.params.distance_type != DistanceType.L1
            and fused_ok
        ):
            from ..ops.pallas.sq_kernel import sq_search_pallas

            return sq_search_pallas(
                equery.codes,
                equery.offsets,
                self.codes,
                self.voffsets,
                self._mult_dev,
                distance_type=self.params.distance_type,
                n_valid=self.count,
                k=k,
                mode=method,
                recall_target=(
                    0.95 if recall_target is None else float(recall_target)
                ),
            )
        if self.count > L1_BLOCK_ROWS:
            # Any non-fused search at large N reroutes through the blocked
            # scan: exact at any k with [Q, block] peak memory instead of a
            # silent [Q, N] allocation (10.2 GB at 10M x 256 queries).
            from ..ops.topk import blocked_topk
            from ..utils.fallback import warn_unfused

            if self.params.distance_type != DistanceType.L1:
                # L1 has no fused kernel — blocked is its first-class path.
                warn_unfused("SQ", self.count, k, method)

            def score_block(b0, b1):
                return sq_ops.score_batch_xla(
                    equery.codes,
                    equery.offsets,
                    jax.lax.slice_in_dim(self.codes, b0, b1, axis=0),
                    jax.lax.slice_in_dim(self.voffsets, b0, b1, axis=0),
                    self._mult_dev,
                    distance_type=self.params.distance_type,
                )

            return blocked_topk(
                score_block, self.count, k, method, block_rows=L1_BLOCK_ROWS
            )
        return super().top_k_device(equery, k, method=method)

    def score_points(self, equery: EncodedQueryU8, ids) -> jax.Array:
        ids = jnp.asarray(ids, jnp.int32)
        return sq_ops.score_batch_xla(
            equery.codes,
            equery.offsets,
            jnp.take(self.codes, ids, axis=0),
            jnp.take(self.voffsets, ids, axis=0),
            self._mult_dev,
            distance_type=self.params.distance_type,
        )

    def score_candidates(self, equery: EncodedQueryU8, cand) -> jax.Array:
        cand = jnp.asarray(cand, jnp.int32)
        if dispatch.use_pallas() and self.count:
            # Candidate rows come through the DMA gather kernel: XLA's row
            # gather costs ~10us/row on v5e vs ~2us/row for pipelined DMAs.
            # Wide candidate pools are scored in column blocks so each
            # gathered [Q*RB, D] tile dies before the next one is built —
            # XLA stack-allocates the gather output in VMEM, and one
            # monolithic [Q*R, D] tile blows that budget at R >= ~500.
            q, r = cand.shape
            rb = max(1, _GATHER_ROWS_BUDGET // max(q, 1))
            if r <= rb:
                return self._score_candidates_gathered(equery, cand)
            parts = [
                self._score_candidates_gathered(equery, cand[:, r0 : r0 + rb])
                for r0 in range(0, r, rb)
            ]
            return jnp.concatenate(parts, axis=1)
        return sq_ops.score_candidates_xla(
            equery.codes,
            equery.offsets,
            self.codes,
            self.voffsets,
            cand,
            self._mult_dev,
            distance_type=self.params.distance_type,
        )

    def _score_candidates_gathered(self, equery, cand) -> jax.Array:
        from ..ops.pallas.gather import gather_rows_pallas

        q, r = cand.shape
        flat = cand.reshape(-1)
        g = gather_rows_pallas(self.codes, flat).reshape(q, r, -1)
        goff = jnp.take(self.voffsets, flat).reshape(q, r)
        return sq_ops._score_gathered(
            equery.codes,
            equery.offsets,
            g,
            goff,
            self._mult_dev,
            distance_type=self.params.distance_type,
        )

    def _internal_diff(self) -> float:
        m = self.metadata
        diff = m.actual_dim * m.offset * m.offset
        return -diff if self.params.invert else diff

    def score_internal_batch(self, ids_a, ids_b) -> jax.Array:
        ids_a = jnp.asarray(ids_a, jnp.int32)
        ids_b = jnp.asarray(ids_b, jnp.int32)
        return sq_ops.score_internal_batch_xla(
            jnp.take(self.codes, ids_a, axis=0),
            jnp.take(self.voffsets, ids_a, axis=0),
            jnp.take(self.codes, ids_b, axis=0),
            jnp.take(self.voffsets, ids_b, axis=0),
            self._mult_dev,
            self._internal_diff(),
            distance_type=self.params.distance_type,
        )

    # ------------------------------------------------------------- checkpoint
    def get_quantized_vector_size(self) -> int:
        """Bytes per stored row in the on-disk format
        (encoded_vectors_u8.rs:252-255)."""
        return self.metadata.actual_dim + 4

    def save(self, data_path, meta_path) -> None:
        """Two-file save: JSON metadata + raw blob with the reference's
        interleaved [f32 offset | u8 codes] rows (§3.5)."""
        meta_dir = os.path.dirname(os.fspath(meta_path))
        if meta_dir:
            os.makedirs(meta_dir, exist_ok=True)
        with open(meta_path, "w") as f:
            json.dump(self.metadata.to_json(), f)

        m = self.metadata
        n = self.count
        codes_np = np.asarray(self.codes)[:n, : m.actual_dim]
        voff_np = np.asarray(self.voffsets, dtype=np.float32)[:n]
        rows = np.zeros((n, m.actual_dim + 4), dtype=np.uint8)
        if n:
            rows[:, :4] = voff_np.view(np.uint8).reshape(n, 4)
            rows[:, 4:] = codes_np.view(np.uint8)
        EncodedStorage(rows).save_to_file(data_path)

    @classmethod
    def load(
        cls, data_path, meta_path, params: VectorParameters
    ) -> "ScalarQuantizerU8":
        """Load; metadata is authoritative for semantics, ``params`` for sizing
        (the reference's asymmetry, §3.5)."""
        try:
            with open(meta_path) as f:
                meta = SQMetadata.from_json(json.load(f))
        except (OSError, json.JSONDecodeError, KeyError) as e:
            raise StorageIOError(f"cannot read metadata {meta_path}: {e}") from e
        row_size = meta.actual_dim + 4
        storage = EncodedStorage.from_file(data_path, row_size, params.count)
        rows = storage.data
        n = params.count
        if n:
            voff = rows[:, :4].copy().view(np.float32).reshape(n)
            codes = rows[:, 4:].view(np.int8)
        else:
            voff = np.zeros((0,), np.float32)
            codes = np.zeros((0, meta.actual_dim), np.int8)
        lane = _lane_pad(meta.actual_dim)
        if lane > meta.actual_dim:
            codes = np.pad(codes, ((0, 0), (0, lane - meta.actual_dim)))
        return cls(jnp.asarray(codes), jnp.asarray(voff), meta)


# Reference-parity alias.
EncodedVectorsU8 = ScalarQuantizerU8

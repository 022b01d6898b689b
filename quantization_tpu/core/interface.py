"""The EncodedVectors contract — batched, TPU-first.

Re-design of the reference trait (encoded_vectors.rs:21-35). The reference
exposes point-at-a-time scoring (``score_point(query, i)``) and leaves batching
to the caller; on TPU the batch is the primitive, so the contract here is:

  - ``encode_query(queries)``     — accepts [D] or [Q, D]
  - ``score_batch(equery)``       — full [Q, N] score matrix (one device op)
  - ``score_points(equery, ids)`` — [Q, P] scores against selected points
  - ``score_point(equery, i)``    — scalar parity shim over score_points
  - ``score_internal(i, j)``      — point-vs-point inside the encoded corpus
  - ``top_k(equery, k)``          — fused score + top-k (the serving hot path)
  - ``save/load``                 — two-file checkpoint (JSON meta + raw blob)

Ingestion accepts either a materialized [count, dim] float32 array or a
re-iterable stream of row batches, mirroring the reference's re-cloneable
iterator contract (encoded_vectors_u8.rs:35) for corpora larger than RAM/HBM.
"""

from __future__ import annotations

import abc
from typing import Callable, Iterable, Iterator, Tuple, Union

import numpy as np

from .types import ArgumentsError, VectorParameters

# A dataset is either a [count, dim] array or a zero-arg factory returning an
# iterator of [batch, dim] float32 arrays. The factory form is the analogue of
# the reference's `Iterator + Clone` bound: encode passes over the data more
# than once (calibration pass + encode pass).
DataLike = Union[np.ndarray, Callable[[], Iterable[np.ndarray]]]


def iter_batches(
    data: DataLike, batch_size: int = 65536
) -> Iterator[np.ndarray]:
    """Yield float32 [b, dim] batches from an array or a stream factory."""
    if callable(data):
        for batch in data():
            arr = np.asarray(batch, dtype=np.float32)
            if arr.ndim == 1:
                arr = arr[None, :]
            yield arr
    else:
        arr = np.asarray(data, dtype=np.float32)
        if arr.ndim != 2:
            raise ArgumentsError(f"expected [count, dim] data, got shape {arr.shape}")
        for start in range(0, arr.shape[0], batch_size):
            yield arr[start : start + batch_size]


def validate_vector_parameters(data: DataLike, params: VectorParameters) -> None:
    """Check every batch's dim and the total count
    (reference validate_vector_parameters, encoded_vectors.rs:47-70).

    Called by every quantizer's encode() on materialized arrays, where it is
    O(1) shape checks (the reference guards its encoders with this under
    debug_assert!, encoded_vectors_u8.rs:56 / _pq.rs:64 / _binary.rs:171).
    Stream factories are validated incrementally inside the encode loops
    instead — pre-iterating a stream twice here would double ingestion cost.
    """
    if not callable(data):
        arr = np.asarray(data)
        if arr.ndim != 2 or arr.shape[1] != params.dim:
            got = arr.shape[1] if arr.ndim == 2 else arr.shape
            raise ArgumentsError(
                f"Vector length {got} does not match vector "
                f"parameters dim {params.dim}"
            )
        if arr.shape[0] != params.count:
            raise ArgumentsError(
                f"Vector count {arr.shape[0]} does not match vector "
                f"parameters count {params.count}"
            )
        return
    count = 0
    for batch in iter_batches(data):
        if batch.shape[1] != params.dim:
            raise ArgumentsError(
                f"Vector length {batch.shape[1]} does not match vector "
                f"parameters dim {params.dim}"
            )
        count += batch.shape[0]
    if count != params.count:
        raise ArgumentsError(
            f"Vector count {count} does not match vector parameters count "
            f"{params.count}"
        )


class EncodedVectors(abc.ABC):
    """Base class for all quantizers (SQ / PQ / BQ)."""

    #: filled by subclasses
    params: VectorParameters

    # -- checkpoint ---------------------------------------------------------
    @abc.abstractmethod
    def save(self, data_path, meta_path) -> None:
        ...

    @classmethod
    @abc.abstractmethod
    def load(cls, data_path, meta_path, params: VectorParameters):
        ...

    # -- query path ---------------------------------------------------------
    @abc.abstractmethod
    def encode_query(self, queries):
        """Encode one query [D] or a batch [Q, D] into the quantizer's
        query representation."""

    @abc.abstractmethod
    def score_batch(self, equery) -> "np.ndarray":
        """[Q, N] scores of every encoded query against the whole corpus."""

    @abc.abstractmethod
    def score_points(self, equery, ids) -> "np.ndarray":
        """[Q, P] scores against the selected point ids."""

    def score_candidates(self, equery, cand) -> "np.ndarray":
        """[Q, R] scores where cand[Q, R] holds per-query candidate ids —
        the rescoring primitive of two-stage retrieval."""
        raise NotImplementedError

    def score_point(self, equery, i: int) -> float:
        """Scalar parity shim matching the reference's score_point
        (encoded_vectors.rs:32)."""
        out = np.asarray(self.score_points(equery, np.asarray([i])))
        return float(out.reshape(-1)[0])

    # -- internal scoring ---------------------------------------------------
    @abc.abstractmethod
    def score_internal_batch(self, ids_a, ids_b) -> "np.ndarray":
        """[P] scores between corpus points ids_a[P] and ids_b[P]."""

    def score_internal(self, i: int, j: int) -> float:
        out = np.asarray(
            self.score_internal_batch(np.asarray([i]), np.asarray([j]))
        )
        return float(out.reshape(-1)[0])

    # -- serving ------------------------------------------------------------
    def top_k_device(self, equery, k: int, method: str = "exact"):
        """(scores[Q, k], indices[Q, k]) as device arrays — no host sync.

        The serving-loop primitive: callers that pipeline query batches use
        this so the host<->device round trip is paid once per drain, not
        once per batch. ``top_k`` is the sync-and-convert wrapper.
        """
        import jax.numpy as jnp

        from ..ops.topk import top_k as _topk

        scores = jnp.asarray(self.score_batch(equery))
        return _topk(scores, k, method=method)

    def top_k(
        self, equery, k: int, method: str = "exact", recall_target=None
    ) -> Tuple[np.ndarray, np.ndarray]:
        """(scores[Q, k], indices[Q, k]) of the best-scoring points.

        "Best" always means largest score — callers encode their ranking
        direction via ``invert`` exactly as in the reference contract.
        ``method``: "exact" or "approx" (TPU approx_max_k).
        ``recall_target`` (approx only, default 0.95) is the fused search's
        final-merge recall/speed dial — forwarded to ``top_k_device`` only
        when set, so subclasses without the knob keep working.
        """
        if recall_target is None:
            s, i = self.top_k_device(equery, k, method=method)
        else:
            s, i = self.top_k_device(
                equery, k, method=method, recall_target=recall_target
            )
        return np.asarray(s), np.asarray(i)

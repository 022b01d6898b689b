"""Pipelined serving loop — the chained-dispatch pattern as product API.

The reference's product surface is point-at-a-time scoring
(`/root/reference/quantization/src/encoded_vectors.rs:32`: the caller
loops `score_point` per candidate). The TPU equivalent of that serving
contract is NOT a blocking per-call wrapper: every quantizer here
already exposes `top_k_device` (async dispatch, device-resident
results), and the throughput/latency the engine is capable of is only
realized when the device stream stays deep — N independent searches
enqueued, results drained as they complete.

**The blocking-wrapper trap (measured, PERF_NOTES "Measurement
methodology"):** calling `index.top_k(eq, k)` per query makes two
host<->device round trips per call. Through a remote-tunnel attachment
that measured **53 ms/query** for a search whose device time is
**2.4 ms** (10M x 768 IVF, Q=1) — a 20x penalty paid entirely in
dispatch serialization, not compute. Even on a local host, per-call
blocking inserts a full dispatch+sync bubble between searches.
:class:`PipelinedSearcher` owns the fix: keep ``depth`` searches in
flight, return results one behind, and the per-query cost approaches
the device time (measured 2.66 ms/query at 10M with depth=8 — see
BASELINE "Q=1 latency leg").

Works over anything with ``encode_query`` + ``top_k_device``: the
quantizers (SQ/PQ/BQ), ``IVFIndex``, ``TwoStageIndex``, the sharded
engines, and ``ServingPlan.build(...)`` results (``_MethodPinned``).

Usage — request loop (one batch in, one batch out, pipelined)::

    searcher = PipelinedSearcher(index, k=10, depth=8)
    for queries in request_stream:          # each [Q, D] float32
        done = searcher.submit(queries)     # returns an OLDER result
        if done is not None:                #   once the pipe is full
            emit(done)
    for done in searcher.flush():
        emit(done)

or the generator form::

    for scores, ids in searcher.search_stream(request_stream):
        ...

`search(queries)` is the deliberately-blocking one-shot (drains the
whole pipe; per-call latency, not throughput — fine for interactive
use, wrong inside a serving loop).
"""

from __future__ import annotations

from collections import deque
from typing import Iterable, Iterator, Optional, Tuple

import jax
import numpy as np

from .core.types import ArgumentsError

__all__ = ["PipelinedSearcher"]


class PipelinedSearcher:
    """Keep ``depth`` independent searches in flight on the device stream.

    ``index``: any searchable with ``encode_query`` and ``top_k_device``
    (quantizer, IVF index, two-stage pipeline, sharded engine, or a
    built :class:`~quantization_tpu.policy.ServingPlan`). ``knobs`` pass
    through to every ``top_k_device`` call (e.g. ``method="approx"``,
    ``nscan=...`` for IVF) — leave them empty for plan-built objects,
    which pin their own.

    ``depth`` trades result latency for throughput: a submitted batch's
    result returns ``depth`` submissions later (or at ``flush``). 8 is
    the measured knee through a remote tunnel (BASELINE Q=1 leg); local
    hosts saturate shallower. Results are FIFO — submission order.

    ``materialize`` (default True) converts drained results to numpy —
    on a locally-attached TPU that fetch costs microseconds for a
    [Q, k] result. Through a REMOTE tunnel every device->host fetch
    pays a full round trip (~25 ms measured regardless of size, per
    leaf), so tunnel-attached loops that can consume device arrays —
    or feed them to a downstream device stage — should pass
    ``materialize=False`` and convert only what leaves the machine
    (this is how bench_10m/bench.py time the engine rather than the
    tunnel; PERF_NOTES "Measurement methodology").

    Keep the query-batch SHAPE fixed across submissions: each distinct
    [Q, D] shape compiles its own executable on first use (``warmup``
    pre-pays this).
    """

    def __init__(
        self, index, *, k: int = 10, depth: int = 8,
        materialize: bool = True, **knobs,
    ):
        if depth < 1:
            raise ArgumentsError("depth must be >= 1")
        if not hasattr(index, "top_k_device") or not hasattr(
            index, "encode_query"
        ):
            raise ArgumentsError(
                "index must expose encode_query and top_k_device "
                f"(got {type(index).__name__})"
            )
        self._ix = index
        self._k = int(k)
        self._depth = int(depth)
        self._materialize = bool(materialize)
        self._knobs = knobs
        self._pending: deque = deque()

    # ------------------------------------------------------------ core
    @property
    def in_flight(self) -> int:
        return len(self._pending)

    def submit(
        self, queries, *, encoded: bool = False
    ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
        """Enqueue one search; return the OLDEST completed result once
        more than ``depth`` are in flight, else None. Never blocks on
        the search just submitted.

        ``encoded=True`` submits a pre-encoded query (the result of
        ``index.encode_query``) — worth it when the same encoded batch
        is re-searched, or through a remote-tunnel attachment where
        every extra dispatch costs ~1 ms of serialized host time (the
        encode itself is microseconds of device work)."""
        eq = queries if encoded else self._ix.encode_query(queries)
        out = self._ix.top_k_device(eq, self._k, **self._knobs)
        self._pending.append(out)
        if len(self._pending) > self._depth:
            return self._drain_one()
        return None

    def flush(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        """Drain every in-flight search, oldest first."""
        while self._pending:
            yield self._drain_one()

    def sync(self) -> None:
        """Block until every in-flight search has COMPLETED on device
        (results stay queued — nothing is drained). Useful to bound a
        measurement window or quiesce before a checkpoint.
        ``jax.block_until_ready`` is not a true barrier on remote-tunnel
        backends, so this fetches one element of the newest result."""
        if self._pending:
            leaf = jax.tree_util.tree_leaves(self._pending[-1])[0]
            np.asarray(leaf[(slice(0, 1),) * leaf.ndim])

    def search_stream(
        self, query_batches: Iterable
    ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        """Pipelined map over a stream of query batches: yields one
        (scores, ids) per batch, in order, keeping ``depth`` in
        flight."""
        for q in query_batches:
            done = self.submit(q)
            if done is not None:
                yield done
        yield from self.flush()

    def search(
        self, queries, *, encoded: bool = False
    ) -> Tuple[np.ndarray, np.ndarray]:
        """One-shot BLOCKING search: drains the whole pipe (in-flight
        results are discarded by design — use submit/flush to keep
        them). This measures per-call latency, including any
        host<->device tunnel floor; inside a serving loop use
        ``submit``/``search_stream`` instead (the 53-vs-2.4 ms trap in
        the module docstring)."""
        for _ in self.flush():
            pass
        self.submit(queries, encoded=encoded)
        return next(self.flush())

    def warmup(self, queries, *, encoded: bool = False) -> None:
        """Compile the search for this query-batch shape (first call
        through a cold cache can cost tens of seconds on TPU); the
        result is discarded and the pipe left empty."""
        self.submit(queries, encoded=encoded)
        for _ in self.flush():
            pass

    # ------------------------------------------------------------ impl
    def _drain_one(self) -> Tuple[np.ndarray, np.ndarray]:
        s, i = self._pending.popleft()
        if self._materialize:
            return np.asarray(s), np.asarray(i)
        return s, i

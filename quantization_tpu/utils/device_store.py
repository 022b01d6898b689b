"""Device-resident growable store for streaming ingestion.

The encode loops stream host batches up and keep codes on device. A naive
list-of-chunks + concatenate peaks at 2x the corpus (inputs + output) in
HBM; at 10M x 768 int8 that is the difference between fitting on one chip
and OOM. ``DeviceAppender`` preallocates the padded output once and commits
each batch with a donated ``dynamic_update_slice`` — true in-place, one
compiled program for every batch (the start offset is a traced scalar).

This is the TPU analogue of the reference's append-only storage builder
(encoded_storage.rs:21-25): ordered commits into a preallocated buffer.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _commit_impl(
    buf: jax.Array, chunk: jax.Array, start: jax.Array, axis: int = 0
) -> jax.Array:
    idx = tuple(
        start if a == axis else jnp.int32(0) for a in range(buf.ndim)
    )
    return jax.lax.dynamic_update_slice(buf, chunk, idx)


_commit = jax.jit(_commit_impl, donate_argnums=(0,), static_argnames=("axis",))


class DeviceAppender:
    """Append device chunks along ``axis`` of a preallocated buffer.

    With ``sharding`` the buffer is allocated directly under that sharding
    (never materialized on one device) and every commit preserves it — the
    streaming-encode path for corpora whose codes exceed one chip's HBM:
    each small host batch is quantized and committed straight into the
    sharded buffer (GSPMD turns the dynamic_update_slice into a masked
    per-shard update)."""

    def __init__(self, shape, dtype, fill=0, sharding=None, axis: int = 0):
        self._axis = axis
        if sharding is not None:
            self._buf = jax.jit(
                lambda: jnp.full(shape, fill, dtype), out_shardings=sharding
            )()
            self._commit = jax.jit(
                partial(_commit_impl, axis=axis),
                donate_argnums=(0,),
                out_shardings=sharding,
            )
        else:
            self._buf = jnp.full(shape, fill, dtype)
            self._commit = partial(_commit, axis=axis)
        self._pos = 0
        self._cap = shape[axis]

    @property
    def pos(self) -> int:
        return self._pos

    def append(self, chunk: jax.Array) -> None:
        b = chunk.shape[self._axis]
        if self._pos + b > self._cap:
            raise ValueError(
                f"DeviceAppender overflow: {self._pos}+{b} > {self._cap}"
            )
        if chunk.dtype != self._buf.dtype:
            chunk = chunk.astype(self._buf.dtype)
        self._buf = self._commit(self._buf, chunk, jnp.int32(self._pos))
        self._pos += b

    def finish(self) -> jax.Array:
        """The full buffer (rows past ``pos`` keep the fill value)."""
        buf = self._buf
        self._buf = None  # donated away; guard reuse
        return buf

"""Persistent XLA compilation cache.

The engine's serving programs are compiled once per (shape, quantizer) and
reused forever; paying the XLA compile each process start is pure waste — and
on remote-compile setups (TPU pods behind a compile service) a cold compile
can cost minutes. This enables JAX's persistent cache so every program is
compiled exactly once per machine.

The reference has no analog (Rust is AOT-compiled); this is the TPU build's
equivalent of shipping a compiled artifact.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), ".jax_cache")

_enabled = False


def enable_compilation_cache(path: str | None = None) -> str | None:
    """Idempotently enable the persistent compilation cache.

    Returns the cache dir, or None if disabled via QTPU_NO_COMPILE_CACHE=1.
    """
    global _enabled
    if os.environ.get("QTPU_NO_COMPILE_CACHE") == "1":
        return None
    path = path or os.environ.get("QTPU_COMPILE_CACHE_DIR") or _DEFAULT_DIR
    if _enabled:
        return path
    import jax

    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # Cache everything, however quick the compile: the remote-compile
        # round trip itself is the cost being avoided.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _enabled = True
    except Exception:
        return None
    return path

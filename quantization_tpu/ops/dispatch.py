"""Kernel-path dispatch: Pallas (compiled) on TPU, Pallas-interpret or plain
XLA elsewhere.

This mirrors the reference's runtime ISA tiering — scalar / SSE / AVX2
selection at encoded_vectors_u8.rs:331-384 — as reference-XLA / Pallas tiering:
the XLA implementations are the always-correct portable path, the Pallas
kernels are the hand-tiled fast path, and tests pin the two against each
other exactly as the reference pins SIMD kernels against the scalar loop.
"""

from __future__ import annotations

import os
from functools import lru_cache


@lru_cache(maxsize=1)
def on_tpu() -> bool:
    import jax

    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def interpret_mode() -> bool:
    """Pallas kernels run in interpreter mode off-TPU (correctness testing)."""
    if os.environ.get("QTPU_FORCE_INTERPRET") == "1":
        return True
    return not on_tpu()


def use_pallas() -> bool:
    """Whether quantizer score paths default to the Pallas kernels.

    On TPU: yes. Off TPU the interpreter is too slow for large corpora, so
    default to the XLA path; QTPU_FORCE_PALLAS=1 overrides (used by tests).
    """
    if os.environ.get("QTPU_FORCE_PALLAS") == "1":
        return True
    if os.environ.get("QTPU_DISABLE_PALLAS") == "1":
        return False
    return on_tpu()

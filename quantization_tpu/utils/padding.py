"""Shape-alignment helpers shared by the Pallas kernel wrappers."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def round_up(x: int, m: int) -> int:
    return x + (-x) % m


def pad_dim_to(arr, axis: int, target: int, value=0):
    """Pad one axis of a (jnp or np) array up to ``target`` with ``value``."""
    n = arr.shape[axis]
    if n == target:
        return arr
    if n > target:
        raise ValueError(f"axis {axis} is {n}, larger than target {target}")
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, target - n)
    if isinstance(arr, np.ndarray):
        return np.pad(arr, widths, constant_values=value)
    return jnp.pad(arr, widths, constant_values=value)

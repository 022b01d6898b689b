"""ctypes loader (with lazy g++ build) for the native ingestion helpers.

The reference compiles its C kernels at build time via the ``cc`` crate
(quantization/build.rs:18-40); here the shared library is built on first use
with g++ and cached next to the source. Every entry point has a pure-numpy
fallback, so the package works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "qtpu_native.cpp")
_LIB = os.path.join(_HERE, "libqtpu_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    # Compile to a unique temp name and os.rename() into place (atomic on
    # POSIX): two processes racing the first-use build (pytest-xdist,
    # parallel ingestion jobs) each produce a complete .so and the loser's
    # rename simply wins last — nobody ever CDLLs a half-written file.
    tmp = f"{_LIB}.tmp.{os.getpid()}"
    # -ffp-contract=off: GCC contracts a*b+c into FMA by default, which
    # diverges from the reference's strict f32 evaluation (rustc does not
    # contract) — the quantize path must match Rust bit-for-bit.
    cmd = [
        "g++", "-O3", "-march=native", "-ffp-contract=off", "-std=c++17",
        "-shared", "-fPIC", _SRC, "-o", tmp,
    ]
    try:
        subprocess.run(
            cmd, check=True, capture_output=True, timeout=120
        )
        os.replace(tmp, _LIB)
        return True
    except (OSError, subprocess.SubprocessError):
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, building it on first call; None if
    unavailable (no compiler / unsupported platform)."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(
            _SRC
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        i64, f32p, u8p = (
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_uint8),
        )
        lib.qtpu_quantize_u8.argtypes = [
            f32p, i64, i64, i64,
            ctypes.c_float, ctypes.c_float, ctypes.c_uint8,
            ctypes.c_int, ctypes.c_int, u8p, f32p,
        ]
        lib.qtpu_pack_bits.argtypes = [f32p, i64, i64, i64, u8p]
        lib.qtpu_min_max.argtypes = [f32p, i64, f32p, f32p]
        lib.qtpu_xor_popcount.argtypes = [u8p, u8p, i64]
        lib.qtpu_xor_popcount.restype = ctypes.c_uint64
        f32 = ctypes.c_float
        lib.qtpu_cpu_scan_dot_u8.argtypes = [u8p, u8p, i64, i64, f32, f32, f32p, f32p]
        lib.qtpu_cpu_scan_l1_u8.argtypes = [u8p, u8p, i64, i64, f32, f32, f32p, f32p]
        lib.qtpu_cpu_scan_hamming.argtypes = [u8p, u8p, i64, i64, f32, f32, f32p]
        lib.qtpu_cpu_scan_dot_f32.argtypes = [f32p, f32p, i64, i64, f32p]
        lib.qtpu_abi_version.restype = ctypes.c_int
        if lib.qtpu_abi_version() != 2:
            return None
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def _f32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def quantize_u8(
    data: np.ndarray,
    dpad: int,
    alpha: float,
    offset: float,
    pad_code: int,
    distance_type_index: int,
    invert: bool,
):
    """Native streaming SQ encode; returns (codes u8[n, dpad], voff f32[n])."""
    lib = get_lib()
    data = np.ascontiguousarray(data, dtype=np.float32)
    n, dim = data.shape
    codes = np.empty((n, dpad), dtype=np.uint8)
    voff = np.empty((n,), dtype=np.float32)
    if lib is None:
        raise RuntimeError("native library unavailable")
    lib.qtpu_quantize_u8(
        _f32p(data), n, dim, dpad,
        ctypes.c_float(alpha), ctypes.c_float(offset),
        ctypes.c_uint8(pad_code),
        distance_type_index, int(invert),
        _u8p(codes), _f32p(voff),
    )
    return codes, voff


def pack_bits(data: np.ndarray, row_bytes: int) -> np.ndarray:
    lib = get_lib()
    data = np.ascontiguousarray(data, dtype=np.float32)
    n, dim = data.shape
    rows = np.empty((n, row_bytes), dtype=np.uint8)
    if lib is None:
        raise RuntimeError("native library unavailable")
    lib.qtpu_pack_bits(_f32p(data), n, dim, row_bytes, _u8p(rows))
    return rows


def min_max(data: np.ndarray):
    lib = get_lib()
    data = np.ascontiguousarray(data, dtype=np.float32)
    if lib is None:
        raise RuntimeError("native library unavailable")
    mn = ctypes.c_float()
    mx = ctypes.c_float()
    lib.qtpu_min_max(_f32p(data), data.size, ctypes.byref(mn), ctypes.byref(mx))
    return float(mn.value), float(mx.value)


def cpu_scan_dot_u8(
    query: np.ndarray, codes: np.ndarray, multiplier: float,
    query_offset: float, voffsets: np.ndarray,
) -> np.ndarray:
    """Full-scan SQ dot scoring on CPU (reference scalar/SIMD kernel role)."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    query = np.ascontiguousarray(query, dtype=np.uint8)
    codes = np.ascontiguousarray(codes, dtype=np.uint8)
    voffsets = np.ascontiguousarray(voffsets, dtype=np.float32)
    n, dpad = codes.shape
    out = np.empty((n,), dtype=np.float32)
    lib.qtpu_cpu_scan_dot_u8(
        _u8p(query), _u8p(codes), n, dpad,
        ctypes.c_float(multiplier), ctypes.c_float(query_offset),
        _f32p(voffsets), _f32p(out),
    )
    return out


def cpu_scan_dot_f32(query: np.ndarray, data: np.ndarray) -> np.ndarray:
    """Full-scan f32 dot scoring on CPU (unquantized baseline)."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    query = np.ascontiguousarray(query, dtype=np.float32)
    data = np.ascontiguousarray(data, dtype=np.float32)
    n, dim = data.shape
    out = np.empty((n,), dtype=np.float32)
    lib.qtpu_cpu_scan_dot_f32(_f32p(query), _f32p(data), n, dim, _f32p(out))
    return out


def xor_popcount(a: np.ndarray, b: np.ndarray) -> int:
    lib = get_lib()
    a = np.ascontiguousarray(a, dtype=np.uint8)
    b = np.ascontiguousarray(b, dtype=np.uint8)
    if lib is None:
        raise RuntimeError("native library unavailable")
    return int(lib.qtpu_xor_popcount(_u8p(a), _u8p(b), a.size))

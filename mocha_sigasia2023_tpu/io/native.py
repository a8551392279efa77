"""ctypes bindings for the native host-I/O library (native/mocha_native.cpp).

Auto-builds the shared library with g++ on first use when a toolchain is
available; every entry point has a NumPy fallback, so the framework works
identically (slower) without it.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "mocha_native.cpp")
_LIB = os.path.join(_REPO_ROOT, "native", "libmocha_native.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB, _SRC],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) and os.path.exists(_SRC):
            _build()
        if not os.path.exists(_LIB):
            return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        lib.mocha_parse_floats.restype = ctypes.c_int64
        lib.mocha_parse_floats.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64]
        lib.mocha_format_frames.restype = ctypes.c_int64
        lib.mocha_format_frames.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_char_p, ctypes.c_int64]
        lib.mocha_db_block_f32.restype = ctypes.c_int64
        lib.mocha_db_block_f32.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64)]
        _lib = lib
        return _lib


def parse_floats(text: str) -> np.ndarray:
    """Whitespace-separated float text -> float64 array.

    Native single-pass strtod when available; NumPy split fallback.
    """
    lib = get_lib()
    if lib is None:
        return np.array(text.split(), dtype=np.float64)
    raw = text.encode()
    # worst case one float per 2 bytes
    cap = max(len(raw) // 2 + 16, 64)
    out = np.empty(cap, dtype=np.float64)
    n = lib.mocha_parse_floats(
        raw, len(raw), out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        cap)
    if n < 0:
        return np.array(text.split(), dtype=np.float64)
    return out[:n].copy()


def format_frames(values: np.ndarray) -> str:
    """(rows, cols) float matrix -> '%f'-formatted frame rows (trailing
    space per value + newline per row, the BVH MOTION block layout)."""
    values = np.ascontiguousarray(values, dtype=np.float64)
    nrows, ncols = values.shape
    lib = get_lib()
    if lib is None:
        return "".join(
            "".join(f"{v:f} " for v in row) + "\n" for row in values)
    cap = nrows * ncols * 32 + nrows + 16
    buf = ctypes.create_string_buffer(cap)
    w = lib.mocha_format_frames(
        values.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        nrows, ncols, buf, cap)
    if w < 0:
        return "".join(
            "".join(f"{v:f} " for v in row) + "\n" for row in values)
    return buf.raw[:w].decode()


def read_db_block_f32(buf: bytes, offset: int, ncomp: int):
    """Read one (u32,u32)+f32[] block of a database.bin via the native
    reader.  Returns (array (n0, n1, ncomp), next_offset); None if the
    native library is unavailable (callers fall back to the NumPy codec).
    """
    lib = get_lib()
    if lib is None:
        return None
    arr = np.frombuffer(buf, dtype=np.uint8)
    import struct as _struct

    n0, n1 = _struct.unpack_from("<II", buf, offset)
    count = n0 * n1 * ncomp
    out = np.empty(count, dtype=np.float32)
    shape = np.zeros(2, dtype=np.int64)
    nxt = lib.mocha_db_block_f32(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(buf), offset,
        ncomp, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), count,
        shape.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    if nxt < 0:
        return None
    return out.reshape(int(shape[0]), int(shape[1]), ncomp), int(nxt)

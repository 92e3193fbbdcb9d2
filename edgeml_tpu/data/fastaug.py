"""ctypes binding for the native fused HSV jitter (native/aug.cpp).

Same protocol as fastio/fastresize: builds the shared library on first use
(g++, cached next to the source) and degrades to the pure-NumPy
implementation in yolo_aug on any failure — the native kernel is a fast
path, never a requirement. The NumPy path stays as the numerical oracle
(tests/test_yolo_aug.py asserts parity at float-rounding tolerance).
"""

from __future__ import annotations

import ctypes
import os
import threading

import numpy as np

from .fastio import NATIVE_DIR, build_native_lib

_SRC = os.path.join(NATIVE_DIR, "aug.cpp")
_SO = os.path.join(NATIVE_DIR, "libaug.so")
_lock = threading.Lock()
_lib = None
_failed = False


def _load():
    global _lib, _failed
    with _lock:
        if _lib is not None or _failed:
            return _lib
        try:
            lib = build_native_lib(_SRC, _SO)
            lib.hsv_jitter_f32.restype = ctypes.c_int
            lib.hsv_jitter_f32.argtypes = [
                ctypes.POINTER(ctypes.c_float),  # img
                ctypes.c_int64,  # n_px
                ctypes.c_double, ctypes.c_double, ctypes.c_double,  # gains
                ctypes.POINTER(ctypes.c_float),  # out
                ctypes.c_int,  # nthreads
            ]
            _lib = lib
        except Exception:
            _failed = True
        return _lib


def native_hsv_jitter(img: np.ndarray, rh: float, rs: float, rv: float):
    """Apply the fused HSV jitter to an (..., 3) float32 RGB array.

    Returns the jittered array, or None if the native library is
    unavailable (caller falls back to the NumPy path)."""
    lib = _load()
    if lib is None:
        return None
    if img.ndim < 1 or img.shape[-1] != 3:
        return None
    img = np.ascontiguousarray(img, np.float32)
    out = np.empty_like(img)
    rc = lib.hsv_jitter_f32(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        img.size // 3,
        float(rh), float(rs), float(rv),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        0,
    )
    if rc != 0:
        return None
    return out

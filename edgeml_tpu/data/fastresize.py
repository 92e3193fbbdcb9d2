"""ctypes binding for the native fused bilinear resampler (native/resize.cpp).

Same protocol as fastio: builds the shared library on first use (g++, cached
next to the source) and degrades to the pure-NumPy tap evaluation in
loader.resize_bilinear on any failure — the native kernel is a fast path,
never a requirement. The taps themselves always come from loader._linear_taps
(jax.image.resize "bilinear" semantics), so native and NumPy paths evaluate
the identical resampling matrix.
"""

from __future__ import annotations

import ctypes
import os
import threading

import numpy as np

from .fastio import NATIVE_DIR, build_native_lib

_SRC = os.path.join(NATIVE_DIR, "resize.cpp")
_SO = os.path.join(NATIVE_DIR, "libresize.so")
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
            lib.resize_bilinear_f32.restype = ctypes.c_int
            lib.resize_bilinear_f32.argtypes = [
                ctypes.POINTER(ctypes.c_float),  # img
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,  # h, w, c
                ctypes.POINTER(ctypes.c_float),  # out
                ctypes.c_int64, ctypes.c_int64,  # oh, ow
                ctypes.POINTER(ctypes.c_int32),  # jh
                ctypes.POINTER(ctypes.c_float),  # wh
                ctypes.c_int,  # span_h
                ctypes.POINTER(ctypes.c_int32),  # jw
                ctypes.POINTER(ctypes.c_float),  # ww
                ctypes.c_int,  # span_w
                ctypes.POINTER(ctypes.c_float),  # scratch
                ctypes.c_int,  # nthreads
            ]
            _lib = lib
        except Exception:
            _failed = True
        return _lib


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _iptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def native_resize(img: np.ndarray, out_h: int, out_w: int,
                  jh: np.ndarray, wh: np.ndarray,
                  jw: np.ndarray, ww: np.ndarray):
    """Run the native fused tap kernel. Returns the (out_h, out_w, C) f32
    array, or None if the native library is unavailable (caller falls back)."""
    lib = _load()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, np.float32)
    h, w, c = img.shape
    jh32 = np.ascontiguousarray(jh, np.int32)
    jw32 = np.ascontiguousarray(jw, np.int32)
    wh32 = np.ascontiguousarray(wh, np.float32)
    ww32 = np.ascontiguousarray(ww, np.float32)
    out = np.empty((out_h, out_w, c), np.float32)
    scratch = np.empty((out_h, w, c), np.float32)
    rc = lib.resize_bilinear_f32(
        _fptr(img), h, w, c, _fptr(out), out_h, out_w,
        _iptr(jh32), _fptr(wh32), wh32.shape[1],
        _iptr(jw32), _fptr(ww32), ww32.shape[1],
        _fptr(scratch), 0,
    )
    if rc != 0:
        return None
    return out

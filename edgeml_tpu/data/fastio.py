"""ctypes binding for the native parallel text-file reader (native/fastio.cpp).

Builds the shared library on first use (g++, cached next to the source) and
exposes `load_txt_boxes(paths, cols, max_rows)`. Any build or per-file parse
failure degrades to the pure-Python path transparently — the native reader is
a fast path, never a requirement.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SRC = os.path.join(NATIVE_DIR, "fastio.cpp")
_SO = os.path.join(NATIVE_DIR, "libfastio.so")
_lock = threading.Lock()
_lib = None
_failed = False


def build_native_lib(src: str, so: str) -> ctypes.CDLL:
    """Shared build-and-load recipe for the native/ fast paths (fastio,
    fastresize): (re)compile `so` when missing or older than `src`, then
    dlopen it. Raises on any failure — callers latch the failure and fall
    back to their pure-Python path."""
    if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
        subprocess.run(
            [
                "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                "-o", so, src, "-lpthread",
            ],
            check=True,
            capture_output=True,
        )
    return ctypes.CDLL(so)


def _load():
    global _lib, _failed
    with _lock:
        if _lib is not None or _failed:
            return _lib
        try:
            lib = build_native_lib(_SRC, _SO)
            lib.fastio_load_boxes.argtypes = [
                ctypes.c_char_p,
                ctypes.c_long,
                ctypes.c_long,
                ctypes.c_long,
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_long),
                ctypes.c_int,
            ]
            lib.fastio_load_boxes.restype = ctypes.c_int
            _lib = lib
        except Exception:
            _failed = True
    return _lib


def available() -> bool:
    return _load() is not None


def load_txt_boxes(paths, cols: int, max_rows: int = 1024, n_threads: int = 0):
    """Parse many '{cls} {x} {y} {w} {h} [conf]' text files at once.

    :param paths: list of file paths.
    :param cols: expected columns per row.
    :param max_rows: per-file row capacity.
    :return: list of (rows_i, cols) float32 arrays, or None entries for files
        the native parser rejected (missing / malformed / overflow) — the
        caller re-parses those in Python. Returns None entirely when the
        native library is unavailable.
    """
    lib = _load()
    if lib is None or not paths:
        return None
    blob = b"\0".join(p.encode() for p in paths) + b"\0"
    n = len(paths)
    out = np.zeros((n, max_rows, cols), np.float32)
    rows = np.zeros((n,), np.int64)
    rc = lib.fastio_load_boxes(
        blob,
        n,
        cols,
        max_rows,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        rows.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        n_threads,
    )
    if rc != 0:
        return None
    result = []
    for i in range(n):
        if rows[i] < 0:
            result.append(None)
        else:
            result.append(out[i, : rows[i]].copy())
    return result

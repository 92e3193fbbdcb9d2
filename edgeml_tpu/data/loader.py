"""Streaming image-batch pipeline (host side).

The reference trains VOC07+12 (~16.5k images) through a lazy torch DataLoader
(/root/reference/torch_models/train.py:63-82). The TPU rebuild equivalent:
images decode + preprocess per batch in background threads, double-buffered so
the host prepares batch s+1..s+prefetch while the device runs batch s. Peak
host RSS is bounded by (prefetch + 1) batches of decoded images plus the
original-resolution decode transients — never the whole dataset.

Only JPEG/PNG/npy decode and normalization happen here; everything after the
(B, S, S, 3) array is jitted device code.
"""

from __future__ import annotations

import os
from collections import deque
from concurrent.futures import ThreadPoolExecutor
from functools import lru_cache

import numpy as np

def list_images(img_dir: str):
    """Sorted image file names — every regular file in the directory (the
    sorted-name universe every pipeline stage keys on, lib/data.py:54-56).
    No extension filter: like the reference's loaders, any file PIL can't
    decode raises loudly rather than being silently skipped (a skipped image
    would leave a hole in the per-image file contract downstream)."""
    return sorted(
        n for n in os.listdir(img_dir)
        if os.path.isfile(os.path.join(img_dir, n))
    )


def decode_image(path: str) -> np.ndarray:
    """One image file -> HWC float32 in [0, 1]."""
    if path.lower().endswith(".npy"):
        arr = np.load(path).astype(np.float32)
        if arr.max() > 1.5:
            arr = arr / 255.0
        return arr
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0


@lru_cache(maxsize=16)
def _linear_taps(in_size: int, out_size: int, antialias: bool = True):
    """Banded resampling taps (idx (out, span) int, w (out, span) f32) with
    jax.image.resize 'bilinear' semantics: half-pixel centers, triangle
    kernel widened to 1/scale when downscaling (antialias), out-of-range
    taps dropped and rows renormalized. Verified against jax.image.resize
    to <3e-5 (tests/test_loader.py).

    The kernel has finite support (span = ceil(2*max(1, 1/scale)) + 2), so
    the resampling matrix is banded — evaluating it as gathered taps costs
    O(out*span) per line instead of the dense O(out*in) GEMM, ~50-100x
    less host work per image (measured: 54 -> ~1 ms for a 480x640 -> 640
    letterbox line pair).

    maxsize is deliberately small: a VOC/COCO-scale run produces hundreds of
    distinct (in, out) pairs, and the taps are cheap to recompute — a large
    cache would quietly hold host RAM against the loader's bounded-RSS
    contract."""
    scale = out_size / in_size
    x = np.arange(out_size, dtype=np.float64)
    u = (x + 0.5) / scale - 0.5
    s = max(1.0, 1.0 / scale) if antialias else 1.0
    lo = np.floor(u - s).astype(int)
    span = int(np.ceil(2 * s)) + 2
    j = lo[:, None] + np.arange(span)[None, :]
    w = np.clip(1.0 - np.abs((j - u[:, None]) / s), 0.0, None)
    w = np.where((j >= 0) & (j < in_size), w, 0.0)
    w = w / np.maximum(w.sum(1, keepdims=True), 1e-12)
    # out-of-range taps carry zero weight, so clipping their index is safe
    return np.clip(j, 0, in_size - 1), w.astype(np.float32)


def _linear_weights(in_size: int, out_size: int, antialias: bool = True):
    """Dense (out, in) form of _linear_taps (tests / external consumers)."""
    j, w = _linear_taps(in_size, out_size, antialias)
    mat = np.zeros((out_size, in_size), np.float32)
    np.add.at(mat, (np.repeat(np.arange(out_size), j.shape[1]), j.ravel()),
              w.ravel())
    return mat


def resize_bilinear(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Host NumPy image resize numerically matching
    jax.image.resize(img, (out_h, out_w, C), "bilinear") — keeps image decode
    threads off the accelerator (no per-image device launches). Banded-tap
    evaluation (see _linear_taps); identical weights to the dense matrix
    contraction, summation reordered within each kernel window."""
    if (out_h, out_w) == img.shape[:2]:
        # scale 1 taps are the identity (half-pixel centers, s=1 triangle
        # peaks exactly on the source pixel) — common in letterboxing when
        # one image side already matches the target
        return np.array(img, dtype=np.float32, order="C", copy=True)
    return _eval_taps(img, out_h, out_w,
                      _linear_taps(img.shape[0], out_h),
                      _linear_taps(img.shape[1], out_w))


def resize_bilinear_window(img: np.ndarray, out_h: int, out_w: int,
                           y0: int, y1: int, x0: int, x1: int) -> np.ndarray:
    """The [y0:y1, x0:x1] window of resize_bilinear(img, out_h, out_w),
    computed directly: each output row/column depends only on its own taps,
    so slicing the tap tables yields the identical pixels at the window's
    fraction of the work. mosaic4 pastes only the visible part of each
    quadrant — on average ~3/4 of the resized image — so the clipped rest
    is never computed."""
    if (out_h, out_w) == img.shape[:2]:  # identity taps (see resize_bilinear)
        return np.array(img[y0:y1, x0:x1], dtype=np.float32, order="C",
                        copy=True)
    jh, wh = _linear_taps(img.shape[0], out_h)
    jw, ww = _linear_taps(img.shape[1], out_w)
    return _eval_taps(img, y1 - y0, x1 - x0,
                      (jh[y0:y1], wh[y0:y1]), (jw[x0:x1], ww[x0:x1]))


def _eval_taps(img, out_h, out_w, row_taps, col_taps):
    """Evaluate banded resampling taps: native fused kernel when available,
    per-tap NumPy accumulation otherwise (identical weights either way)."""
    jh, wh = row_taps
    jw, ww = col_taps
    from .fastresize import native_resize

    # native fused kernel (native/resize.cpp) — same taps, one pass per
    # output element instead of one full-plane pass per tap; falls back
    # below if the shared library is unavailable
    out = native_resize(img, out_h, out_w, jh, wh, jw, ww)
    if out is not None:
        return out
    img = np.ascontiguousarray(img, np.float32)
    # rows first when downscaling height (shrink the data before the column
    # pass); per-tap accumulation keeps temporaries at one (.., C) plane —
    # a gathered (out, span, .., C) tensor thrashes the cache instead
    if out_h <= img.shape[0]:
        tmp = wh[:, 0, None, None] * img[jh[:, 0]]
        for t in range(1, wh.shape[1]):
            tmp += wh[:, t, None, None] * img[jh[:, t]]
        out = ww[:, 0, None] * tmp[:, jw[:, 0]]
        for t in range(1, ww.shape[1]):
            out += ww[:, t, None] * tmp[:, jw[:, t]]
    else:
        tmp = ww[:, 0, None] * img[:, jw[:, 0]]
        for t in range(1, ww.shape[1]):
            tmp += ww[:, t, None] * img[:, jw[:, t]]
        out = wh[:, 0, None, None] * tmp[jh[:, 0]]
        for t in range(1, wh.shape[1]):
            out += wh[:, t, None, None] * tmp[jh[:, t]]
    return out


def iter_batches(
    img_dir: str,
    names: list,
    batch_size: int,
    make_batch,
    order=None,
    prefetch: int = 2,
    workers: int = 4,
    drop_last: bool = False,
):
    """Yield make_batch([(name, decoded_image), ...]) per batch, prefetched.

    :param names: image file names (relative to img_dir).
    :param make_batch: host preprocess: list of (name, HWC float image) ->
        arbitrary batch payload. Runs in a worker thread.
    :param order: optional index permutation (epoch shuffle).
    :param prefetch: batches prepared ahead of the consumer.
    :param drop_last: skip a trailing partial batch (training) or keep it
        (inference).
    """
    idx = np.arange(len(names)) if order is None else np.asarray(order)
    spans = [
        idx[s : s + batch_size] for s in range(0, len(idx), batch_size)
    ]
    if drop_last and spans and len(spans[-1]) < batch_size:
        spans.pop()

    def build(span):
        items = [
            (names[i], decode_image(os.path.join(img_dir, names[i])))
            for i in span
        ]
        return make_batch(items)

    with ThreadPoolExecutor(max_workers=workers) as pool:
        window: deque = deque()
        for span in spans[: prefetch + 1]:
            window.append(pool.submit(build, span))
        next_submit = prefetch + 1
        while window:
            yield window.popleft().result()
            if next_submit < len(spans):
                window.append(pool.submit(build, spans[next_submit]))
                next_submit += 1

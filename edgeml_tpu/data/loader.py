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
def _linear_weights(in_size: int, out_size: int, antialias: bool = True):
    """(out, in) separable resampling matrix with jax.image.resize 'bilinear'
    semantics: half-pixel centers, triangle kernel widened to 1/scale when
    downscaling (antialias), out-of-range taps dropped and rows renormalized.
    Verified against jax.image.resize to <3e-5 (tests/test_loader.py).

    maxsize is deliberately small: a VOC/COCO-scale run produces hundreds of
    distinct (in, out) pairs at ~1 MB each, and the matrices are cheap to
    recompute — a large cache would quietly hold 100s of MB of host RAM
    against the loader's bounded-RSS contract."""
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
    mat = np.zeros((out_size, in_size))
    np.add.at(
        mat,
        (np.repeat(np.arange(out_size), span), np.clip(j, 0, in_size - 1).ravel()),
        w.ravel(),
    )
    return mat.astype(np.float32)


def resize_bilinear(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Host NumPy image resize numerically matching
    jax.image.resize(img, (out_h, out_w, C), "bilinear") — keeps image decode
    threads off the accelerator (no per-image device launches)."""
    wh = _linear_weights(img.shape[0], out_h)
    ww = _linear_weights(img.shape[1], out_w)
    tmp = np.tensordot(ww, img, axes=(1, 1)).transpose(1, 0, 2)  # (H, out_w, C)
    return np.tensordot(wh, tmp, axes=(1, 0))


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

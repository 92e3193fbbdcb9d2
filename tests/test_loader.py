"""Streaming data pipeline: resize parity, prefetch iterator semantics."""

import os
import threading

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from edgeml_tpu.data.loader import (
    decode_image, iter_batches, list_images, resize_bilinear,
)


@pytest.mark.parametrize(
    "shape,out",
    [((500, 353), (640, 452)), ((123, 456), (64, 64)), ((640, 640), (320, 320)),
     ((37, 991), (640, 640)), ((300, 300), (300, 300)), ((5, 7), (64, 64))],
)
def test_resize_matches_jax_image(shape, out):
    """Host resize numerically matches jax.image.resize 'bilinear' (both
    up- and down-scaling, including the antialias triangle widening)."""
    rng = np.random.default_rng(0)
    img = rng.random(shape + (3,)).astype(np.float32)
    want = np.asarray(jax.image.resize(jnp.asarray(img), out + (3,), "bilinear"))
    got = resize_bilinear(img, *out)
    assert np.abs(want - got).max() < 5e-5


def test_native_resize_matches_numpy_fallback(monkeypatch):
    """The fused C++ kernel (native/resize.cpp) and the NumPy banded-tap
    fallback evaluate the identical resampling (same _linear_taps weights);
    they must agree to float-roundoff on every shape regime. Also covers the
    graceful degradation contract: with the native path disabled the public
    resize_bilinear still works."""
    from edgeml_tpu.data import fastresize, loader

    rng = np.random.default_rng(3)
    cases = [((480, 640), (456, 608)), ((100, 300), (640, 640)),
             ((640, 640), (320, 320)), ((33, 17), (64, 128)),
             ((5, 640), (640, 5))]
    for shape, out in cases:
        img = rng.random(shape + (3,)).astype(np.float32)
        native = resize_bilinear(img, *out)
        with monkeypatch.context() as m:
            m.setattr(fastresize, "native_resize",
                      lambda *a, **k: None)
            fallback = loader.resize_bilinear(img, *out)
        assert np.abs(native - fallback).max() < 2e-6, (shape, out)
        assert native.dtype == fallback.dtype == np.float32

    # 4-channel input exercises the generic (non-RGB) native inner loop
    img4 = rng.random((60, 90, 4)).astype(np.float32)
    native = resize_bilinear(img4, 128, 96)
    with monkeypatch.context() as m:
        m.setattr(fastresize, "native_resize", lambda *a, **k: None)
        fallback = loader.resize_bilinear(img4, 128, 96)
    assert np.abs(native - fallback).max() < 2e-6


def test_resize_window_matches_full_crop():
    """resize_bilinear_window computes exactly the [y0:y1, x0:x1] crop of the
    full resize (tap-table slicing; mosaic4 relies on this for its clipped
    quadrants), including the identity-size shortcut."""
    from edgeml_tpu.data.loader import resize_bilinear_window

    rng = np.random.default_rng(9)
    for shape, out, win in [
        ((480, 640), (640, 853), (10, 500, 0, 853)),
        ((100, 300), (640, 640), (0, 640, 321, 640)),
        ((640, 640), (320, 320), (100, 200, 50, 320)),
        ((64, 64), (64, 64), (5, 40, 10, 30)),  # identity shortcut
    ]:
        img = rng.random(shape + (3,)).astype(np.float32)
        full = resize_bilinear(img, *out)
        y0, y1, x0, x1 = win
        got = resize_bilinear_window(img, out[0], out[1], y0, y1, x0, x1)
        np.testing.assert_array_equal(got, full[y0:y1, x0:x1])


def _make_imgdir(tmp_path, n, seed=0):
    rng = np.random.default_rng(seed)
    d = tmp_path / "imgs"
    d.mkdir()
    for i in range(n):
        h, w = rng.integers(20, 60, 2)
        np.save(d / f"im{i:03d}.npy", rng.random((h, w, 3)).astype(np.float32))
    return str(d)


def test_iter_batches_matches_eager(tmp_path):
    """Streamed batches carry exactly the eager-load content, in order,
    including the trailing partial batch."""
    d = _make_imgdir(tmp_path, 11)
    names = list_images(d)

    def make_batch(items):
        return [n for n, _ in items], [im.sum() for _, im in items]

    got_names, got_sums = [], []
    for ns, ss in iter_batches(d, names, 4, make_batch, prefetch=2):
        got_names += ns
        got_sums += ss
    assert got_names == names
    want = [decode_image(os.path.join(d, n)).sum() for n in names]
    np.testing.assert_allclose(got_sums, want)


def test_iter_batches_order_and_drop_last(tmp_path):
    d = _make_imgdir(tmp_path, 10, seed=1)
    names = list_images(d)
    order = np.random.default_rng(3).permutation(10)

    def make_batch(items):
        return [n for n, _ in items]

    batches = list(
        iter_batches(d, names, 4, make_batch, order=order, drop_last=True)
    )
    assert len(batches) == 2  # 10 // 4, trailing 2 dropped
    flat = [n for b in batches for n in b]
    assert flat == [names[i] for i in order[:8]]


def test_iter_batches_bounded_prefetch(tmp_path):
    """The window never decodes more than prefetch+1 batches ahead of the
    consumer — the memory bound the trainer relies on."""
    d = _make_imgdir(tmp_path, 24, seed=2)
    names = list_images(d)
    built, consumed = [], []
    lock = threading.Lock()

    def make_batch(items):
        with lock:
            built.append(len(consumed))
        return len(items)

    prefetch = 2
    for out in iter_batches(d, names, 4, make_batch, prefetch=prefetch, workers=2):
        consumed.append(out)
    # batch b may start building only once consumer has taken >= b - prefetch
    for b, seen_consumed in enumerate(built):
        assert b - seen_consumed <= prefetch + 1

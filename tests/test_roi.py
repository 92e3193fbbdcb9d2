"""ROI align / pool kernels vs a straight-line NumPy oracle.

The oracle re-derives torchvision's roi_align (aligned=False, adaptive
sampling grid, bilinear with [-1, S] borders) and roi_pool (quantized bins,
legacy +1 extent) for the square-padded single-ROI case used by the feature
loader (lib/data.py:104-117).
"""

import numpy as np
import pytest

from edgeml_tpu.ops.roi import roi_resize_batch


def bilinear(fm, y, x):
    c, S, _ = fm.shape
    if y < -1.0 or y > S or x < -1.0 or x > S:
        return np.zeros(c)
    y = min(max(y, 0.0), S - 1)
    x = min(max(x, 0.0), S - 1)
    y0, x0 = int(np.floor(y)), int(np.floor(x))
    y1, x1 = min(y0 + 1, S - 1), min(x0 + 1, S - 1)
    ly, lx = y - y0, x - x0
    return (
        fm[:, y0, x0] * (1 - ly) * (1 - lx)
        + fm[:, y0, x1] * (1 - ly) * lx
        + fm[:, y1, x0] * ly * (1 - lx)
        + fm[:, y1, x1] * ly * lx
    )


def oracle_align(fm, h, w, P):
    c = fm.shape[0]
    h, w = max(h, 1.0), max(w, 1.0)
    bin_h, bin_w = h / P, w / P
    gh, gw = int(np.ceil(bin_h)), int(np.ceil(bin_w))
    out = np.zeros((c, P, P))
    for ph in range(P):
        for pw in range(P):
            acc = np.zeros(c)
            for iy in range(gh):
                for ix in range(gw):
                    yy = ph * bin_h + (iy + 0.5) * bin_h / gh
                    xx = pw * bin_w + (ix + 0.5) * bin_w / gw
                    acc += bilinear(fm, yy, xx)
            out[:, ph, pw] = acc / (gh * gw)
    return out


def oracle_pool(fm, h, w, P):
    c, S, _ = fm.shape
    rh = max(round(h) + 1, 1)
    rw = max(round(w) + 1, 1)
    out = np.zeros((c, P, P))
    for ph in range(P):
        for pw in range(P):
            hs = min(max(int(np.floor(ph * rh / P)), 0), S)
            he = min(max(int(np.ceil((ph + 1) * rh / P)), 0), S)
            ws = min(max(int(np.floor(pw * rw / P)), 0), S)
            we = min(max(int(np.ceil((pw + 1) * rw / P)), 0), S)
            if he <= hs or we <= ws:
                out[:, ph, pw] = 0.0
            else:
                out[:, ph, pw] = fm[:, hs:he, ws:we].max(axis=(1, 2))
    return out


@pytest.mark.parametrize("hw", [(10, 16), (16, 10), (13, 13)])
def test_roi_align_matches_oracle(hw):
    rng = np.random.default_rng(0)
    h, w = hw
    side = max(h, w)
    fm = np.zeros((3, side, side), np.float32)
    fm[:, :h, :w] = rng.random((3, h, w))
    got = roi_resize_batch(fm[None], np.array([[h, w]], np.float32), 4, "avg")[0]
    want = oracle_align(fm, float(h), float(w), 4)
    assert np.allclose(got, want, atol=1e-4)


@pytest.mark.parametrize("hw", [(10, 16), (16, 10)])
def test_roi_pool_matches_oracle(hw):
    rng = np.random.default_rng(1)
    h, w = hw
    side = max(h, w)
    fm = np.zeros((2, side, side), np.float32)
    fm[:, :h, :w] = rng.random((2, h, w))
    got = roi_resize_batch(fm[None], np.array([[h, w]], np.float32), 4, "max")[0]
    want = oracle_pool(fm, float(h), float(w), 4)
    assert np.allclose(got, want, atol=1e-5)

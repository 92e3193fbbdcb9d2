"""ROI align / ROI pool in pure JAX (fixed shapes, vmapped over a batch).

Replaces the torchvision C++/CUDA ops the reference leans on for feature-map
resizing (/root/reference/lib/data.py:4,104-117). The reference's usage is a
single ROI per image covering the un-padded region [0, 0, w, h] of a
square-padded map, pooled to (size, size); these kernels replicate
torchvision's numerics for that case:

  * roi_align: aligned=False, spatial_scale=1, sampling_ratio=-1 (adaptive
    ceil(roi/P) sampling grid), bilinear interpolation with the [-1, S] border
    convention, mean over samples.
  * roi_pool: quantized bins (floor/ceil), roi width/height of (w+1) per the
    legacy +1 convention, max over the bin.

Per-image ROI sizes are dynamic values, so grids are computed at the static
upper bound and masked — one jitted kernel serves ragged batches.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _bilinear(fm: jax.Array, y: jax.Array, x: jax.Array) -> jax.Array:
    """Bilinear sample of fm (C, S, S) at positions y, x (...,) -> (C, ...)."""
    S = fm.shape[-1]
    valid = (y >= -1.0) & (y <= S) & (x >= -1.0) & (x <= S)
    yc = jnp.clip(y, 0.0, S - 1)
    xc = jnp.clip(x, 0.0, S - 1)
    y0 = jnp.floor(yc).astype(jnp.int32)
    x0 = jnp.floor(xc).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, S - 1)
    x1 = jnp.minimum(x0 + 1, S - 1)
    ly = yc - y0
    lx = xc - x0
    hy, hx = 1.0 - ly, 1.0 - lx
    v00 = fm[:, y0, x0]
    v01 = fm[:, y0, x1]
    v10 = fm[:, y1, x0]
    v11 = fm[:, y1, x1]
    out = v00 * (hy * hx) + v01 * (hy * lx) + v10 * (ly * hx) + v11 * (ly * lx)
    return jnp.where(valid, out, 0.0)


def _roi_align_one(fm: jax.Array, hw: jax.Array, P: int, G: int) -> jax.Array:
    """roi_align of one (C, S, S) map with ROI [0, 0, w, h] -> (C, P, P)."""
    h = jnp.maximum(hw[0], 1.0)
    w = jnp.maximum(hw[1], 1.0)
    bin_h = h / P
    bin_w = w / P
    grid_h = jnp.ceil(bin_h).astype(jnp.int32)  # adaptive sampling_ratio
    grid_w = jnp.ceil(bin_w).astype(jnp.int32)

    ph = jnp.arange(P)
    iy = jnp.arange(G)
    # y[p, i] = p*bin_h + (i + .5) * bin_h / grid_h
    ys = ph[:, None] * bin_h + (iy[None, :] + 0.5) * bin_h / grid_h  # (P, G)
    xs = ph[:, None] * bin_w + (iy[None, :] + 0.5) * bin_w / grid_w  # (P, G)
    my = iy[None, :] < grid_h  # (1, G) sample-validity
    mx = iy[None, :] < grid_w

    yy = jnp.broadcast_to(ys[:, None, :, None], (P, P, G, G))
    xx = jnp.broadcast_to(xs[None, :, None, :], (P, P, G, G))
    vals = _bilinear(fm, yy, xx)  # (C, P, P, G, G)
    mask = my[0][:, None] & mx[0][None, :]  # (G, G)
    vals = vals * mask[None, None, None]
    count = jnp.maximum(grid_h * grid_w, 1).astype(fm.dtype)
    return jnp.sum(vals, axis=(-1, -2)) / count


def _roi_pool_one(fm: jax.Array, hw: jax.Array, P: int, W: int) -> jax.Array:
    """roi_pool of one (C, S, S) map with ROI [0, 0, w, h] -> (C, P, P)."""
    S = fm.shape[-1]
    # Legacy +1 box convention: roi spans round(coord) inclusive.
    roi_h = jnp.maximum(jnp.round(hw[0]) + 1.0, 1.0)
    roi_w = jnp.maximum(jnp.round(hw[1]) + 1.0, 1.0)
    bin_h = roi_h / P
    bin_w = roi_w / P

    ph = jnp.arange(P).astype(fm.dtype)
    hstart = jnp.clip(jnp.floor(ph * bin_h), 0, S).astype(jnp.int32)  # (P,)
    hend = jnp.clip(jnp.ceil((ph + 1.0) * bin_h), 0, S).astype(jnp.int32)
    wstart = jnp.clip(jnp.floor(ph * bin_w), 0, S).astype(jnp.int32)
    wend = jnp.clip(jnp.ceil((ph + 1.0) * bin_w), 0, S).astype(jnp.int32)

    off = jnp.arange(W)
    yi = jnp.minimum(hstart[:, None] + off[None, :], S - 1)  # (P, W)
    xi = jnp.minimum(wstart[:, None] + off[None, :], S - 1)
    my = off[None, :] < (hend - hstart)[:, None]  # (P, W)
    mx = off[None, :] < (wend - wstart)[:, None]

    sub = fm[:, yi[:, None, :, None], xi[None, :, None, :]]  # (C, P, P, W, W)
    mask = my[:, None, :, None] & mx[None, :, None, :]  # (P, P, W, W)
    neg = jnp.finfo(fm.dtype).min
    sub = jnp.where(mask[None], sub, neg)
    out = jnp.max(sub, axis=(-1, -2))
    empty = ~jnp.any(mask, axis=(-1, -2))  # (P, P)
    return jnp.where(empty[None], 0.0, out)


@partial(jax.jit, static_argnames=("P", "func"))
def _roi_resize_jit(feats: jax.Array, sizes: jax.Array, P: int, func: str):
    S = feats.shape[-1]
    if func == "avg":
        G = max(int(math.ceil(S / P)), 1)
        return jax.vmap(lambda f, s: _roi_align_one(f, s, P, G))(feats, sizes)
    W = max(int(math.ceil((S + 1) / P)) + 1, 1)
    return jax.vmap(lambda f, s: _roi_pool_one(f, s, P, W))(feats, sizes)


def roi_resize_batch(feats, sizes, P: int, func: str = "avg") -> np.ndarray:
    """Resize a (B, C, S, S) batch of square-padded maps to (B, C, P, P).

    :param feats: square-padded feature maps (original content top-left).
    :param sizes: (B, 2) float array of the original (h, w) per image.
    :param P: output side.
    :param func: "avg" (roi_align) or "max" (roi_pool).
    """
    feats = jnp.asarray(np.asarray(feats), jnp.float32)
    sizes = jnp.asarray(np.asarray(sizes), jnp.float32)
    return np.asarray(_roi_resize_jit(feats, sizes, P, func))

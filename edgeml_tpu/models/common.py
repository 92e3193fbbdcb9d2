"""Detector building blocks in pure JAX (NHWC layout, param pytrees).

The reference family (YOLOv5 via ultralytics, /root/reference/yolov5_scripts.md;
torchvision CNN detectors, /root/reference/torch_models/train.py:16-18) is
CUDA/C++ kernels behind torch modules. Here each block is an init/apply pair
over an explicit parameter pytree:

  * NHWC activations + HWIO weights — the layouts XLA maps best onto the
    TPU MXU for convolutions;
  * BatchNorm with separate running-stats state (torch semantics: eps/momentum
    configurable per family — YOLOv5 uses 1e-3/0.03);
  * functional train/eval modes, so one code path serves the jitted training
    step, inference, and the multi-chip dryrun.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def conv_init(key, k: int, cin: int, cout: int, groups: int = 1):
    """Kaiming-uniform conv kernel (HWIO), matching torch Conv2d defaults."""
    fan_in = cin // groups * k * k
    bound = math.sqrt(1.0 / fan_in)  # torch default: uniform(-1/sqrt(fan), ..)
    return jax.random.uniform(
        key, (k, k, cin // groups, cout), jnp.float32, -bound, bound
    )


def conv2d(x, w, stride: int = 1, padding="SAME", groups: int = 1):
    """NHWC conv with HWIO weights."""
    return jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )


def bn_init(c: int):
    return {
        "scale": jnp.ones((c,)),
        "bias": jnp.zeros((c,)),
        "mean": jnp.zeros((c,)),
        "var": jnp.ones((c,)),
    }


def bn_apply(x, p, *, eps: float, momentum: float, train: bool):
    """BatchNorm over NHWC (channel-last). Returns (y, updated_stats)."""
    if train:
        mean = jnp.mean(x, axis=(0, 1, 2))
        var = jnp.var(x, axis=(0, 1, 2))
        n = x.size / mean.size
        unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
        new = {
            "scale": p["scale"],
            "bias": p["bias"],
            "mean": (1 - momentum) * p["mean"] + momentum * mean,
            "var": (1 - momentum) * p["var"] + momentum * unbiased,
        }
    else:
        mean, var, new = p["mean"], p["var"], p
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    return y * p["scale"] + p["bias"], new


def silu(x):
    return x * jax.nn.sigmoid(x)


def max_pool_same(x, k: int, stride: int = 1):
    """k x k max pool, stride s, SAME padding (NHWC)."""
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        (1, k, k, 1),
        (1, stride, stride, 1),
        "SAME",
    )


def upsample2x(x):
    """Nearest-neighbour x2 upsample (NHWC)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def letterbox_batch(images, size: int = 640, pad_value: float = 114 / 255):
    """Resize-with-aspect + pad a batch of (H, W, 3) images to (size, size).

    Host-side NumPy (ragged inputs); returns (B, size, size, 3) float32 plus
    per-image (ratio, dw, dh) for unmapping boxes. Matches the letterbox
    convention used by YOLOv5 tooling (symmetric padding, gray fill).
    """
    out = np.full((len(images), size, size, 3), pad_value, np.float32)
    meta = np.zeros((len(images), 3), np.float32)
    for i, img in enumerate(images):
        h, w = img.shape[:2]
        r = min(size / h, size / w)
        nh, nw = int(round(h * r)), int(round(w * r))
        from ..data.loader import resize_bilinear

        # Host NumPy resize (same numerics as jax.image.resize "bilinear"):
        # letterboxing runs in data-loader threads and must not emit
        # per-image device launches.
        resized = resize_bilinear(np.asarray(img, np.float32), nh, nw)
        dh, dw = (size - nh) // 2, (size - nw) // 2
        out[i, dh : dh + nh, dw : dw + nw] = resized
        meta[i] = (r, dw, dh)
    return out, meta

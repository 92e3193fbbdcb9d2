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


def conv2d_stem_s2d(x, w):
    """Even-kernel (k) stride-2 pad-((k-2)/2) conv computed as a (k/2)-kernel
    stride-1 pad-((k/2-1)/2) conv over the 2x2 space-to-depth rearrangement
    of the input — the identical tap set per output element (output[oy, ox]
    reads x[2oy + kh - (k-2)/2, ...] either way), just a different
    contraction layout, so results match up to float summation order.

    TPU rationale: an RGB-input conv tiles terribly (3-channel minor dim);
    s2d quadruples the contraction channels and quarters the spatial extent
    (measured 6.8 -> 3.9 ms for YOLOv5's 6x6 s2 3->16 stem on 128x640^2 v5e,
    tools/exp_stem2.py). Requires even H, W and even kernel k with k/2 odd
    (k=6 -> 3x3 s1 p1), true for the YOLOv5 v6 stem on any /32-letterboxed
    input.
    """
    b, h, wd, c = x.shape
    k = w.shape[0]
    kh = k // 2
    xs = (
        x.reshape(b, h // 2, 2, wd // 2, 2, c)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(b, h // 2, wd // 2, 4 * c)
    )
    ws = (
        w.reshape(kh, 2, kh, 2, c, -1)
        .transpose(0, 2, 1, 3, 4, 5)
        .reshape(kh, kh, 4 * c, -1)
    )
    p = kh // 2
    return conv2d(xs, ws, 1, padding=((p, p), (p, p)))


def conv2d_s2d_k3s2(x, w):
    """3x3 stride-2 pad-1 conv as a 2x2 stride-1 conv over the 2x2
    space-to-depth input: the kernel is zero-padded to 4x4 at the leading
    row/column (0-weight taps contribute exact zeros), which makes it the
    even-kernel case of conv2d_stem_s2d with asymmetric (1, 0) padding.
    Same tap set, different contraction layout. Requires even H, W.

    NOT wired into YoloV5: it wins in isolation (cin 16: 5.1 -> 4.2 ms at
    B=128 on v5e, tools/exp_round3.py) but regresses the full pipeline ~7%
    — the input transpose breaks XLA's fusion with the producing stage.
    Kept (with its equivalence test) as a building block and a measured
    negative result; only the RGB stem (conv2d_stem_s2d, where the producer
    is the raw image) composes profitably.
    """
    b, h, wd, c = x.shape
    w4 = jnp.zeros((4, 4) + w.shape[2:], w.dtype).at[1:, 1:].set(w)
    xs = (
        x.reshape(b, h // 2, 2, wd // 2, 2, c)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(b, h // 2, wd // 2, 4 * c)
    )
    ws = (
        w4.reshape(2, 2, 2, 2, c, -1)
        .transpose(0, 2, 1, 3, 4, 5)
        .reshape(2, 2, 4 * c, -1)
    )
    return conv2d(xs, ws, 1, padding=((1, 0), (1, 0)))


def bn_init(c: int):
    return {
        "scale": jnp.ones((c,)),
        "bias": jnp.zeros((c,)),
        "mean": jnp.zeros((c,)),
        "var": jnp.ones((c,)),
    }


def bn_apply(x, p, *, eps: float, momentum: float, train: bool):
    """BatchNorm over NHWC (channel-last). Returns (y, updated_stats).

    Mixed-precision contract (the AMP-equivalent training path, reference
    engine.py:27-33): in TRAIN mode, batch statistics, the normalization,
    and the running-stat update are computed in float32 regardless of x's
    dtype — running stats stay f32 across hundreds of epochs — and the
    OUTPUT is cast back to x.dtype so a bfloat16 activation stream stays
    bfloat16 through the convs. For f32 inputs this is bit-identical to the
    plain formulation. EVAL mode computes in the ambient dtype: the bf16
    serving path casts stats to bf16 and must stay bf16 end-to-end —
    upcasting here measured -18% serving throughput (3,339 -> 2,750 img/s
    at B=128) by breaking the conv+bn+silu bf16 fusion."""
    if train:
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(0, 1, 2))
        var = jnp.var(xf, axis=(0, 1, 2))
        n = x.size / mean.size
        unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
        new = {
            "scale": p["scale"],
            "bias": p["bias"],
            "mean": (1 - momentum) * jnp.asarray(p["mean"], jnp.float32)
            + momentum * mean,
            "var": (1 - momentum) * jnp.asarray(p["var"], jnp.float32)
            + momentum * unbiased,
        }
        y = (xf - mean) * jax.lax.rsqrt(var + eps)
        y = y * p["scale"] + p["bias"]
        return y.astype(x.dtype), new
    y = (x - p["mean"]) * jax.lax.rsqrt(p["var"] + eps)
    return y * p["scale"] + p["bias"], p


def silu(x):
    return x * jax.nn.sigmoid(x)


def max_pool_same(x, k: int, stride: int = 1):
    """k x k max pool, stride s, SAME padding (NHWC). Dtype-generic: the
    identity is -inf for floats and the type minimum for integers (the int8
    quantized walk pools int8 directly — max commutes with the monotone
    quantizer)."""
    if jnp.issubdtype(x.dtype, jnp.floating):
        init = -jnp.inf
    else:
        init = jnp.asarray(jnp.iinfo(x.dtype).min, x.dtype)
    return jax.lax.reduce_window(
        x,
        init,
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

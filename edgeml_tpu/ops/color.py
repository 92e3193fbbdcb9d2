"""On-device colour jitter for the YOLOv5 training recipe.

The ultralytics recipe applies HSV jitter per image on the host
(augment_hsv; /root/reference/yolov5_scripts.md:9). On TPU that is the
wrong place: the jitter is pure elementwise math, so fused into the
training step it rides the existing HBM traffic for ~free, while on a
loader core it costs tens of ms per 640x640 image (the loader keeps only
the geometry: mosaic placement, affine window, flip). The host draws the
per-image gains from the same RNG stream as the host-side path
(data/yolo_aug.py hsv_gains), so device and host modes see identical
geometry and gain schedules.

Numerics mirror data/yolo_aug.py {_rgb_to_hsv, _hsv_to_rgb} in float32
(the NumPy host path applies gains in float64; difference is at float
rounding level, covered by tests/test_yolo_aug.py parity bounds).
"""

from __future__ import annotations

import jax.numpy as jnp


def hsv_jitter(images: jnp.ndarray, gains: jnp.ndarray) -> jnp.ndarray:
    """Apply per-image HSV gains to a batch of RGB images.

    :param images: (B, H, W, 3) float RGB in [0, 1].
    :param gains: (B, 3) multiplicative (h, s, v) gains
        (data/yolo_aug.py hsv_gains draws them as 1 + U(-1,1)*gain).
    :return: jittered images, same shape/dtype; hue wraps, s/v clip.
    """
    f = images.astype(jnp.float32)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    mx = jnp.max(f, axis=-1)
    mn = jnp.min(f, axis=-1)
    diff = mx - mn
    safe = jnp.where(diff == 0.0, 1.0, diff)
    h = jnp.where(
        mx == r, ((g - b) / safe) % 6.0,
        jnp.where(mx == g, (b - r) / safe + 2.0, (r - g) / safe + 4.0),
    )
    h = jnp.where(diff == 0.0, 0.0, h) / 6.0
    s = jnp.where(mx == 0.0, 0.0, diff / jnp.where(mx == 0.0, 1.0, mx))
    gn = gains.astype(jnp.float32)[:, None, None, :]
    h = (h * gn[..., 0]) % 1.0
    s = jnp.clip(s * gn[..., 1], 0.0, 1.0)
    v = jnp.clip(mx * gn[..., 2], 0.0, 1.0)
    h6 = (h % 1.0) * 6.0
    fl = jnp.floor(h6)
    i = fl.astype(jnp.int32) % 6
    fr = h6 - fl
    p = v * (1.0 - s)
    q = v * (1.0 - s * fr)
    t = v * (1.0 - s * (1.0 - fr))
    sel = [i == 0, i == 1, i == 2, i == 3, i == 4]
    out = jnp.stack(
        [
            jnp.select(sel, [v, q, p, p, t], v),
            jnp.select(sel, [t, v, v, q, p], p),
            jnp.select(sel, [p, p, t, v, v], q),
        ],
        axis=-1,
    )
    return out.astype(images.dtype)

"""YOLOv5 training loss in JAX (fixed-shape target assignment, CIoU, BCE).

The yolov5 objective the reference's detectors were trained with
(yolov5_scripts.md:5-11): per detection level, targets are assigned to the
matching anchor boxes (wh ratio < anchor_t) in the center cell plus up to two
neighbour cells; box regression uses 1 - CIoU, objectness is BCE against the
(detached) IoU, classification is BCE one-hot.

TPU formulation: the data-dependent candidate set (target x anchor x offset)
becomes a fixed (MAXT * na * 5) grid with validity masks; objectness targets
scatter with max-combine (the torch version's last-write-wins on duplicate
cells is order-dependent; max is deterministic and equivalent in expectation).

Hyper-parameters are the yolov5 defaults: box 0.05, cls 0.5, obj 1.0,
anchor_t 4.0, level balance (4.0, 1.0, 0.4), gr 1.0.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .yolov5 import STRIDES, YoloV5

HYP = dict(box=0.05, cls=0.5, obj=1.0, anchor_t=4.0)
BALANCE = (4.0, 1.0, 0.4)
_OFFSETS = jnp.asarray(
    [[0.0, 0.0], [-0.5, 0.0], [0.0, -0.5], [0.5, 0.0], [0.0, 0.5]]
)  # center, left, top, right, bottom (x, y)


def _bce(logits, targets):
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )


def _ciou(b1, b2, eps=1e-7):
    """Complete IoU between xywh-center boxes (..., 4)."""
    b1xy, b1wh = b1[..., :2], b1[..., 2:4]
    b2xy, b2wh = b2[..., :2], b2[..., 2:4]
    lo = jnp.maximum(b1xy - b1wh / 2, b2xy - b2wh / 2)
    hi = jnp.minimum(b1xy + b1wh / 2, b2xy + b2wh / 2)
    inter = jnp.prod(jnp.clip(hi - lo, 0.0, None), axis=-1)
    union = jnp.prod(b1wh, -1) + jnp.prod(b2wh, -1) - inter + eps
    iou = inter / union
    # enclosing box diagonal
    clo = jnp.minimum(b1xy - b1wh / 2, b2xy - b2wh / 2)
    chi = jnp.maximum(b1xy + b1wh / 2, b2xy + b2wh / 2)
    c2 = jnp.sum((chi - clo) ** 2, -1) + eps
    rho2 = jnp.sum((b1xy - b2xy) ** 2, -1)
    v = (4 / jnp.pi**2) * (
        jnp.arctan(b2wh[..., 0] / (b2wh[..., 1] + eps))
        - jnp.arctan(b1wh[..., 0] / (b1wh[..., 1] + eps))
    ) ** 2
    alpha = v / (v - iou + (1 + eps))
    alpha = jax.lax.stop_gradient(alpha)
    return iou - rho2 / c2 - alpha * v


def yolo_loss(
    net: YoloV5,
    heads,  # list of (B, H, W, na, no) raw outputs
    targets,  # (B, MAXT, 5) rows [cls, x, y, w, h] normalized
    target_valid,  # (B, MAXT) bool
):
    """Total loss (scalar) plus a dict of components, averaged like yolov5:
    per-level means, summed, scaled by batch size."""
    b, maxt = target_valid.shape
    na = net.na
    nc = net.num_classes
    lbox = lcls = lobj = 0.0

    for li, (head, stride, anchors) in enumerate(zip(heads, STRIDES, net.anchors)):
        _, gh, gw, _, _ = head.shape
        anc = jnp.asarray(anchors) / stride  # grid units (na, 2)
        # targets in grid units
        txy = targets[..., 1:3] * jnp.asarray([gw, gh])  # (B, T, 2)
        twh = targets[..., 3:5] * jnp.asarray([gw, gh])
        tcls = targets[..., 0].astype(jnp.int32)

        # anchor-ratio gate: (B, T, na)
        r = twh[:, :, None, :] / anc[None, None]
        ratio_ok = jnp.max(jnp.maximum(r, 1.0 / r), axis=-1) < HYP["anchor_t"]

        # neighbour-offset gate: (B, T, 5)
        fx, fy = txy[..., 0] % 1.0, txy[..., 1] % 1.0
        gx, gy = txy[..., 0], txy[..., 1]
        off_ok = jnp.stack(
            [
                jnp.ones_like(fx, bool),
                (fx < 0.5) & (gx > 1.0),
                (fy < 0.5) & (gy > 1.0),
                (fx >= 0.5) & (gx < gw - 1.0),
                (fy >= 0.5) & (gy < gh - 1.0),
            ],
            axis=-1,
        )

        # candidate grid: (B, T, na, 5)
        valid = (
            target_valid[:, :, None, None]
            & ratio_ok[:, :, :, None]
            & off_ok[:, :, None, :]
            & (jnp.sum(twh, -1) > 0)[:, :, None, None]
        )
        cell = jnp.floor(txy[:, :, None, None, :] - _OFFSETS)  # (B,T,1,5,2)
        gi = jnp.clip(cell[..., 0], 0, gw - 1).astype(jnp.int32)  # (B,T,1,5)
        gj = jnp.clip(cell[..., 1], 0, gh - 1).astype(jnp.int32)
        gi = jnp.broadcast_to(gi, valid.shape)
        gj = jnp.broadcast_to(gj, valid.shape)

        # gather predictions at candidates: flatten candidate axes
        bidx = jnp.broadcast_to(
            jnp.arange(b)[:, None, None, None], valid.shape
        )
        aidx = jnp.broadcast_to(jnp.arange(na)[None, None, :, None], valid.shape)
        p = head[bidx, gj, gi, aidx]  # (B, T, na, 5, no)

        pxy = jax.nn.sigmoid(p[..., 0:2]) * 2.0 - 0.5
        pwh = (jax.nn.sigmoid(p[..., 2:4]) * 2.0) ** 2 * anc[None, None, :, None, :]
        rel_xy = txy[:, :, None, None, :] - jnp.stack([gi, gj], -1)
        pbox = jnp.concatenate([pxy, pwh], -1)
        tbox = jnp.concatenate(
            [rel_xy, jnp.broadcast_to(twh[:, :, None, None, :], rel_xy.shape)], -1
        )
        iou = _ciou(pbox, tbox)
        vf = valid.astype(head.dtype)
        nv = jnp.maximum(jnp.sum(vf), 1.0)
        lbox = lbox + jnp.sum((1.0 - iou) * vf) / nv

        # objectness target: scatter detached IoU (max-combined)
        tobj = jnp.zeros((b, gh, gw, na), head.dtype)
        iou_pos = jnp.clip(jax.lax.stop_gradient(iou), 0.0, None) * vf
        tobj = tobj.at[bidx, gj, gi, aidx].max(iou_pos)
        lobj = lobj + jnp.mean(_bce(head[..., 4], tobj)) * BALANCE[li]

        if nc > 1:
            cls_t = jax.nn.one_hot(
                jnp.broadcast_to(tcls[:, :, None, None], valid.shape), nc,
                dtype=head.dtype,
            )
            lcls = lcls + jnp.sum(
                _bce(p[..., 5:], cls_t) * vf[..., None]
            ) / (nv * nc)

    total = (HYP["box"] * lbox + HYP["obj"] * lobj + HYP["cls"] * lcls) * b
    return total, {"box": lbox, "obj": lobj, "cls": lcls}

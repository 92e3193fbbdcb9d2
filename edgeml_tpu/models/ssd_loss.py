"""SSD multibox loss and postprocessing (fixed shapes, jittable).

Training/inference semantics per torchvision's SSD
(the engine behind the reference's train.py:16-18 and detect.py:78):
  * matcher: per-anchor best GT with IoU >= 0.5, plus every GT force-claims
    its single best anchor; unmatched anchors are background;
  * loss: smooth-L1 (beta=1) on matched regressions + cross-entropy with
    3:1 hard-negative mining, normalized by max(1, num_foreground);
  * postprocess: softmax scores, background column dropped, score threshold,
    class-aware NMS at 0.55, top 300 detections.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.metrics import box_iou_safe
from ..ops.nms import nms_split_batch


def match_anchors(anchors, gt_boxes, gt_valid, iou_thresh: float = 0.5):
    """SSDMatcher: per-anchor matched GT index or -1 (background).

    :param anchors: (A, 4) xyxy.
    :param gt_boxes: (M, 4) xyxy (padded).
    :param gt_valid: (M,) bool.
    :return: (A,) int32 in [-1, M).
    """
    iou = box_iou_safe(gt_boxes, anchors)  # (M, A)
    iou = jnp.where(gt_valid[:, None], iou, -1.0)
    best_gt = jnp.argmax(iou, axis=0)  # (A,)
    best_iou = jnp.max(iou, axis=0)
    matches = jnp.where(best_iou >= iou_thresh, best_gt, -1)
    # Force-match: each valid GT claims its best anchor.
    best_anchor = jnp.argmax(iou, axis=1)  # (M,)
    m = gt_boxes.shape[0]
    forced = jnp.full_like(matches, -1).at[best_anchor].set(
        jnp.where(gt_valid, jnp.arange(m), -1), mode="drop"
    )
    return jnp.where(forced >= 0, forced, matches)


def ssd_loss(net, cls_logits, reg, anchors, gt_boxes, gt_cls, gt_valid):
    """Multibox loss for a batch.

    :param cls_logits: (B, A, C); reg: (B, A, 4); anchors (A, 4) xyxy pixels.
    :param gt_boxes: (B, M, 4) xyxy pixels; gt_cls: (B, M) int (1-based,
        0 = background); gt_valid: (B, M) bool.
    """

    def one(cl, rg, gb, gc, gv):
        match = match_anchors(anchors, gb, gv)  # (A,)
        fg = match >= 0
        num_fg = jnp.sum(fg)
        midx = jnp.clip(match, 0, None)
        t_reg = net.encode_boxes(gb[midx], anchors)  # (A, 4)
        # smooth L1, beta = 1
        d = rg - t_reg
        ad = jnp.abs(d)
        sl1 = jnp.where(ad < 1.0, 0.5 * d * d, ad - 0.5)
        box_loss = jnp.sum(jnp.sum(sl1, -1) * fg)

        labels = jnp.where(fg, gc[midx], 0)  # (A,)
        logp = jax.nn.log_softmax(cl, axis=-1)
        ce = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]  # (A,)
        # hard negative mining 3:1 by loss rank
        neg_ce = jnp.where(fg, -jnp.inf, ce)
        order = jnp.argsort(-neg_ce)
        rank = jnp.zeros_like(order).at[order].set(jnp.arange(order.shape[0]))
        keep_neg = rank < 3 * num_fg
        cls_loss = jnp.sum(ce * (fg | keep_neg))
        return box_loss, cls_loss, num_fg

    box_l, cls_l, nfg = jax.vmap(one)(cls_logits, reg, gt_boxes, gt_cls, gt_valid)
    n = jnp.maximum(jnp.sum(nfg), 1).astype(cls_logits.dtype)
    total = (jnp.sum(box_l) + jnp.sum(cls_l)) / n
    return total, {
        "bbox_regression": jnp.sum(box_l) / n,
        "classification": jnp.sum(cls_l) / n,
    }


@partial(jax.jit, static_argnames=("net", "max_det", "nms_thresh"))
def ssd_postprocess(
    net,
    cls_logits,  # (B, A, C)
    reg,  # (B, A, 4)
    anchors,  # (A, 4)
    score_thresh: float = 0.001,
    nms_thresh: float = 0.55,
    max_det: int = 300,
):
    """Decode + score + class-aware NMS. Returns (dets (B, max_det, 6)
    [x1, y1, x2, y2, score, cls_id], valid). cls_id keeps the model's label
    space (background column dropped, ids start at 1)."""
    scores = jax.nn.softmax(cls_logits, axis=-1)[..., 1:]  # (B, A, C-1)
    boxes = net.decode_boxes(reg, anchors)  # (B, A, 4)
    boxes = jnp.clip(boxes, 0.0, net.image_size)

    # split NMS core with obj == 1 — avoids the packed (A, 5+C) tensor and
    # its strided minor-dim slices on TPU. Batched pool=False entry: exact
    # per-image pair ranking (same results as vmap(nms_split)) with the
    # fused Pallas suppressor on TPU (ops/nms.py nms_split_batch).
    xywh = jnp.concatenate(
        [
            (boxes[..., :2] + boxes[..., 2:4]) * 0.5,
            boxes[..., 2:4] - boxes[..., :2],
        ],
        axis=-1,
    )
    dets, valid = nms_split_batch(
        jnp.ones(scores.shape[:2], scores.dtype), xywh, scores,
        conf_thres=score_thresh,
        iou_thres=nms_thresh,
        max_det=max_det,
        max_cand=2048,
        multi_label=True,
        pool=False,
    )
    # class ids: NMS returns 0-based over the background-dropped columns.
    dets = dets.at[..., 5].add(jnp.where(valid, 1.0, 0.0))
    return dets, valid

"""Batched class-aware non-maximum suppression (fixed shapes, jittable).

The reference's NMS lives inside torchvision/ultralytics C++ (SURVEY.md
native-code ledger item 2). This is the TPU formulation: candidate selection
is one top_k over the (box, class) score matrix; suppression is an iterative
select-max / suppress-row loop of max_det steps — O(max_det * K) vector work
with no data-dependent shapes.

Semantics follow the yolov5 tooling that produced the reference's detection
files: confidence = objectness * class probability, candidates gated by
conf > conf_thres, multi-label (one candidate per (box, class) pair),
class-aware IoU via per-class box offsets, strict-greater suppression at
iou_thres, at most max_det survivors ordered by confidence.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

MAX_WH = 7680.0  # class-offset stride, matches the yolov5 convention


def _iou_one_vs_many(box, boxes):
    """IoU of one xyxy box against (K, 4) boxes."""
    lo = jnp.maximum(box[:2], boxes[:, :2])
    hi = jnp.minimum(box[2:4], boxes[:, 2:4])
    inter = jnp.prod(jnp.maximum(hi - lo, 0.0), axis=-1)
    a = jnp.prod(jnp.maximum(box[2:4] - box[:2], 0.0))
    b = jnp.prod(jnp.maximum(boxes[:, 2:4] - boxes[:, :2], 0.0), axis=-1)
    return inter / jnp.maximum(a + b - inter, 1e-12)


@partial(jax.jit, static_argnames=("max_det", "max_cand", "iou_thres"))
def nms_rows(
    boxes: jax.Array,  # (N, 4) xyxy
    scores: jax.Array,  # (N,) — entries <= 0 are ignored
    cls_ids: jax.Array,  # (N,) float class ids (for class-aware offsets)
    iou_thres: float = 0.5,
    max_det: int = 300,
    max_cand: int = 2048,
) -> tuple:
    """Class-aware greedy NMS over pre-scored (box, class) rows.

    Returns (dets (max_det, 6) [x1, y1, x2, y2, score, cls], valid).
    """
    k = min(max_cand, scores.shape[0])
    top_scores, top_idx = jax.lax.top_k(jnp.where(scores > 0, scores, -1.0), k)
    cand_boxes = boxes[top_idx]
    cand_cls = cls_ids[top_idx]
    off_boxes = cand_boxes + cand_cls[:, None] * MAX_WH

    def body(i, carry):
        alive, out = carry
        s = jnp.where(alive, top_scores, -jnp.inf)
        j = jnp.argmax(s)
        ok = s[j] > 0.0
        row = jnp.where(
            ok,
            jnp.concatenate(
                [cand_boxes[j], top_scores[j, None], cand_cls[j, None]]
            ),
            jnp.zeros((6,), boxes.dtype),
        )
        out = out.at[i].set(row)
        iou = _iou_one_vs_many(off_boxes[j], off_boxes)
        alive = alive & (iou <= iou_thres) & ok
        return alive, out

    out0 = jnp.zeros((max_det, 6), boxes.dtype)
    _, out = jax.lax.fori_loop(0, max_det, body, (top_scores > 0.0, out0))
    return out, out[:, 4] > 0.0


@partial(
    jax.jit,
    static_argnames=("max_det", "max_cand", "multi_label", "iou_thres"),
)
def non_max_suppression(
    pred: jax.Array,
    conf_thres: float = 0.001,
    iou_thres: float = 0.6,
    max_det: int = 300,
    max_cand: int = 1024,
    multi_label: bool = True,
) -> tuple:
    """NMS for one image's decoded predictions.

    :param pred: (N, 5 + nc) rows [x, y, w, h, obj, cls...] in pixels
        (xywh-center, the decode() output).
    :param conf_thres: candidate confidence gate.
    :param iou_thres: suppression IoU (strictly greater suppresses).
    :param max_det: survivors returned.
    :param max_cand: candidate pool entering suppression (top by confidence).
    :param multi_label: one candidate per (box, class) over the gate, like
        yolov5 val; False keeps only each box's best class.
    :return: (dets (max_det, 6) [x1, y1, x2, y2, conf, cls], valid (max_det,)).

    vmap over images for batches.
    """
    n, no = pred.shape
    nc = no - 5
    obj = pred[:, 4]
    boxes_xy = pred[:, :2]
    boxes_wh = pred[:, 2:4]
    half = boxes_wh * 0.5
    xyxy = jnp.concatenate([boxes_xy - half, boxes_xy + half], axis=1)

    gate = obj > conf_thres
    if multi_label and nc > 1:
        # Two-stage candidate selection: a (box, class)-pair top_k over the
        # full N*nc score matrix is the dominant cost at YOLO sizes
        # (25200 x 80 = 2M entries). The final confidence obj*cls is bounded
        # by obj, so the top max_cand PAIRS all live inside the top max_cand
        # BOXES by objectness: pre-select those (top_k over N), then rank
        # pairs inside the reduced (max_cand, nc) matrix. Exact, ~25x less
        # sort traffic.
        kb = min(max_cand, n)
        obj_top, box_pre = jax.lax.top_k(jnp.where(gate, obj, -1.0), kb)
        cls_conf = pred[box_pre, 5:] * obj_top[:, None]  # (kb, nc)
        scores_flat = jnp.where(
            (obj_top[:, None] > 0) & (cls_conf > conf_thres), cls_conf, -1.0
        ).reshape(-1)
        k = min(max_cand, scores_flat.shape[0])
        top_scores, top_idx = jax.lax.top_k(scores_flat, k)
        box_idx = box_pre[top_idx // nc]
        cls_idx = (top_idx % nc).astype(jnp.float32)
    else:
        cls_conf = pred[:, 5:] * obj[:, None]  # (N, nc)
        best_cls = jnp.argmax(cls_conf, axis=1)
        best_conf = jnp.max(cls_conf, axis=1)
        scores = jnp.where(gate & (best_conf > conf_thres), best_conf, -1.0)
        k = min(max_cand, n)
        top_scores, box_idx = jax.lax.top_k(scores, k)
        cls_idx = best_cls[box_idx].astype(jnp.float32)

    cand_boxes = xyxy[box_idx]
    # Suppression runs in the fused Pallas kernel (ops/nms_pallas.py) — the
    # XLA fori formulation round-trips HBM every iteration and is ~5000x
    # slower on TPU for K=2048.
    from .nms_pallas import nms_pallas

    return nms_pallas(
        cand_boxes, top_scores, cls_idx, iou_thres=iou_thres, max_det=max_det
    )

"""Faster R-CNN training losses: RPN objectness/regression + ROI head loss.

Torchvision semantics (the engine behind the reference's train.py:17):
  * RPN: matcher 0.7/0.3 with low-quality matches, balanced sampling of 256
    anchors per image at 50% positive fraction, BCE objectness + smooth-L1
    (beta 1/9) regression on positives, box coder (1, 1, 1, 1);
  * ROI heads: proposals (plus the GT boxes appended) matched at 0.5,
    balanced sampling of 512 at 25% positives, cross-entropy classification
    + per-class smooth-L1 regression on positives, box coder (10, 10, 5, 5).

Fixed-shape sampling: instead of torch's randperm-based subset, each
candidate gets a random key and the top-k keys within the positive/negative
pools are selected — same marginal distribution, no dynamic shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.metrics import box_iou_safe
from .faster_rcnn import FasterRCNN, _decode, _encode
from .retinanet import retina_match


def _sample_balanced(key, pos_mask, neg_mask, num_samples, pos_fraction):
    """Select up to num_samples entries, pos_fraction positive, uniformly at
    random, fixed output width. Returns (idx (num_samples,), weight (num_samples,))
    where weight is 0 for padding slots."""
    n = pos_mask.shape[0]
    kp, kn = jax.random.split(key)
    num_pos_want = min(int(num_samples * pos_fraction), n)
    num_neg_want = min(num_samples - num_pos_want, n)
    pos_rank = jnp.where(pos_mask, jax.random.uniform(kp, (n,)), -1.0)
    neg_rank = jnp.where(neg_mask, jax.random.uniform(kn, (n,)), -1.0)
    pos_score, pos_idx = jax.lax.top_k(pos_rank, num_pos_want)
    n_pos = jnp.sum(pos_mask)
    pos_w = (jnp.arange(num_pos_want) < jnp.minimum(n_pos, num_pos_want)).astype(
        jnp.float32
    )
    # negatives fill the remainder (torch: num_neg = num_samples - actual pos)
    neg_score, neg_idx = jax.lax.top_k(neg_rank, num_neg_want)
    n_neg = jnp.sum(neg_mask)
    neg_keep = jnp.minimum(n_neg, num_neg_want)
    neg_w = (jnp.arange(num_neg_want) < neg_keep).astype(jnp.float32)
    return (
        jnp.concatenate([pos_idx, neg_idx]),
        jnp.concatenate([pos_w, neg_w]),
        jnp.concatenate([pos_w, jnp.zeros_like(neg_w)]),  # positive indicator
    )


def _smooth_l1(d, beta):
    ad = jnp.abs(d)
    return jnp.where(ad < beta, 0.5 * ad * ad / beta, ad - 0.5 * beta)


def rpn_loss(key, obj_logits, deltas, anchors, gt_boxes, gt_valid):
    """One image. obj_logits (A,), deltas (A, 4), anchors (A, 4)."""
    match = retina_match(anchors, gt_boxes, gt_valid, hi=0.7, lo=0.3)
    pos = match >= 0
    neg = match == -1
    idx, w, pos_w = _sample_balanced(key, pos, neg, 256, 0.5)
    labels = pos[idx].astype(obj_logits.dtype)
    lo = obj_logits[idx]
    bce = jnp.maximum(lo, 0) - lo * labels + jnp.log1p(jnp.exp(-jnp.abs(lo)))
    denom = jnp.maximum(jnp.sum(w), 1.0)
    obj_l = jnp.sum(bce * w) / denom

    midx = jnp.clip(match, 0, None)
    t_reg = _encode(gt_boxes[midx], anchors, (1.0, 1.0, 1.0, 1.0))
    reg_l = jnp.sum(
        jnp.sum(_smooth_l1(deltas[idx] - t_reg[idx], 1.0 / 9.0), -1) * pos_w
    ) / denom
    return obj_l, reg_l


def roi_head_loss(net: FasterRCNN, key, params, feats, proposals, prop_valid,
                  gt_boxes, gt_cls, gt_valid):
    """One image. proposals (P, 4); gt_cls 1-based (0 = background)."""
    # append GT boxes to the proposal set (torchvision does)
    m = gt_boxes.shape[0]
    boxes = jnp.concatenate([proposals, gt_boxes])
    bvalid = jnp.concatenate([prop_valid, gt_valid])

    iou = box_iou_safe(gt_boxes, boxes)
    iou = jnp.where(gt_valid[:, None] & bvalid[None, :], iou, -1.0)
    best_gt = jnp.argmax(iou, axis=0)
    best_iou = jnp.max(iou, axis=0)
    matched = best_iou >= 0.5
    pos = matched & bvalid
    neg = (~matched) & bvalid & (best_iou >= 0.0)

    idx, w, pos_w = _sample_balanced(key, pos, neg, 512, 0.25)
    sel_boxes = boxes[idx]
    midx = best_gt[idx]
    labels = jnp.where(pos[idx], gt_cls[midx], 0)

    # chunked RoIAlign: the training pyramid is f32 and the backward pass
    # doubles the live bilinear expansion (faster_rcnn.ROI_CHUNK_TRAIN)
    from .faster_rcnn import ROI_CHUNK_TRAIN

    cls_logits, reg = net.run_box_head(
        params, feats, sel_boxes, chunk=ROI_CHUNK_TRAIN
    )
    # AMP: head outputs may be bf16 — all loss math stays f32 (no-op when
    # the walk already runs f32)
    cls_logits = cls_logits.astype(jnp.float32)
    reg = reg.astype(jnp.float32)
    logp = jax.nn.log_softmax(cls_logits, -1)
    ce = -jnp.take_along_axis(logp, labels[:, None], 1)[:, 0]
    denom = jnp.maximum(jnp.sum(w), 1.0)
    cls_l = jnp.sum(ce * w) / denom

    t_reg = _encode(gt_boxes[midx], sel_boxes, (10.0, 10.0, 5.0, 5.0))
    # per-class regression: gather the matched class's 4 deltas
    cls_idx = jnp.clip(labels, 0, None)
    reg_sel = jnp.take_along_axis(
        reg, cls_idx[:, None, None].repeat(4, -1), axis=1
    )[:, 0]
    npos = jnp.maximum(jnp.sum(pos_w), 1.0)
    reg_l = jnp.sum(jnp.sum(_smooth_l1(reg_sel - t_reg, 1.0), -1) * pos_w) / denom
    return cls_l, reg_l


def faster_rcnn_loss(net: FasterRCNN, key, params, images, anchors_per_level,
                     gt_boxes, gt_cls, gt_valid, dtype=None):
    """Full two-stage training loss for a batch. gt_boxes (B, M, 4) pixels,
    gt_cls (B, M) 1-based, gt_valid (B, M).

    dtype: optional AMP compute dtype (jnp.bfloat16) — the same boundaries
    as FasterRCNN.detect's serving knob: backbone, RPN head, RoIAlign
    gathers and box head run in `dtype`; every decision stage (proposal
    decode/top-k/NMS, matching, balanced sampling, box encode, the losses)
    stays float32. Called under value_and_grad, the cast happens inside the
    differentiated function, so master weights and gradients remain f32 —
    the reference engine's AMP-optional path (references/engine.py:27-43)."""
    if dtype is not None:
        params = jax.tree_util.tree_map(
            lambda a: a.astype(dtype)
            if getattr(a, "dtype", None) == jnp.float32 else a, params)
        images = images.astype(dtype)
    feats = net.backbone.apply(params["backbone"], images)
    rpn_outs = net.run_rpn(params, feats)
    if dtype is not None:
        # proposal decode + RPN loss math in f32 (decision stages)
        rpn_outs = [
            (c.astype(jnp.float32), r.astype(jnp.float32))
            for c, r in rpn_outs
        ]
    anchors = jnp.concatenate(anchors_per_level)
    obj_all = jnp.concatenate([c for c, _ in rpn_outs], axis=1)  # (B, A)
    reg_all = jnp.concatenate([r for _, r in rpn_outs], axis=1)  # (B, A, 4)
    prop_fn = net.proposals(rpn_outs, anchors_per_level, post_nms=net.rpn_post_nms)

    b = images.shape[0]
    keys = jax.random.split(key, 2 * b)
    tot = {"rpn_obj": 0.0, "rpn_reg": 0.0, "cls": 0.0, "reg": 0.0}
    for bi in range(b):
        o, r = rpn_loss(
            keys[2 * bi], obj_all[bi], reg_all[bi], anchors,
            gt_boxes[bi], gt_valid[bi],
        )
        bi_levels = [(c[bi], rg[bi]) for c, rg in rpn_outs]
        props, pvalid = prop_fn(bi_levels)
        props = jax.lax.stop_gradient(props)
        cl, rl = roi_head_loss(
            net, keys[2 * bi + 1], params, [f[bi] for f in feats[:4]],
            props, pvalid, gt_boxes[bi], gt_cls[bi], gt_valid[bi],
        )
        tot["rpn_obj"] += o / b
        tot["rpn_reg"] += r / b
        tot["cls"] += cl / b
        tot["reg"] += rl / b
    total = tot["rpn_obj"] + tot["rpn_reg"] + tot["cls"] + tot["reg"]
    return total, tot

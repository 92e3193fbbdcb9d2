"""Fine-grained ablation of Faster R-CNN RPN proposal selection.

exp_rcnn located the R-CNN wall at "+proposals" (+136 ms of a 175 ms B=8
step). This splits that stage into its internals, cumulatively inside ONE
jit per stage (chained scalar accumulator, float() fetch — CLAUDE.md
measurement rules), so the differences attribute the cost:

  0 backbone+FPN+RPN head                  (exp_rcnn stage 1 baseline)
  1 + per-level topk1d (pre-NMS top-1000)
  2 + gather reg/anchors + decode + clip
  3 + suppress_mask's sort (top_k k over k)
  4 + IoU/sup matrix build + ONE fixpoint body pass (no while_loop)
  5 + full fixpoint while_loop (== production suppress_mask)
  6 + global concat/top_k/gather (== full proposals, exp_rcnn stage 2)

    python tools/exp_rcnn2.py [B] [iters] [stages...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from edgeml_tpu.models.faster_rcnn import FasterRCNN, _decode, rpn_anchors
from edgeml_tpu.ops.nms import greedy_keep_mask, suppress_mask, topk1d
from edgeml_tpu.utils.synth import hash_uniform

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 8

net = FasterRCNN()
params = net.init(jax.random.PRNGKey(0))
anchors = [jnp.asarray(a) for a in rpn_anchors(net.image_size)]
PRE_NMS = 1000
NMS_THRESH = 0.7


def stage_pipeline(upto):
    def fn(acc, seed):
        imgs = hash_uniform(seed, (B, 640, 640, 3))
        feats = net.backbone.apply(params["backbone"], imgs)
        rpn_outs = net.run_rpn(params, feats)
        if upto == 0:
            return acc + sum(
                c.sum() * 1e-9 + r.sum() * 1e-12 for c, r in rpn_outs
            )

        def one_image(level_data):
            out = jnp.zeros(())
            cand_boxes, cand_scores = [], []
            for (cls, reg), anc in zip(level_data, anchors):
                k = min(PRE_NMS, cls.shape[0])
                scores, idx = topk1d(cls, k)
                if upto == 1:
                    out += scores.sum() * 1e-9 + idx.sum() * 1e-12
                    continue
                boxes = _decode(reg[idx], anc[idx], (1.0, 1.0, 1.0, 1.0))
                boxes = jnp.clip(boxes, 0.0, net.image_size)
                ok = (boxes[:, 2] - boxes[:, 0] > 1e-3) & (
                    boxes[:, 3] - boxes[:, 1] > 1e-3
                )
                scores = jnp.where(ok, scores, -jnp.inf)
                if upto == 2:
                    out += boxes.sum() * 1e-12 + scores.sum() * 1e-9
                    continue
                p = jnp.where(jnp.isfinite(scores), jax.nn.sigmoid(scores), 0.0)
                if upto in (3, 4):
                    kk = p.shape[0]
                    order_scores, order = jax.lax.top_k(
                        jnp.where(p > 0, p, -1.0), kk
                    )
                    if upto == 3:
                        out += order_scores.sum() * 1e-9 + order.sum() * 1e-12
                        continue
                    # one fixpoint body pass: sup build + one matvec
                    sb = boxes[order]
                    x1, y1, x2, y2 = (sb[:, i] for i in range(4))
                    ix = jnp.minimum(x2[:, None], x2[None, :]) - jnp.maximum(
                        x1[:, None], x1[None, :]
                    )
                    iy = jnp.minimum(y2[:, None], y2[None, :]) - jnp.maximum(
                        y1[:, None], y1[None, :]
                    )
                    inter = jnp.maximum(ix, 0.0) * jnp.maximum(iy, 0.0)
                    area = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)
                    iou = inter / jnp.maximum(
                        area[:, None] + area[None, :] - inter, 1e-12
                    )
                    row = jax.lax.broadcasted_iota(jnp.int32, (kk, kk), 0)
                    col = jax.lax.broadcasted_iota(jnp.int32, (kk, kk), 1)
                    sup = ((iou > NMS_THRESH) & (col < row)).astype(jnp.int8)
                    valid = order_scores > 0.0
                    hit = jnp.matmul(
                        sup, valid.astype(jnp.int8),
                        preferred_element_type=jnp.int32,
                    )
                    out += (valid & (hit == 0)).sum() * 1e-9
                    continue
                kept = suppress_mask(boxes, p, NMS_THRESH, p.shape[0])
                keep_scores = jnp.where(kept, p, -jnp.inf)
                if upto == 5:
                    out += keep_scores.sum() * 1e-9
                    continue
                cand_boxes.append(boxes)
                cand_scores.append(keep_scores)
            if upto < 6:
                return out
            all_boxes = jnp.concatenate(cand_boxes)
            all_scores = jnp.concatenate(cand_scores)
            top_scores, top_idx = jax.lax.top_k(
                all_scores, min(net.rpn_post_nms, all_scores.shape[0])
            )
            return (
                all_boxes[top_idx].sum() * 1e-12
                + (top_scores > -jnp.inf).sum() * 1e-9
            )

        return acc + jax.vmap(one_image)(rpn_outs).sum()

    return fn


prev = 0.0
for st in ([int(a) for a in sys.argv[3:]] or range(7)):
    step = jax.jit(stage_pipeline(st))
    t0 = time.perf_counter()
    float(step(jnp.zeros(()), 0))
    print(f"stage {st}: warmup {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    acc = jnp.zeros(())
    for i in range(ITERS):
        acc = step(acc, 1 + i)
    float(acc)
    ms = (time.perf_counter() - t0) / ITERS * 1e3
    print(
        f"stage {st}: {ms:8.2f} ms/batch  (+{ms - prev:7.2f})  "
        f"{B / ms * 1e3:7.2f} img/s",
        flush=True,
    )
    prev = ms

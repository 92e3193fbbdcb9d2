"""Single-launch ablation of the Faster R-CNN serving pipeline.

Same methodology as exp_ablate.py (CLAUDE.md measurement rules): per-launch
dispatch overhead is variable, so build CUMULATIVE variants of the full
pipeline inside one jit each, chain launches through a scalar accumulator,
and difference the steady-state times.

Stages:
  0 backbone+FPN        1 +RPN head           2 +proposal selection
  3 +RoIAlign           4 +box head           5 +postprocess NMS (full)

    python tools/exp_rcnn.py [B] [iters] [f32|bf16] [stages...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from edgeml_tpu.models.faster_rcnn import (
    FasterRCNN, roi_align_fpn, rpn_anchors, _decode,
)
from edgeml_tpu.ops.nms import nms_rows
from edgeml_tpu.utils.synth import hash_uniform

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 4
DT = jnp.bfloat16 if (len(sys.argv) > 3 and sys.argv[3] == "bf16") else None
STAGES = [int(a) for a in sys.argv[4:]] or list(range(6))

net = FasterRCNN(num_classes=91)
params = net.init(jax.random.PRNGKey(0))
anchors = [jnp.asarray(a) for a in rpn_anchors(net.image_size)]
S = net.image_size


def tsum(t):
    return sum(jnp.sum(x) * 1e-9 for x in jax.tree_util.tree_leaves(t))


def stage_pipeline(upto):
    def fn(acc, seed):
        imgs = hash_uniform(seed, (B, S, S, 3))
        p = params
        if DT is not None:
            p = jax.tree_util.tree_map(
                lambda a: a.astype(DT) if a.dtype == jnp.float32 else a, params
            )
            imgs = imgs.astype(DT)
        feats = net.backbone.apply(p["backbone"], imgs)
        if upto == 0:
            return acc + tsum(feats)
        rpn_outs = net.run_rpn({"rpn": p["rpn"]}, feats)
        if upto == 1:
            return acc + tsum(rpn_outs)
        rpn32 = [(c.astype(jnp.float32), r.astype(jnp.float32))
                 for c, r in rpn_outs]
        prop_fn = net.proposals(rpn32, anchors)
        boxes, valid = jax.vmap(prop_fn)(rpn32)
        if upto == 2:
            return acc + tsum((boxes, valid))
        feats32 = [f.astype(jnp.float32) for f in feats[:4]]
        pooled = jax.vmap(
            lambda fs, bx: roi_align_fpn(fs, bx, S)
        )(list(feats32), boxes)
        if upto == 3:
            return acc + tsum(pooled)

        def head(pool1):
            h = pool1
            for cp in params["box_head"]["convs"]:
                from edgeml_tpu.models.common import conv2d
                h = jax.nn.relu(
                    conv2d(h, cp["w"], 1, padding=((1, 1), (1, 1))) + cp["b"]
                )
            h = h.reshape(h.shape[0], -1)
            h = jax.nn.relu(h @ params["box_head"]["fc"]["w"]
                            + params["box_head"]["fc"]["b"])
            cls = h @ params["box_head"]["cls"]["w"] + params["box_head"]["cls"]["b"]
            reg = h @ params["box_head"]["reg"]["w"] + params["box_head"]["reg"]["b"]
            return cls, reg.reshape(-1, net.num_classes, 4)

        cls, reg = jax.vmap(head)(pooled)
        if upto == 4:
            return acc + tsum((cls, reg))

        def post(cls1, reg1, boxes1, valid1):
            scores = jax.nn.softmax(cls1, -1)[:, 1:]
            deltas = reg1[:, 1:, :]
            dec = _decode(deltas, boxes1[:, None, :], (10.0, 10.0, 5.0, 5.0))
            dec = jnp.clip(dec, 0.0, S)
            scores = jnp.where(valid1[:, None], scores, 0.0)
            nc = scores.shape[1]
            flat_scores = jnp.where(scores > 0.05, scores, 0.0).reshape(-1)
            flat_cls = jnp.tile(jnp.arange(nc, dtype=dec.dtype), scores.shape[0])
            dets, dvalid = nms_rows(
                dec.reshape(-1, 4), flat_scores, flat_cls,
                iou_thres=0.5, max_det=net.detections_per_img,
            )
            return dets, dvalid

        dets, dvalid = jax.vmap(post)(cls, reg, boxes, valid)
        return acc + tsum((dets, dvalid))

    return fn


prev = 0.0
for st in STAGES:
    step = jax.jit(stage_pipeline(st))
    t0 = time.perf_counter()
    acc = step(jnp.zeros(()), 0)
    acc.block_until_ready()
    print(f"stage {st}: warmup {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for i in range(ITERS):
        acc = step(acc, 1 + i)
    acc.block_until_ready()
    ms = (time.perf_counter() - t0) / ITERS * 1e3
    print(
        f"stage {st}: {ms:8.2f} ms/batch  (+{ms - prev:7.2f})  "
        f"{B / ms * 1e3:7.1f} img/s",
        flush=True,
    )
    prev = ms

"""Cumulative ablation of Faster R-CNN serving at B images (one jit per
stage, chained scalar accumulator, float() fetch — CLAUDE.md measurement
rules).

Stages: 0 backbone+FPN | 1 +RPN head | 2 +proposal selection | 3 +RoIAlign
        4 +box head | 5 full detect (+per-class decode & NMS)

    python tools/exp_rcnn.py [B] [iters] [stages...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from edgeml_tpu.models.faster_rcnn import FasterRCNN, roi_align_fpn, rpn_anchors
from edgeml_tpu.utils.synth import hash_uniform

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 8

net = FasterRCNN()
params = net.init(jax.random.PRNGKey(0))
anchors = [jnp.asarray(a) for a in rpn_anchors(net.image_size)]


def stage_pipeline(upto):
    def fn(acc, seed):
        imgs = hash_uniform(seed, (B, 640, 640, 3))
        feats = net.backbone.apply(params["backbone"], imgs)
        if upto == 0:
            return acc + sum(f.sum() for f in feats) * 1e-9
        rpn_outs = net.run_rpn(params, feats)
        if upto == 1:
            return acc + sum(
                c.sum() * 1e-9 + r.sum() * 1e-12 for c, r in rpn_outs
            )
        prop_fn = net.proposals(rpn_outs, anchors)

        def sel(bi_levels):
            return prop_fn(bi_levels)

        boxes, valid = jax.vmap(sel)(rpn_outs)
        if upto == 2:
            return acc + boxes.sum() * 1e-12 + valid.sum() * 1e-9

        def pool_one(bi_feats, bx):
            return roi_align_fpn(bi_feats, bx, net.image_size)

        pooled = jax.vmap(pool_one)(list(feats[:4]), boxes)
        if upto == 3:
            return acc + pooled.sum() * 1e-12

        def head_one(pl_, ):
            h = pl_
            from edgeml_tpu.models.common import conv2d
            for cp in params["box_head"]["convs"]:
                h = jax.nn.relu(
                    conv2d(h, cp["w"], 1, padding=((1, 1), (1, 1))) + cp["b"]
                )
            h = h.reshape(h.shape[0], -1)
            h = jax.nn.relu(
                h @ params["box_head"]["fc"]["w"]
                + params["box_head"]["fc"]["b"]
            )
            cls = h @ params["box_head"]["cls"]["w"] \
                + params["box_head"]["cls"]["b"]
            reg = h @ params["box_head"]["reg"]["w"] \
                + params["box_head"]["reg"]["b"]
            return cls, reg

        cls, reg = jax.vmap(head_one)(pooled)
        if upto == 4:
            return acc + cls.sum() * 1e-9 + reg.sum() * 1e-12
        dt = jnp.bfloat16 if upto == 6 else None
        dets, dvalid = net.detect(params, imgs, anchors, dtype=dt)
        return acc + dets.sum() * 1e-9 + dvalid.sum() * 1e-9

    return fn


prev = 0.0
for st in ([int(a) for a in sys.argv[3:]] or range(6)):
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

"""RoIAlign gather-layout A/B on the Faster R-CNN serving step.

exp_rcnn (r4j re-run) relocated the R-CNN wall: +RoIAlign is 136.0 ms of
the 174.8 ms B=8 step (78%) — NOT RPN proposal selection (the r4a PERF
entry misread the stage labels; the proposal fixpoint adds ~1.6 ms). The
corner form does 4 gathers of one 256-wide row per bilinear corner (3,136
rows/proposal); the patch form (models/faster_rcnn.py ROI_GATHER="patch")
does ONE lax.gather of (2, 2, C) patches — same bytes, 16x fewer rows.

Measures the +RoIAlign cumulative stage and the FULL detect step under
both layouts (chained accumulator, float() fetch).

    python tools/exp_roialign.py [B] [iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

import edgeml_tpu.models.faster_rcnn as fr
from edgeml_tpu.models.faster_rcnn import FasterRCNN, roi_align_fpn, rpn_anchors
from edgeml_tpu.utils.synth import hash_uniform

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 8

net = FasterRCNN()
params = net.init(jax.random.PRNGKey(0))
anchors = [jnp.asarray(a) for a in rpn_anchors(net.image_size)]


def roialign_step(acc, seed):
    imgs = hash_uniform(seed, (B, 640, 640, 3))
    feats = net.backbone.apply(params["backbone"], imgs)
    rpn_outs = net.run_rpn(params, feats)
    prop_fn = net.proposals(rpn_outs, anchors)
    boxes, valid = jax.vmap(prop_fn)(rpn_outs)
    pooled = jax.vmap(
        lambda bf, bx: roi_align_fpn(bf, bx, net.image_size)
    )(list(feats[:4]), boxes)
    return acc + pooled.sum() * 1e-12 + valid.sum() * 1e-9


def detect_step(acc, seed):
    imgs = hash_uniform(seed, (B, 640, 640, 3))
    dets, dvalid = net.detect(params, imgs, anchors)
    return acc + dets.sum() * 1e-9 + dvalid.sum() * 1e-9


def run(tag, fn):
    step = jax.jit(fn)
    t0 = time.perf_counter()
    float(step(jnp.zeros(()), 0))
    print(f"{tag}: warmup {time.perf_counter() - t0:.1f}s", flush=True)
    acc = jnp.zeros(())
    t0 = time.perf_counter()
    for i in range(ITERS):
        acc = step(acc, 1 + i)
    float(acc)
    ms = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{tag}: {ms:8.2f} ms/batch  {B / ms * 1e3:8.2f} img/s", flush=True)


for mode in ("corner", "patch"):
    fr.ROI_GATHER = mode
    run(f"+RoIAlign {mode}", lambda a, s: roialign_step(a, s))
for mode in ("corner", "patch"):
    fr.ROI_GATHER = mode
    run(f"full detect {mode}", lambda a, s: detect_step(a, s))

"""Blocked-greedy NMS fixpoint A/B on the R-CNN RPN proposal stage.

exp_rcnn2 attributed essentially the whole +136 ms proposal cost (B=8) to
the global fixpoint while_loop (sup build + ONE pass is +0.33 ms; the loop
re-reads the (K, K) matrix once per suppression-chain link). This measures
ops/nms.py NMS_BLOCK over the proposal-selection stage (backbone + RPN +
per-level NMS + global top-k, exp_rcnn stage 2), then the FULL detect step
at the winning block size.

    python tools/exp_nmsblock.py [B] [iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from edgeml_tpu.models.faster_rcnn import FasterRCNN, rpn_anchors
from edgeml_tpu.ops import nms
from edgeml_tpu.utils.synth import hash_uniform

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 8

net = FasterRCNN()
params = net.init(jax.random.PRNGKey(0))
anchors = [jnp.asarray(a) for a in rpn_anchors(net.image_size)]


def proposals_step(acc, seed):
    imgs = hash_uniform(seed, (B, 640, 640, 3))
    feats = net.backbone.apply(params["backbone"], imgs)
    rpn_outs = net.run_rpn(params, feats)
    prop_fn = net.proposals(rpn_outs, anchors)
    boxes, valid = jax.vmap(prop_fn)(rpn_outs)
    return acc + boxes.sum() * 1e-12 + valid.sum() * 1e-9


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
    return ms


results = {}
for blk in (None, 512, 256, 128):
    nms.NMS_BLOCK = blk
    # trace-time knob: new closure per setting so jit re-traces
    results[blk] = run(f"proposals NMS_BLOCK={blk}",
                       lambda a, s: proposals_step(a, s))

best = min((m, b) for b, m in results.items() if b is not None)[1]
print(f"best block: {best}", flush=True)
for blk in (None, best):
    nms.NMS_BLOCK = blk
    # the second-stage tail goes through module-level-jitted nms_rows whose
    # trace cache is keyed on avals — clear so the knob actually re-traces
    nms.nms_rows.clear_cache()
    run(f"full detect NMS_BLOCK={blk}", lambda a, s: detect_step(a, s))

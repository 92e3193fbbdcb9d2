"""Round-5e RoIAlign levers: ROI_W16 (bf16 bilinear weighting over the
bf16 pyramid — halves the expansion-intermediate traffic) and ROI_CHUNK
(proposals per lax.map step) on the FULL Faster R-CNN detect step, at the
r5d-best base config (ROI_GATHER="patch", ROI_PYR="bf16" for f32 serving).
Chained accumulator, float() fetch.

    python tools/exp_roialign4.py [B] [iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

import edgeml_tpu.models.faster_rcnn as fr
from edgeml_tpu.models.faster_rcnn import FasterRCNN, rpn_anchors
from edgeml_tpu.utils.synth import hash_uniform

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 8

net = FasterRCNN()
params = net.init(jax.random.PRNGKey(0))
anchors = [jnp.asarray(a) for a in rpn_anchors(net.image_size)]


def run(tag, dtype):
    @jax.jit
    def step(acc, seed):
        imgs = hash_uniform(seed, (B, 640, 640, 3))
        dets, dvalid = net.detect(params, imgs, anchors, dtype=dtype)
        return acc + dets.sum() * 1e-9 + dvalid.sum() * 1e-9

    t0 = time.perf_counter()
    float(step(jnp.zeros(()), 0))
    print(f"{tag}: warmup {time.perf_counter() - t0:.1f}s", flush=True)
    acc = jnp.zeros(())
    t0 = time.perf_counter()
    for i in range(ITERS):
        acc = step(acc, 1 + i)
    a = float(acc)
    ms = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{tag}: {ms:8.2f} ms/batch  {B / ms * 1e3:8.2f} img/s  "
          f"acc {a:.6f}", flush=True)


fr.ROI_GATHER = "patch"
ARMS = [
    ("f32", None, False, 128),
    ("f32", None, True, 128),
    ("f32", None, True, 256),
    ("f32", None, True, 512),
    ("f32", None, True, 1000),
    ("bf16", jnp.bfloat16, False, 128),
    ("bf16", jnp.bfloat16, True, 128),
    ("bf16", jnp.bfloat16, True, 512),
]
for dname, dt, w16, chunk in ARMS:
    fr.ROI_PYR = "bf16"  # detect applies it under f32 serving only
    fr.ROI_W16 = w16
    fr.ROI_CHUNK = chunk
    run(f"{dname} detect pyr=bf16 w16={int(w16)} chunk={chunk}", dt)
fr.ROI_PYR = None
fr.ROI_W16 = True
fr.ROI_CHUNK = 128

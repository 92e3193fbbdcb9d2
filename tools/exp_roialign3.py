"""Round-5 RoIAlign/box-head lever combos on the FULL Faster R-CNN detect
step: ROI_GATHER "patch" vs "pair" (row-paired pyramid — half the gathered
rows, bit-identical), ROI_PYR bf16 (confirmed +12% r5c), ROI_HEAD bf16
(box-head bandwidth). Chained accumulator, float() fetch.

    python tools/exp_roialign3.py [B] [iters]
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


ARMS = [
    ("f32", None, "patch", None, None),
    ("f32", None, "pair", None, None),
    ("f32", None, "pair", "bf16", None),
    ("f32", None, "pair", "bf16", "bf16"),
    ("f32", None, "patch", "bf16", "bf16"),
    ("bf16", jnp.bfloat16, "patch", None, None),
    ("bf16", jnp.bfloat16, "pair", None, None),
]
for dname, dt, gather, pyr, head in ARMS:
    fr.ROI_GATHER = gather
    fr.ROI_PYR = pyr
    fr.ROI_HEAD = head
    run(f"{dname} detect {gather} pyr={pyr} head={head}", dt)
fr.ROI_GATHER = "patch"
fr.ROI_PYR = None
fr.ROI_HEAD = None

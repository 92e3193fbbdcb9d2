"""RoIAlign round-5 levers on the Faster R-CNN serving step:
ROI_GATHER "patch" vs "fused" ((2, 2C) rows from the flattened pyramid —
half the gathered rows, bit-identical) x ROI_PYR None vs "bf16" (bf16
pyramid storage — half the gathered bytes; f32 weights/decode). r4j put
RoIAlign at ~75 ms of the 115 ms B=8 f32 step vs a 31 ms f32 bandwidth
bound (15.5 ms bf16). Measures the FULL detect step, f32 and bf16 serving.
Chained accumulator, float() fetch (CLAUDE.md rules).

    python tools/exp_roialign2.py [B] [iters]
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


for dname, dt in (("f32", None), ("bf16", jnp.bfloat16)):
    for gather in ("patch", "fused"):
        for pyr in (None, "bf16"):
            if dt is jnp.bfloat16 and pyr == "bf16":
                continue  # feats are already bf16 under bf16 serving
            fr.ROI_GATHER = gather
            fr.ROI_PYR = pyr
            run(f"{dname} detect {gather} pyr={pyr}", dt)
fr.ROI_GATHER = "patch"
fr.ROI_PYR = None

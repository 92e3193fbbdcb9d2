"""RoIAlign chunk=unchunked safety/benefit sweep at the BENCH batch size
(B=16) plus the bf16-serving unchunked arm at B=8 (r5e measured unchunked
+7% at B=8 f32 but only chunked arms at bf16). pyr=bf16 everywhere (the
r5c/r5e win). The historical OOM was B=16 x 1000 proposals x f32 pyramid;
the bf16 pyramid halves the live bilinear expansion — this verifies the
unchunked form fits and pays at B=16 before it becomes the default.

    python tools/exp_roialign5.py [iters]
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

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 8

net = FasterRCNN()
params = net.init(jax.random.PRNGKey(0))
anchors = [jnp.asarray(a) for a in rpn_anchors(net.image_size)]


def run(tag, b, dtype):
    @jax.jit
    def step(acc, seed):
        imgs = hash_uniform(seed, (b, 640, 640, 3))
        dets, dvalid = net.detect(params, imgs, anchors, dtype=dtype)
        return acc + dets.sum() * 1e-9 + dvalid.sum() * 1e-9

    try:
        t0 = time.perf_counter()
        float(step(jnp.zeros(()), 0))
        print(f"{tag}: warmup {time.perf_counter() - t0:.1f}s", flush=True)
        acc = jnp.zeros(())
        t0 = time.perf_counter()
        for i in range(ITERS):
            acc = step(acc, 1 + i)
        a = float(acc)
        ms = (time.perf_counter() - t0) / ITERS * 1e3
        print(f"{tag}: {ms:8.2f} ms/batch  {b / ms * 1e3:8.2f} img/s  "
              f"acc {a:.6f}", flush=True)
    except Exception as e:  # OOM / compile failure is a RESULT here
        print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)


fr.ROI_GATHER = "patch"
fr.ROI_PYR = "bf16"
for b, dname, dt, chunk in [
    (16, "f32", None, 128),
    (16, "f32", None, 1000),
    (16, "bf16", jnp.bfloat16, 128),
    (16, "bf16", jnp.bfloat16, 1000),
    (8, "bf16", jnp.bfloat16, 1000),
    (8, "f32", None, 1000),
]:
    fr.ROI_CHUNK = chunk
    run(f"B={b} {dname} pyr=bf16 chunk={chunk}", b, dt)
fr.ROI_PYR = None
fr.ROI_CHUNK = 128

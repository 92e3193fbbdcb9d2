"""Which in-context gather is slow? Bisect the three payload gathers.

All variants run trunk + prefilter + box-topk first (the 'floor'), then a
subset of gather styles, consuming every result into the chained acc.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from edgeml_tpu.models.yolov5 import YoloV5
from edgeml_tpu.ops.nms import topk1d

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 8
DT = jnp.bfloat16
N, NC, KB = 25200, 80, 1024
CONF = 1e-5

net = YoloV5(variant="n", num_classes=NC, img_size=640)
params, stats = net.init(jax.random.PRNGKey(0))


def build(variant):
    def fn(acc, seed):
        imgs = jax.random.uniform(
            jax.random.PRNGKey(seed), (B, 640, 640, 3), jnp.float32
        )
        obj, xywh, cls = net.predict(params, stats, imgs, dtype=DT)

        def one(o, x, c):
            best = jnp.max(c, axis=1) * o
            box_score = jnp.where((o > CONF) & (best > CONF), best, -1.0)
            best_top, box_pre = topk1d(box_score, KB)
            out = best_top.sum() * 1e-9
            if variant == "floor":
                return out
            if variant in ("xywh", "all3", "all_1d"):
                if variant == "all_1d":
                    xg = jnp.stack([x[:, j][box_pre] for j in range(4)], axis=1)
                else:
                    xg = x[box_pre]
                out = out + xg.sum() * 1e-12
            if variant == "xywh1d":
                xg = jnp.stack([x[:, j][box_pre] for j in range(4)], axis=1)
                out = out + xg.sum() * 1e-12
            if variant in ("obj", "all3", "all_1d"):
                og = o[box_pre]
                out = out + og.sum() * 1e-9
            if variant in ("cls", "all3"):
                cg = c[box_pre]
                out = out + cg.sum() * 1e-9
            if variant == "all_1d":
                cg = c[box_pre]
                out = out + cg.sum() * 1e-9
            if variant == "clsconf":
                cc = (c * o[:, None])[box_pre]
                out = out + cc.sum() * 1e-9
            return out

        per = jax.vmap(one)(obj, xywh, cls)
        return acc + per.sum()

    return jax.jit(fn)


for variant in ("floor", "xywh", "xywh1d", "obj", "cls", "clsconf",
                "all3", "all_1d"):
    fn = build(variant)
    acc = fn(jnp.zeros(()), 0)
    float(acc)  # value fetch; block_until_ready is a no-op on axon
    t0 = time.perf_counter()
    for i in range(ITERS):
        acc = fn(acc, 1 + i)
    float(acc)  # value fetch; block_until_ready is a no-op on axon
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{variant:10s} {dt * 1e3:8.2f} ms  {B / dt:8.0f} img/s", flush=True)

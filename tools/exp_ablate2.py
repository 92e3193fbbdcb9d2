"""Why are in-context gathers 80x slower than isolated ones?

Variants of the gather stage inside the single-launch pipeline:
  a) as-is (3 narrow gathers on trunk outputs)
  b) optimization_barrier on trunk outputs first (cuts producer fusion)
  c) barrier + ONE packed gather from a (N, 88) concat, then split
  d) packed gather, no barrier
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
        if variant in ("b", "c"):
            obj, xywh, cls = jax.lax.optimization_barrier((obj, xywh, cls))

        def one(o, x, c):
            best = jnp.max(c, axis=1) * o
            box_score = jnp.where((o > CONF) & (best > CONF), best, -1.0)
            best_top, box_pre = topk1d(box_score, KB)
            if variant in ("a", "b"):
                xg, og, cg = x[box_pre], o[box_pre], c[box_pre]
            else:
                packed = jnp.concatenate(
                    [x, o[:, None], c, jnp.zeros((N, 3), x.dtype)], axis=1
                )  # (N, 88)
                rows = packed[box_pre]
                xg, og, cg = rows[:, :4], rows[:, 4], rows[:, 5:85]
            return (best_top.sum() * 1e-9 + xg.sum() * 1e-12
                    + og.sum() * 1e-9 + cg.sum() * 1e-9)

        per = jax.vmap(one)(obj, xywh, cls)
        return acc + per.sum()

    return jax.jit(fn)


for variant, name in (("a", "3 gathers as-is"),
                      ("b", "3 gathers + barrier"),
                      ("c", "packed gather + barrier"),
                      ("d", "packed gather no barrier")):
    fn = build(variant)
    acc = fn(jnp.zeros(()), 0)
    float(acc)  # value fetch; block_until_ready is a no-op on axon
    t0 = time.perf_counter()
    for i in range(ITERS):
        acc = fn(acc, 1 + i)
    float(acc)  # value fetch; block_until_ready is a no-op on axon
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:28s} {dt * 1e3:8.2f} ms  {B / dt:8.0f} img/s", flush=True)

"""Is the serial tail byte-proportional? Cast scores to bf16 and re-measure.

Variants (all in-context after the bf16 trunk):
  f32:  box topk f32, cc gather f32, pair topk f32   (current)
  bf16: box topk bf16, cc gather bf16, pair topk bf16
  mixed stages to locate the wins.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from edgeml_tpu.models.yolov5 import YoloV5
from edgeml_tpu.ops.nms import topk1d

B = 128
ITERS = 8
N, NC, KB = 25200, 80, 1024
CONF = 1e-5

net = YoloV5(variant="n", num_classes=NC, img_size=640)
params, stats = net.init(jax.random.PRNGKey(0))


def build(tk_bf, gather_bf, pair_bf, with_pair=True):
    def fn(acc, seed):
        imgs = jax.random.uniform(
            jax.random.PRNGKey(seed), (B, 640, 640, 3), jnp.float32
        )
        obj, xywh, cls = net.predict(params, stats, imgs, dtype=jnp.bfloat16)

        def one(o, x, c):
            best = jnp.max(c, axis=1) * o
            box_score = jnp.where((o > CONF) & (best > CONF), best, -1.0)
            if tk_bf:
                box_score = box_score.astype(jnp.bfloat16)
            best_top, box_pre = topk1d(box_score, KB)
            cc = c * o[:, None]
            if gather_bf:
                cc = cc.astype(jnp.bfloat16)
            ccg = cc[box_pre]
            out = best_top.astype(jnp.float32).sum() * 1e-9
            if not with_pair:
                return out + ccg.astype(jnp.float32).sum() * 1e-9
            flat = jnp.where(
                (best_top[:, None] > 0) & (ccg > CONF), ccg, -1.0
            ).reshape(-1)
            if pair_bf:
                flat = flat.astype(jnp.bfloat16)
            ts, ti = topk1d(flat, KB, chunk=4096)
            return (out + ts.astype(jnp.float32).sum() * 1e-9
                    + ti.sum() * 1e-12)

        per = jax.vmap(one)(obj, xywh, cls)
        return acc + per.sum()

    return jax.jit(fn)


def timed(name, fn, iters=ITERS):
    acc = fn(jnp.zeros(()), 0)
    float(acc)  # value fetch; block_until_ready is a no-op on axon
    t0 = time.perf_counter()
    for i in range(iters):
        acc = fn(acc, 1 + i)
    float(acc)  # value fetch; block_until_ready is a no-op on axon
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:36s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


timed("f32 topk + f32 gather (no pair)", build(0, 0, 0, with_pair=False))
timed("bf16 topk + bf16 gather (no pair)", build(1, 1, 0, with_pair=False))
timed("f32 all + pair", build(0, 0, 0))
timed("bf16 topk only + pair f32", build(1, 0, 0))
timed("bf16 gather only + pair f32", build(0, 1, 0))
timed("bf16 all + bf16 pair", build(1, 1, 1))

"""Quick tail experiments: pair-topk chunking, bf16 sup, sorted gathers, B=256.

1) topk1d chunk size sweep on the (1024*80,) pair ranking shape, in-context.
2) full nms_split pipeline (picks up the bf16 sup change), B=128 and B=256.
3) gather with ascending-sorted indices vs topk-order indices.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from edgeml_tpu.models.yolov5 import YoloV5
from edgeml_tpu.ops.nms import nms_split, topk1d

DT = jnp.bfloat16
N, NC, KB = 25200, 80, 1024
CONF = 1e-5

net = YoloV5(variant="n", num_classes=NC, img_size=640)
params, stats = net.init(jax.random.PRNGKey(0))


def timed(name, fn, iters=8):
    acc = fn(jnp.zeros(()), 0)
    float(acc)  # value fetch; block_until_ready is a no-op on axon
    t0 = time.perf_counter()
    for i in range(iters):
        acc = fn(acc, 1 + i)
    float(acc)  # value fetch; block_until_ready is a no-op on axon
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:32s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


def build_pair(B, chunk, sort_idx=False):
    def fn(acc, seed):
        imgs = jax.random.uniform(
            jax.random.PRNGKey(seed), (B, 640, 640, 3), jnp.float32
        )
        obj, xywh, cls = net.predict(params, stats, imgs, dtype=DT)

        def one(o, x, c):
            best = jnp.max(c, axis=1) * o
            box_score = jnp.where((o > CONF) & (best > CONF), best, -1.0)
            best_top, box_pre = topk1d(box_score, KB)
            if sort_idx:
                box_pre = jnp.sort(box_pre)
            cc = (c * o[:, None])[box_pre]
            xg = x[box_pre]
            if chunk == 0:  # gathers only, no pair topk
                return cc.sum() * 1e-9 + xg.sum() * 1e-12
            flat = jnp.where(
                (best_top[:, None] > 0) & (cc > CONF), cc, -1.0
            ).reshape(-1)
            ts, ti = topk1d(flat, KB, chunk=chunk)
            return ts.sum() * 1e-9 + xg.sum() * 1e-12 + ti.sum() * 1e-12

        per = jax.vmap(one)(obj, xywh, cls)
        return acc + per.sum()

    return jax.jit(fn)


def build_full(B):
    def fn(acc, seed):
        imgs = jax.random.uniform(
            jax.random.PRNGKey(seed), (B, 640, 640, 3), jnp.float32
        )
        obj, xywh, cls = net.predict(params, stats, imgs, dtype=DT)
        dets, valid = jax.vmap(
            lambda o, x, c: nms_split(o, x, c, 1e-3, 0.6)
        )(obj, xywh, cls)
        return acc + dets.sum() * 1e-9 + valid.sum() * 1e-9

    return jax.jit(fn)


which = sys.argv[1] if len(sys.argv) > 1 else "all"

if which in ("all", "pair"):
    timed("gathers only (no pair topk)", build_pair(128, 0))
    for chunk in (2048, 4096, 5120, 10240, 20480):
        timed(f"pair topk chunk={chunk}", build_pair(128, chunk))
if which in ("all", "sort"):
    timed("gathers sorted idx", build_pair(128, 0, sort_idx=True))
if which in ("all", "full"):
    d128 = timed("FULL nms_split B=128", build_full(128))
    print(f"  -> {128 / d128:.0f} img/s", flush=True)
    d256 = timed("FULL nms_split B=256", build_full(256), iters=4)
    print(f"  -> {256 / d256:.0f} img/s", flush=True)

"""Find the 25x cliff in the native-bf16 serving tail.

Variants on top of predict(dtype=bf16) (obj/cls now natively bf16):
  a) full nms_split as-is                       (the 94 img/s case)
  b) cast obj/cls to f32 after predict           (isolates the tail)
  c) nms_split but top_scores cast to f32 pre-_emit (isolates NMS/emit)
  d) stop before _emit (selection only, bf16)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from edgeml_tpu.models.yolov5 import YoloV5
from edgeml_tpu.ops.nms import _emit, _gather_rows, topk1d

B = 128
N, NC, KB = 25200, 80, 1024
CONF = 1e-3

net = YoloV5(variant="n", num_classes=NC, img_size=640)
params, stats = net.init(jax.random.PRNGKey(0))


def images(seed):
    n = B * 640 * 640 * 3
    i = jax.lax.broadcasted_iota(jnp.uint32, (n,), 0)
    h = (i + jnp.uint32(seed)) * jnp.uint32(2654435761)
    h = h ^ (h >> 15)
    h = h * jnp.uint32(2246822519)
    return ((h >> 8).astype(jnp.float32) * (1.0 / (1 << 24))).reshape(
        B, 640, 640, 3)


def tail(o, x, c, upto, f32_scores):
    best = jnp.max(c, axis=1) * o
    box_score = jnp.where((o > CONF) & (best > CONF), best, -1.0)
    best_top, box_pre = topk1d(box_score, KB)
    if upto == "boxtopk":
        return best_top.astype(jnp.float32).sum()
    xywh_pre, obj_pre, cls_rows = _gather_rows(box_pre, x, o, c)
    cc = cls_rows * obj_pre[:, None]
    flat = jnp.where((best_top[:, None] > 0) & (cc > CONF), cc, -1.0).reshape(-1)
    ts, ti = topk1d(flat, KB, chunk=4096)
    if upto == "pair":
        return ts.astype(jnp.float32).sum() + ti.sum() * 1e-9
    bsel = ti // NC
    cls_idx = (ti % NC).astype(jnp.float32)
    bxywh = xywh_pre[bsel]
    half = bxywh[:, 2:4] * 0.5
    cand = jnp.concatenate([bxywh[:, :2] - half, bxywh[:, :2] + half], axis=1)
    if f32_scores:
        ts = ts.astype(jnp.float32)
    dets, valid = _emit(cand, ts, cls_idx, 0.6, 300)
    return dets.sum() * 1e-9 + valid.sum()


def build(variant):
    def fn(acc, seed):
        obj, xywh, cls = net.predict(params, stats, images(seed),
                                     dtype=jnp.bfloat16)
        if variant == "b":
            obj, cls = obj.astype(jnp.float32), cls.astype(jnp.float32)
        upto = {"d": "pair"}.get(variant, "full")
        per = jax.vmap(lambda o, x, c: tail(
            o, x, c, upto, variant == "c"))(obj, xywh, cls)
        return acc + per.sum()

    return jax.jit(fn)


def timed(name, fn, iters=6):
    acc = fn(jnp.zeros(()), 0)
    float(acc)  # value fetch; block_until_ready is a no-op on axon
    t0 = time.perf_counter()
    for i in range(iters):
        acc = fn(acc, 1 + i)
    float(acc)  # value fetch; block_until_ready is a no-op on axon
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:34s} {dt * 1e3:9.2f} ms", flush=True)


timed("d) selection only, bf16", build("d"))
timed("c) bf16 tail, f32 scores in emit", build("c"))
timed("b) f32 tail after bf16 predict", build("b"))
timed("a) full native bf16", build("a"))

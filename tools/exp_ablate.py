"""Single-launch ablation of the YOLOv5 serving pipeline.

Per-launch overhead on this platform is variable (0.1-12 ms depending on
process state — see exp_state2.py), so multi-launch stage timings lie.
Instead: build cumulative variants of the FULL pipeline inside ONE jit each
and difference the launch times. Chained through acc; inputs derived from the
loop index on device (CLAUDE.md measurement rules).

    python tools/exp_ablate.py [B] [iters] [f32|bf16]
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from edgeml_tpu.models.yolov5 import YoloV5
from edgeml_tpu.ops import nms as nms_mod
from edgeml_tpu.ops.nms import _emit, _gather_rows, topk1d

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 8
DT = jnp.bfloat16 if (len(sys.argv) > 3 and sys.argv[3] == "bf16") else None
N, NC, KB, MAXD = 25200, 80, 1024, 300
CONF, IOU = 1e-5, 0.6

net = YoloV5(variant="n", num_classes=NC, img_size=640)
params, stats = net.init(jax.random.PRNGKey(0))


def stage_pipeline(upto):
    """Pipeline prefix through stage `upto` as one jittable fn."""

    def fn(acc, seed):
        imgs = jax.random.uniform(
            jax.random.PRNGKey(seed), (B, 640, 640, 3), jnp.float32
        )
        obj, xywh, cls = net.predict(params, stats, imgs, dtype=DT)
        if upto == 0:
            return acc + obj.sum() * 1e-9 + xywh.sum() * 1e-12 + cls.sum() * 1e-9

        def one(o, x, c):
            best = jnp.max(c, axis=1) * o
            box_score = jnp.where((o > CONF) & (best > CONF), best, -1.0)
            best_top, box_pre = topk1d(box_score, KB)
            if upto == 1:
                return best_top.sum() * 1e-9 + box_pre.sum() * 1e-12
            xywh_pre, obj_pre, cls_rows = _gather_rows(box_pre, x, o, c)
            if upto == 2:
                return (xywh_pre.sum() * 1e-12 + obj_pre.sum() * 1e-9
                        + cls_rows.sum() * 1e-9)
            cls_conf = cls_rows * obj_pre[:, None]
            flat = jnp.where(
                (best_top[:, None] > 0) & (cls_conf > CONF), cls_conf, -1.0
            ).reshape(-1)
            top_scores, top_idx = topk1d(flat, KB)
            if upto == 3:
                return top_scores.sum() * 1e-9 + top_idx.sum() * 1e-12
            bsel = top_idx // NC
            cls_idx = (top_idx % NC).astype(jnp.float32)
            bxywh = xywh_pre[bsel]
            half = bxywh[:, 2:4] * 0.5
            cand = jnp.concatenate([bxywh[:, :2] - half, bxywh[:, :2] + half], 1)
            dets, valid = _emit(cand, top_scores, cls_idx, IOU, MAXD)
            return dets.sum() * 1e-9 + valid.sum() * 1e-9

        per = jax.vmap(one)(obj, xywh, cls)
        return acc + per.sum()

    return jax.jit(fn)


names = ["trunk", "+prefilter-topk", "+gathers", "+pair-topk", "+nms-emit"]
prev = 0.0
for upto, name in enumerate(names):
    fn = stage_pipeline(upto)
    acc = fn(jnp.zeros(()), 0)
    float(acc)  # value fetch; block_until_ready is a no-op on axon
    t0 = time.perf_counter()
    for i in range(ITERS):
        acc = fn(acc, 1 + i)
    float(acc)  # value fetch; block_until_ready is a no-op on axon
    dt = (time.perf_counter() - t0) / ITERS
    print(
        f"{name:18s} {dt * 1e3:8.2f} ms  (+{(dt - prev) * 1e3:7.2f})"
        f"  {B / dt:8.0f} img/s",
        flush=True,
    )
    prev = dt

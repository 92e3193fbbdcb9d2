"""Ablation of the CURRENT library serving tail (two-tier pair pool +
certificate), cumulative variants, chained launches.

    python tools/exp_tail4.py [B] [iters] [f32|bf16]

full_flag vs full_cond isolates the cost of the in-program lax.cond exact
fallback relative to the flag protocol (ops/nms.py nms_split_batch
fallback="flag"/"cond") — the ~8 ms/128-batch scheduling-barrier number
cited in models/infer.py.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from edgeml_tpu.models.yolov5 import YoloV5
from edgeml_tpu.ops.nms import (
    PAIR_G,
    PAIR_T,
    _emit,
    _select_pairs_fast,
    _use_keys,
    nms_split_batch,
)
from edgeml_tpu.utils.synth import hash_uniform

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 6
DT = jnp.bfloat16 if (len(sys.argv) > 3 and sys.argv[3] == "bf16") else None
N, NC, KB, MAXD = 25200, 80, 1024, 300
CONF, IOU = 1e-5, 0.6
G = min(PAIR_G, KB)

net = YoloV5(variant="n", num_classes=NC, img_size=640)
params, stats = net.init(jax.random.PRNGKey(0))


def build(mode):
    def fn(acc, seed):
        imgs = hash_uniform(seed, (B, 640, 640, 3)) + acc * 1e-20
        obj, xywh, cls = net.predict(params, stats, imgs, dtype=DT)
        if mode == "trunk":
            return acc + obj.astype(jnp.float32).sum() * 1e-9 \
                + xywh.sum() * 1e-12 + cls.astype(jnp.float32).sum() * 1e-9

        if mode in ("full_flag", "full_cond"):
            out = nms_split_batch(
                obj, xywh, cls, CONF, IOU, max_det=MAXD,
                fallback="flag" if mode == "full_flag" else "cond",
            )
            dets, valid = out[0], out[1]
            extra = out[2].astype(jnp.float32) * 1e-9 if len(out) > 2 else 0.0
            return acc + dets.sum() * 1e-9 + valid.sum() * 1e-9 + extra

        by_key = _use_keys(cls, N, KB)
        ts, row, col, xp, ok = jax.vmap(
            lambda o, x, c: _select_pairs_fast(
                o, x, c, CONF, G, min(PAIR_T, NC), KB, by_key
            )
        )(obj, xywh, cls)
        if mode == "select":
            return acc + ts.astype(jnp.float32).sum() * 1e-9 \
                + row.sum() * 1e-12 + col.sum() * 1e-12 \
                + ok.astype(jnp.float32).sum() * 1e-9
        # mode == "emit": + box gather + suppression + compaction
        bx = jnp.take_along_axis(xp, row[..., None], axis=1)
        half = bx[..., 2:4] * 0.5
        cand = jnp.concatenate([bx[..., :2] - half, bx[..., :2] + half], -1)
        dets, valid = jax.vmap(
            lambda cb, t, ci: _emit(cb, t, ci.astype(jnp.float32), IOU, MAXD)
        )(cand, ts, col)
        return acc + dets.sum() * 1e-9 + valid.sum() * 1e-9

    return jax.jit(fn)


for mode in ["trunk", "select", "emit", "full_flag", "full_cond"]:
    fn = build(mode)
    t0 = time.perf_counter()
    acc = fn(jnp.zeros(()), 0)
    float(acc)  # value fetch; block_until_ready is a no-op on axon
    comp = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(ITERS):
        acc = fn(acc, 1 + i)
    float(acc)  # value fetch; block_until_ready is a no-op on axon
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{mode:16s} {dt * 1e3:8.2f} ms  {B / dt:8.0f} img/s  "
          f"(compile {comp:.0f}s)", flush=True)

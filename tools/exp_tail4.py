"""Ablation of the CURRENT library serving pipeline (packed trunk +
two-tier pool), cumulative variants, chained launches.

    python tools/exp_tail4.py [B] [iters] [f32|bf16]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from edgeml_tpu.models.yolov5 import YoloV5
from edgeml_tpu.ops import nms as nms_mod
from edgeml_tpu.ops.nms import (
    PAIR_B1,
    PAIR_T,
    _emit,
    _select_pairs_fast,
    _unpack_cls_rows,
    topk1d,
    nms_split_batch,
)
from edgeml_tpu.utils.synth import hash_uniform

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 6
DT = jnp.bfloat16 if (len(sys.argv) > 3 and sys.argv[3] == "bf16") else None
N, NC, KB, MAXD = 25200, 80, 1024, 300
CONF, IOU = 1e-5, 0.6

net = YoloV5(variant="n", num_classes=NC, img_size=640)
params, stats = net.init(jax.random.PRNGKey(0))
PACK = DT == jnp.bfloat16


def build(mode):
    def fn(acc, seed):
        imgs = hash_uniform(seed, (B, 640, 640, 3)) + acc * 1e-20
        if mode == "trunk_unpacked":
            obj, xywh, cls = net.predict(params, stats, imgs, dtype=DT)
            return acc + obj.astype(jnp.float32).sum() * 1e-9 \
                + xywh.sum() * 1e-12 + cls.astype(jnp.float32).sum() * 1e-9
        pred = net.predict(params, stats, imgs, dtype=DT, pack_cls=PACK)
        obj, xywh, cls = pred[:3]
        best_cls = pred[3] if PACK else None
        if mode == "trunk":
            extra = best_cls.astype(jnp.float32).sum() * 1e-9 if PACK else 0.0
            return acc + obj.astype(jnp.float32).sum() * 1e-9 \
                + xywh.sum() * 1e-12 + cls.astype(jnp.float32).sum() * 1e-9 \
                + extra

        k = min(KB, KB * NC)

        def sel(o, x, c, bc):
            return _select_pairs_fast(o, x, c, CONF, KB, min(PAIR_T, NC), KB,
                                      best_cls=bc)

        if PACK:
            ts, row, col, masked, xp, ok = jax.vmap(sel)(
                obj, xywh, cls, best_cls
            )
        else:
            ts, row, col, masked, xp, ok = jax.vmap(
                lambda o, x, c: sel(o, x, c, None)
            )(obj, xywh, cls)
        if mode == "select":
            return acc + ts.astype(jnp.float32).sum() * 1e-9 \
                + row.sum() * 1e-12 + col.sum() * 1e-12 + ok.sum() * 1e-9
        bx = jnp.take_along_axis(xp, row[..., None], axis=1 + 1 - 1)
        half = bx[..., 2:4] * 0.5
        cand = jnp.concatenate([bx[..., :2] - half, bx[..., :2] + half], -1)
        dets, valid = jax.vmap(
            lambda cb, t, ci: _emit(cb, t, ci.astype(jnp.float32), IOU, MAXD)
        )(cand, ts, col)
        return acc + dets.sum() * 1e-9 + valid.sum() * 1e-9

    if mode in ("full_nofb", "full_cond"):
        # the env knob is read at trace time: set it at build time and clear
        # the jit cache so each mode traces its own program
        os.environ["EDGEML_NMS_NO_FALLBACK"] = (
            "1" if mode == "full_nofb" else "0"
        )
        nms_split_batch.clear_cache()

        def fn(acc, seed):
            imgs = hash_uniform(seed, (B, 640, 640, 3)) + acc * 1e-20
            pred = net.predict(params, stats, imgs, dtype=DT, pack_cls=PACK)
            dets, valid = nms_split_batch(
                pred[0], pred[1], pred[2], CONF, IOU, max_det=MAXD,
                best_cls=pred[3] if PACK else None,
            )
            return acc + dets.sum() * 1e-9 + valid.sum() * 1e-9

    return jax.jit(fn)


for mode in ["trunk_unpacked", "trunk", "select", "emit", "full_nofb",
             "full_cond"]:
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

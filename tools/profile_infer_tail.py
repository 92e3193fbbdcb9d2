"""Stage-by-stage TPU timing of the YOLOv5 serving pipeline.

Measures, at batch B and 640x640 (N=25200 boxes, nc=80):
  trunk      net.predict (backbone+neck+split decode), f32 and bf16
  prefilter  best-pair score + box top-k (nms_split stage 1)
  gathers    xywh/obj/cls row gathers for the selected boxes
  pairtopk   (kb*nc) pair score matrix + flat exact top-k
  nms        IoU matrix + fixpoint suppression + emit
  full       end-to-end _detect_batch

Launches are CHAINED through a scalar accumulator (CLAUDE.md measurement
rules) so relay caching/overlap cannot inflate throughput; inputs derive
from the loop index on-device.

Run on the TPU (ambient env, the only JAX process):
    python tools/profile_infer_tail.py [B] [iters]
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

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 8
N, NC = 25200, 80
KB = 1024
CONF, IOU = 1e-3, 0.6


def timed(name, fn, *args):
    # warmup (compile) then chained timing
    acc = jnp.zeros(())
    acc = fn(acc, jnp.float32(0.0), *args)
    acc.block_until_ready()
    t0 = time.perf_counter()
    for i in range(ITERS):
        acc = fn(acc, jnp.float32(i), *args)
    acc.block_until_ready()
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:12s} {dt * 1e3:8.2f} ms/iter   {B / dt:8.0f} img/s")
    return dt


def main():
    rng = np.random.default_rng(0)
    net = YoloV5(variant="n", num_classes=NC, img_size=640)
    params, stats = net.init(jax.random.PRNGKey(0))
    images = jnp.asarray(rng.random((B, 640, 640, 3), np.float32))

    # Realistic decode outputs: mostly tiny scores, a few hundred above gate.
    obj_h = rng.random((B, N)).astype(np.float32) * 0.002
    hot = rng.integers(0, N, size=(B, 400))
    for b in range(B):
        obj_h[b, hot[b]] = rng.random(400) * 0.9 + 0.05
    cls_h = rng.dirichlet(np.ones(NC) * 0.2, size=(B, N)).astype(np.float32)
    xywh_h = np.concatenate(
        [rng.uniform(0, 640, (B, N, 2)), rng.uniform(4, 200, (B, N, 2))], -1
    ).astype(np.float32)
    obj = jnp.asarray(obj_h)
    cls = jnp.asarray(cls_h)
    xywh = jnp.asarray(xywh_h)

    # ---- trunk ------------------------------------------------------------
    @partial(jax.jit, static_argnames=("dtype",))
    def trunk(acc, salt, images, dtype=None):
        o, x, c = net.predict(params, stats, images + acc * 0 + salt * 1e-9,
                              dtype=dtype)
        return acc + o.astype(jnp.float32).sum() * 1e-12

    timed("trunk f32", lambda a, s: trunk(a, s, images))
    timed("trunk bf16", lambda a, s: trunk(a, s, images, dtype=jnp.bfloat16))

    # ---- stage kernels (vmapped over B) ------------------------------------
    @jax.jit
    def prefilter(acc, salt, obj, cls):
        def one(o, c):
            best = jnp.max(c, axis=1) * o
            score = jnp.where((o > CONF) & (best > CONF), best, -1.0)
            bt, bp = nms_mod.topk1d(score + salt * 1e-12, KB)
            return bt, bp

        bt, bp = jax.vmap(one)(obj, cls)
        return acc + bt.sum() * 1e-9 + bp.sum() * 1e-12, bt, bp

    acc0 = jnp.zeros(())
    _, bt, bp = prefilter(acc0, jnp.float32(0), obj, cls)
    timed("prefilter", lambda a, s: prefilter(a, s, obj, cls)[0])

    @jax.jit
    def gathers(acc, salt, xywh, obj, cls, bp):
        def one(x, o, c, idx):
            return x[idx], o[idx], c[idx]

        xg, og, cg = jax.vmap(one)(xywh, obj, cls, bp)
        return acc + xg.sum() * 1e-12 + og.sum() * 1e-9 + cg.sum() * 1e-9

    timed("gathers", lambda a, s: gathers(a, s, xywh, obj, cls, bp))
    bp_fresh = jnp.asarray(np.asarray(bp))
    bt_fresh = jnp.asarray(np.asarray(bt))
    timed("gathers fresh-layout",
          lambda a, s: gathers(a, s, xywh, obj, cls, bp_fresh))

    @jax.jit
    def pairtopk(acc, salt, cls, obj, bp, bt):
        def one(c, o, idx, btop):
            cr = c[idx]
            og = o[idx]
            cc = cr * og[:, None]
            flat = jnp.where((btop[:, None] > 0) & (cc > CONF), cc, -1.0)
            ts, ti = nms_mod.topk1d(flat.reshape(-1) + salt * 1e-12, KB)
            return ts, ti

        ts, ti = jax.vmap(one)(cls, obj, bp, bt)
        return acc + ts.sum() * 1e-9 + ti.sum() * 1e-12

    timed("gat+pairtopk", lambda a, s: pairtopk(a, s, cls, obj, bp, bt))

    @jax.jit
    def nms_tail(acc, salt, xywh, bp, bt):
        def one(x, idx, scores):
            bx = x[idx]
            half = bx[:, 2:4] * 0.5
            boxes = jnp.concatenate([bx[:, :2] - half, bx[:, :2] + half], 1)
            cls_idx = jnp.zeros((KB,), jnp.float32)
            dets, valid = nms_mod._emit(
                boxes, scores + salt * 1e-12, cls_idx, IOU, 300
            )
            return dets, valid

        dets, valid = jax.vmap(one)(xywh, bp, bt)
        return acc + dets.sum() * 1e-9

    timed("nms fixpoint", lambda a, s: nms_tail(a, s, xywh, bp, bt))

    # ---- full pipeline ------------------------------------------------------
    from edgeml_tpu.models.infer import _detect_batch

    meta = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]]), (B, 1))
    hw = jnp.tile(jnp.asarray([[640.0, 640.0]]), (B, 1))

    @partial(jax.jit, static_argnames=("dtype",))
    def full(acc, salt, images, dtype=None):
        dets, valid = _detect_batch(
            net, params, stats, images + salt * 1e-9, meta, hw, CONF, IOU,
            dtype=dtype,
        )
        return acc + dets.sum() * 1e-9

    timed("full f32", lambda a, s: full(a, s, images))
    timed("full bf16", lambda a, s: full(a, s, images, dtype=jnp.bfloat16))


if __name__ == "__main__":
    main()

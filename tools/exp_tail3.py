"""Round-3 tail ablation: cumulative in-pipeline variants (one jit each,
chained through acc, on-device inputs) for the redesigned pair selection.

    python tools/exp_tail3.py [B] [iters] [f32|bf16]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from edgeml_tpu.models.yolov5 import YoloV5
from edgeml_tpu.ops.nms import (
    PAIR_B1,
    PAIR_T,
    _emit,
    topk1d,
)
from edgeml_tpu.utils.synth import hash_uniform

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 6
DT = jnp.bfloat16 if (len(sys.argv) > 3 and sys.argv[3] == "bf16") else None
N, NC, KB, MAXD = 25200, 80, 1024, 300
CONF, IOU = 1e-5, 0.6

net = YoloV5(variant="n", num_classes=NC, img_size=640)
params, stats = net.init(jax.random.PRNGKey(0))


def build(mode):
    def fn(acc, seed):
        imgs = hash_uniform(seed, (B, 640, 640, 3)) + acc * 1e-20
        obj, xywh, cls = net.predict(params, stats, imgs, dtype=DT)
        if mode == "trunk":
            return acc + obj.sum() * 1e-9 + xywh.sum() * 1e-12 \
                + cls.astype(jnp.float32).sum() * 1e-9

        def sel_boxes(o, c):
            best = jnp.max(c, axis=1) * o
            score = jnp.where((o > CONF) & (best > CONF), best, -1.0)
            return topk1d(score, KB, chunk=N)

        if mode == "boxtopk":
            bt, bp = jax.vmap(sel_boxes)(obj, cls)
            return acc + bt.astype(jnp.float32).sum() * 1e-9 + bp.sum() * 1e-12

        def gathers(o, x, c):
            # plain narrow gathers (the packed-cls variant left with the
            # packed trunk — measured net loss, ops/nms.py _gather_rows note)
            bt, bp = sel_boxes(o, c)
            return bt, x[bp], o[bp], c[bp]

        if mode == "gather":
            bt, xp, op, rows = jax.vmap(gathers)(obj, xywh, cls)
            return acc + bt.astype(jnp.float32).sum() * 1e-9 \
                + xp.sum() * 1e-12 + op.astype(jnp.float32).sum() * 1e-9 \
                + rows.astype(jnp.float32).sum() * 1e-9

        def pair_old(o, x, c):
            bt, xp, op, rows = gathers(o, x, c)
            m = jnp.where(
                (bt[:, None] > 0) & (rows * op[:, None] > CONF),
                rows * op[:, None], -1.0,
            )
            ts, ti = topk1d(m.reshape(-1), KB, chunk=4096)
            return ts, ti // NC, ti % NC, xp, m

        def pair_new(o, x, c):
            bt, xp, op, rows = gathers(o, x, c)
            m = jnp.where(
                (bt[:, None] > 0) & (rows * op[:, None] > CONF),
                rows * op[:, None], -1.0,
            )
            v, i = jax.lax.top_k(m[PAIR_B1:], PAIR_T + 1)
            pool_v = jnp.concatenate(
                [m[:PAIR_B1].reshape(-1), v[:, :PAIR_T].reshape(-1)]
            )
            pool_i = i[:, :PAIR_T].reshape(-1)
            ts, sel = jax.lax.top_k(pool_v, KB)
            tier2 = sel - PAIR_B1 * NC
            row = jnp.where(tier2 < 0, sel // NC, PAIR_B1 + tier2 // PAIR_T)
            col = jnp.where(tier2 < 0, sel % NC, pool_i[jnp.maximum(tier2, 0)])
            return ts, row, col, xp, m

        def pair_rowsonly(o, x, c):
            # tier-2 machinery alone (cost probe for per-row top_k)
            bt, xp, op, rows = gathers(o, x, c)
            m = rows * op[:, None]
            v, i = jax.lax.top_k(m[PAIR_B1:], PAIR_T + 1)
            return v, i

        if mode == "pair_rows_probe":
            v, i = jax.vmap(pair_rowsonly)(obj, xywh, cls)
            return acc + v.astype(jnp.float32).sum() * 1e-9 + i.sum() * 1e-12

        pair = pair_old if "old" in mode else pair_new
        if mode in ("pair_old", "pair_new"):
            ts, r, cidx, xp, m = jax.vmap(pair)(obj, xywh, cls)
            return acc + ts.astype(jnp.float32).sum() * 1e-9 \
                + r.sum() * 1e-12 + cidx.sum() * 1e-12

        # full: + emit
        ts, r, cidx, xp, m = jax.vmap(pair)(obj, xywh, cls)
        bx = jnp.take_along_axis(xp, r[..., None], axis=2 - 1)
        half = bx[..., 2:4] * 0.5
        cand = jnp.concatenate([bx[..., :2] - half, bx[..., :2] + half], -1)
        dets, valid = jax.vmap(
            lambda cb, t, ci: _emit(cb, t, ci.astype(jnp.float32), IOU, MAXD)
        )(cand, ts, cidx)
        return acc + dets.sum() * 1e-9 + valid.sum() * 1e-9

    return jax.jit(fn)


modes = [
    "trunk", "boxtopk", "gather", "pair_rows_probe",
    "pair_old", "pair_new", "emit_old", "emit_new",
]
prev = {}
for mode in modes:
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
    print(f"{mode:18s} {dt * 1e3:8.2f} ms  {B / dt:8.0f} img/s  "
          f"(compile {comp:.0f}s)", flush=True)
    prev[mode] = dt

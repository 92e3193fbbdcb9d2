"""Single-launch ablation of the round-3 YOLOv5 serving tail (G=512 gather,
two-tier pool, key-ranked bf16). Cumulative variants of the full pipeline in
ONE jit each, chained through a scalar accumulator (CLAUDE.md measurement
rules — per-launch timings lie).

Stages: 0 trunk+decode | 1 +prefilter topk | 2 +row gathers |
        3 +pool build/rank/cert | 4 +emit (fixpoint NMS)  == full pipeline

    python tools/exp_ablate3.py [B] [iters] [f32|bf16] [fused] [stages...]

"fused" anywhere in argv switches every stage to the conf_fused tail
(predict(fuse_conf=True): trunk-side obj*cls + row max; no full-matrix
pass, no obj gather — the round-3 production path).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from edgeml_tpu.models.yolov5 import YoloV5, calibrate_bn
from edgeml_tpu.ops.nms import (
    MAX_WH, PAIR_G, PAIR_T, _emit, _select_pairs_fast, _gather_rows,
    _pack17, _unpack17, _use_keys, topk1d,
)
from edgeml_tpu.utils.synth import hash_uniform

FUSED = "fused" in sys.argv
ARGS = [a for a in sys.argv if a != "fused"]
B = int(ARGS[1]) if len(ARGS) > 1 else 128
ITERS = int(ARGS[2]) if len(ARGS) > 2 else 8
DT = jnp.bfloat16 if (len(ARGS) > 3 and ARGS[3] == "bf16") else None
N, NC, KB, MAXD = 25200, 80, 1024, 300
CONF, IOU = 1e-5, 0.6
G = min(PAIR_G, KB)
K = min(KB, KB * NC)

net = YoloV5(variant="n", num_classes=NC, img_size=640)
params, stats = net.init(jax.random.PRNGKey(0))
stats = calibrate_bn(
    net, params, stats, lambda i: hash_uniform(9000 + i, (8, 640, 640, 3))
)


def stage_pipeline(upto):
    def fn(acc, seed):
        imgs = hash_uniform(seed, (B, 640, 640, 3))
        obj, xywh, cls = net.predict(
            params, stats, imgs, dtype=DT, fuse_conf=FUSED
        )
        if upto == 0:
            return acc + obj.astype(jnp.float32).sum() * 1e-9 \
                + xywh.sum() * 1e-12 + cls.astype(jnp.float32).sum() * 1e-9

        by_key = _use_keys(cls[0], N, KB)

        def one(o, x, c, upto=upto, by_key=by_key):
            if FUSED:
                box_score = jnp.where(o > CONF, o, -1.0)
            else:
                best = jnp.max(c, axis=1) * o
                box_score = jnp.where((o > CONF) & (best > CONF), best, -1.0)
            if by_key:
                bt_k, box_pre = topk1d(_pack17(box_score), G + 1, chunk=N)
                best_top = _unpack17(bt_k, box_pre)
            else:
                best_top, box_pre = topk1d(box_score, G + 1, chunk=N)
            if upto == 1:
                return best_top.astype(jnp.float32).sum() * 1e-9 \
                    + box_pre.sum() * 1e-12
            xywh_pre, obj_pre, cls_rows = _gather_rows(
                box_pre[:G], x, None if FUSED else o, c
            )
            if upto == 2:
                return (xywh_pre.sum() * 1e-12
                        + (0.0 if FUSED
                           else obj_pre.astype(jnp.float32).sum() * 1e-9)
                        + cls_rows.astype(jnp.float32).sum() * 1e-9)
            ts, row, col, xp, ok = _select_pairs_fast(
                o, x, c, CONF, G, min(PAIR_T, NC), K, by_key, fused=FUSED
            )
            if upto == 3:
                return ts.astype(jnp.float32).sum() * 1e-9 \
                    + row.sum() * 1e-12 + col.sum() * 1e-12 \
                    + ok.astype(jnp.float32) * 1e-9
            bx = xp[row]
            half = bx[:, 2:4] * 0.5
            cand = jnp.concatenate([bx[:, :2] - half, bx[:, :2] + half], 1)
            scores = ts.astype(jnp.float32)
            cidx = col.astype(jnp.float32)
            if upto >= 5:  # emit substages
                off = cand + cidx[:, None] * MAX_WH
                kk = scores.shape[0]
                lo = jnp.maximum(off[:, None, :2], off[None, :, :2])
                hi = jnp.minimum(off[:, None, 2:4], off[None, :, 2:4])
                inter = jnp.prod(jnp.maximum(hi - lo, 0.0), axis=-1)
                area = jnp.prod(
                    jnp.maximum(off[:, 2:4] - off[:, :2], 0.0), axis=-1
                )
                iou = inter / jnp.maximum(
                    area[:, None] + area[None, :] - inter, 1e-12
                )
                rr = jax.lax.broadcasted_iota(jnp.int32, (kk, kk), 0)
                cc = jax.lax.broadcasted_iota(jnp.int32, (kk, kk), 1)
                sup = ((iou > IOU) & (cc < rr)).astype(jnp.bfloat16)
                valid = scores > 0.0
                if upto == 5:  # sup build only
                    return sup.astype(jnp.float32).sum() * 1e-9
                if upto == 6:  # + fixed-8 fori fixpoint (no convergence test)
                    def body(_, kept):
                        hit = sup @ kept.astype(jnp.bfloat16)
                        return valid & (hit < 0.5)
                    kept = jax.lax.fori_loop(0, 8, body, valid)
                    return kept.astype(jnp.float32).sum() * 1e-9
                # upto == 7: + while fixpoint (the production loop)
                def cond(cst):
                    return cst[1]
                def body(cst):
                    kept, _ = cst
                    hit = sup @ kept.astype(jnp.bfloat16)
                    new = valid & (hit < 0.5)
                    return new, jnp.any(new != kept)
                kept, _ = jax.lax.while_loop(
                    cond, body, (valid, jnp.asarray(True))
                )
                return kept.astype(jnp.float32).sum() * 1e-9
            dets, valid = _emit(cand, scores, cidx, IOU, MAXD)
            return dets.sum() * 1e-9 + valid.sum() * 1e-9

        if upto == 8:  # full pipeline with the FUSED Pallas suppressor
            from edgeml_tpu.ops.nms_fused import greedy_keep_mask_fused

            def sel(o, x, c, by_key=by_key):
                ts, row, col, xp, ok = _select_pairs_fast(
                    o, x, c, CONF, G, min(PAIR_T, NC), K, by_key, fused=FUSED
                )
                bx = xp[row]
                half = bx[:, 2:4] * 0.5
                cand = jnp.concatenate(
                    [bx[:, :2] - half, bx[:, :2] + half], 1
                )
                return cand, ts.astype(jnp.float32), col.astype(jnp.float32)

            cand, scores, cidx = jax.vmap(sel)(obj, xywh, cls)
            off = cand + cidx[..., None] * MAX_WH
            kept = greedy_keep_mask_fused(off, scores, IOU)

            def compact(cand, scores, cidx, kept):
                k = scores.shape[0]
                keep_rank = jnp.where(
                    kept, k - jax.lax.iota(jnp.int32, k), 0
                )
                rank_val, selx = jax.lax.top_k(keep_rank, MAXD)
                rows = jnp.concatenate(
                    [cand, scores[:, None], cidx[:, None]], axis=1
                )
                out = rows[selx] * (rank_val[:, None] > 0)
                return out.sum() * 1e-9

            return acc + jnp.sum(
                jax.vmap(compact)(cand, scores, cidx, kept)
            )

        return acc + jnp.sum(jax.vmap(one)(obj, xywh, cls))

    return fn


prev = 0.0
for st in ([int(a) for a in ARGS[4:]] or range(5)):
    step = jax.jit(stage_pipeline(st))
    t0 = time.perf_counter()
    # float() fetch, NOT block_until_ready: on the axon backend block is a
    # no-op for these programs (measured: a 134M-element IoU launch "blocks"
    # in 30 us; only a value fetch forces completion).
    float(step(jnp.zeros(()), 0))
    print(f"stage {st}: warmup {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    acc = jnp.zeros(())
    for i in range(ITERS):
        acc = step(acc, 1 + i)
    float(acc)
    ms = (time.perf_counter() - t0) / ITERS * 1e3
    print(
        f"stage {st}: {ms:8.2f} ms/batch  (+{ms - prev:7.2f})  "
        f"{B / ms * 1e3:7.1f} img/s",
        flush=True,
    )
    prev = ms

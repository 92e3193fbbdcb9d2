"""One-hot MXU matmul as the cls row gather (bf16 payloads only).

The tail's dominant serial cost is gathering the top-G boxes' class rows
from the (25200, 80) cls matrix: XLA row gathers run at ~16 cycles/row +
~1 cycle/element on the VPU (CLAUDE.md cost model; ~4.9 ms of the 7 ms
gather stage at G=384, B=128). A one-hot (G, N) @ (N, nc) matmul instead
streams the whole cls matrix through the MXU at HBM bandwidth (~4 MB /
819 GB/s ~= 5 us/image) with the one-hot operand fused from a compare-iota.

Exactness: at DEFAULT matmul precision operands round to bfloat16 — which
is lossless here because the cls payload IS bfloat16 and the one-hot is
0/1; each output element is a single bf16 value passed through. (The f32
serving path keeps narrow gathers: rounding f32 payloads would corrupt
them — CLAUDE.md. Also NOT safe for box coordinates, ever.)

Variants (cumulative single-jit pipelines, chained acc, one float() fetch):
  0  trunk + prefilter topk (floor)
  1  + narrow row gathers (xywh, obj, cls)      [the current production path]
  2  + row gathers with cls via one-hot matmul  (xywh/obj stay narrow)
  3  + one-hot for cls AND obj (obj as an extra matmul column)
  4  full pipeline, production (_select_pairs_fast + fused emit)
  5  full pipeline with the one-hot cls gather patched in

    python tools/exp_gather7.py [B] [iters] [stages...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from edgeml_tpu.models.yolov5 import YoloV5, calibrate_bn
from edgeml_tpu.ops import nms as nms_mod
from edgeml_tpu.ops.nms import (
    MAX_WH, PAIR_G, PAIR_T, _pack17, _select_pairs_fast, _unpack17,
    _use_keys, topk1d,
)
from edgeml_tpu.utils.synth import hash_uniform

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 8
DT = jnp.bfloat16
N, NC, KB, MAXD = 25200, 80, 1024, 300
CONF, IOU = 1e-5, 0.6
G = min(PAIR_G, KB)
K = KB

net = YoloV5(variant="n", num_classes=NC, img_size=640)
params, stats = net.init(jax.random.PRNGKey(0))
stats = calibrate_bn(
    net, params, stats, lambda i: hash_uniform(9000 + i, (8, 640, 640, 3))
)


def onehot_rows(box_pre, mat):
    """Gather mat[box_pre] via a fused one-hot MXU matmul (bf16 mat)."""
    n = mat.shape[0]
    oh = (box_pre[:, None] == jax.lax.iota(jnp.int32, n)[None, :]).astype(
        mat.dtype
    )
    return jax.lax.dot_general(
        oh, mat, (((1,), (0,)), ((), ())),
        preferred_element_type=mat.dtype,
    )


def stage_pipeline(upto):
    def fn(acc, seed):
        imgs = hash_uniform(seed, (B, 640, 640, 3))
        obj, xywh, cls = net.predict(params, stats, imgs, dtype=DT)
        by_key = _use_keys(cls[0], N, KB)
        assert by_key

        if upto in (4, 5):
            from edgeml_tpu.ops.nms_fused import greedy_keep_mask_fused

            def sel(o, x, c):
                ts, row, col, xp, ok = _select_pairs_fast(
                    o, x, c, CONF, G, min(PAIR_T, NC), K, by_key
                )
                bx = xp[row]
                half = bx[:, 2:4] * 0.5
                cand = jnp.concatenate(
                    [bx[:, :2] - half, bx[:, :2] + half], 1
                )
                return cand, ts.astype(jnp.float32), col.astype(jnp.float32)

            saved = nms_mod._GATHER_ONEHOT
            nms_mod._GATHER_ONEHOT = upto == 5  # 4: narrow, 5: one-hot
            try:
                cand, scores, cidx = jax.vmap(sel)(obj, xywh, cls)
            finally:
                nms_mod._GATHER_ONEHOT = saved
            off = cand + cidx[..., None] * MAX_WH
            kept = greedy_keep_mask_fused(off, scores, IOU)

            def compact(cand, scores, cidx, kept):
                kk = scores.shape[0]
                keep_rank = jnp.where(
                    kept, kk - jax.lax.iota(jnp.int32, kk), 0
                )
                rank_val, selx = jax.lax.top_k(keep_rank, MAXD)
                rows = jnp.concatenate(
                    [cand, scores[:, None], cidx[:, None]], axis=1
                )
                out = rows[selx] * (rank_val[:, None] > 0)
                return out.sum() * 1e-9

            return acc + jnp.sum(jax.vmap(compact)(cand, scores, cidx, kept))

        def one(o, x, c, upto=upto):
            best = jnp.max(c, axis=1) * o
            box_score = jnp.where((o > CONF) & (best > CONF), best, -1.0)
            bt_k, box_pre = topk1d(_pack17(box_score), G + 1, chunk=N)
            best_top = _unpack17(bt_k, box_pre)
            if upto == 0:
                return best_top.astype(jnp.float32).sum() * 1e-9 \
                    + box_pre.sum() * 1e-12
            bp = box_pre[:G]
            xywh_pre = x[bp]
            if upto == 1:
                obj_pre = o[bp]
                cls_rows = c[bp]
            elif upto == 2:
                obj_pre = o[bp]
                cls_rows = onehot_rows(bp, c)
            else:  # 3: obj folded into the matmul as one more column
                both = onehot_rows(bp, jnp.concatenate([c, o[:, None]], 1))
                cls_rows = both[:, :NC]
                obj_pre = both[:, NC]
            return (xywh_pre.sum() * 1e-12
                    + obj_pre.astype(jnp.float32).sum() * 1e-9
                    + cls_rows.astype(jnp.float32).sum() * 1e-9)

        return acc + jnp.sum(jax.vmap(one)(obj, xywh, cls))

    return fn


prev = 0.0
for st in ([int(a) for a in sys.argv[3:]] or range(4)):
    step = jax.jit(stage_pipeline(st))
    t0 = time.perf_counter()
    float(step(jnp.zeros(()), 0))  # fetch forces completion (axon: block lies)
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

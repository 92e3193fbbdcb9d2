"""Cumulative ablation of the RAW-TAIL serving pipeline + overlap probe.

Stages (each its own jit, chained acc, one float() fetch per region — the
only trustworthy staging method, CLAUDE.md):
  0  trunk + raw heads + trunk-side score (predict_raw)
  1  + box gate + prefilter topk (keyed, g+1)
  2  + one-hot row gather + per-row sigmoid/decode
  3  + two-tier pool rank + certificate
  4  + fused emit + compaction (full nms_split_batch_raw, flag mode)
  5  + letterbox unmap (= the whole tail, unpipelined)

Overlap probe: the pipelined production step runs THIS batch's trunk with
the PREVIOUS batch's tail in one program. Measures
  trunk-only, tail-only (carried pred as loop state), pipelined step
and reports overlap = trunk + tail - step (how much the XLA scheduler
actually interleaves MXU trunk with the serial VPU tail).

    python tools/exp_rawablate.py [B] [iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from edgeml_tpu.models.infer import _detect_pipe_step, _nms_unmap, _zero_carry
from edgeml_tpu.models.yolov5 import YoloV5, calibrate_bn
from edgeml_tpu.ops import nms as nms_mod
from edgeml_tpu.ops import nms_raw
from edgeml_tpu.utils.synth import hash_uniform

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 8
DT = jnp.bfloat16
CONF, IOU = 1e-5, 0.6

net = YoloV5(variant="n", num_classes=80, img_size=640)
params, stats = net.init(jax.random.PRNGKey(0))
stats = calibrate_bn(
    net, params, stats, lambda i: hash_uniform(9000 + i, (8, 640, 640, 3))
)
meta = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]]), (B, 1))
hw = jnp.tile(jnp.asarray([[640.0, 640.0]]), (B, 1))


def images(seed):
    return hash_uniform(seed, (B, 640, 640, 3))


def run(tag, fn, extra=()):
    step = jax.jit(fn)
    t0 = time.perf_counter()
    float(step(jnp.zeros(()), 0, *extra))
    print(f"{tag}: warmup {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    acc = jnp.zeros(())
    for i in range(ITERS):
        acc = step(acc, 1 + i, *extra)
    float(acc)
    ms = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{tag}: {ms:8.2f} ms/batch  {B / ms * 1e3:7.1f} img/s", flush=True)
    return ms


def stage(upto):
    geo = net.raw_geometry(params, DT)
    t_rows, g, k = nms_mod.PAIR_T, nms_mod.PAIR_G, 1024

    def fn(acc, seed):
        raw = net.predict_raw(params, stats, images(seed), dtype=DT)
        score, obj_s, xy, wh, cls = raw
        if upto == 0:
            return acc + score.astype(jnp.float32).sum() * 1e-9 \
                + xy.astype(jnp.float32).sum() * 1e-12 \
                + wh.astype(jnp.float32).sum() * 1e-12 \
                + cls.astype(jnp.float32).sum() * 1e-9
        by_key = nms_mod._use_keys(cls, score.shape[1], 1024)

        def one(s1, o1, xy1, wh1, c1):
            box_score = jnp.where((o1 > CONF) & (s1 > CONF), s1, -1.0)
            best_top, box_pre, hid = nms_mod._prefilter_boxes(
                box_score, g, by_key)
            if upto == 1:
                return best_top.astype(jnp.float32).sum() \
                    + box_pre.sum() * 1e-9
            cls_g, obj_g, xy_g, wh_g = nms_raw._gather_rows_raw(
                box_pre, o1, xy1, wh1, c1)
            cls_conf = jax.nn.sigmoid(cls_g) * obj_g[:, None]
            xywh_pre = nms_raw.decode_rows(geo, box_pre, xy_g, wh_g)
            if upto == 2:
                return cls_conf.astype(jnp.float32).sum() \
                    + xywh_pre.sum() * 1e-9
            ts, row, col, ok = nms_mod._pool_rank(
                best_top, hid, cls_conf, CONF, t_rows, k, by_key)
            return ts.astype(jnp.float32).sum() + xywh_pre.sum() * 1e-9 \
                + row.sum() * 1e-9 + ok.astype(jnp.float32)

        if upto <= 3:
            return acc + jnp.sum(jax.vmap(one)(score, obj_s, xy, wh, cls)) \
                * 1e-6
        if upto == 4:
            d, v, ok = nms_raw.nms_split_batch_raw(
                *raw, geo, CONF, IOU, fallback="flag")
            return acc + d.sum() * 1e-9 + v.sum() * 1e-9
        d, v, ok = _nms_unmap(raw + (geo,), meta, hw, CONF, IOU, 300, True,
                              fallback="flag")
        return acc + d.sum() * 1e-9 + v.sum() * 1e-9

    return fn


times = {}
for upto in range(6):
    times[upto] = run(f"stage {upto}", stage(upto))

# ---- overlap probe ---------------------------------------------------------
geo = net.raw_geometry(params, DT)


def trunk_only(acc, seed):
    raw = net.predict_raw(params, stats, images(seed), dtype=DT)
    return acc + raw[0].astype(jnp.float32).sum() * 1e-9


# tail-only: fixed pred computed once outside (JITTED — eager op-by-op on
# axon pads intermediates pathologically: a plain hash_uniform reshape
# tried a 26.8 GB allocation, r4e) and passed as ARGS — closing over the
# 516 MB arrays bakes them into the HLO upload (HTTP 413, r4f). Every
# launch still differs (acc chains, seed enters the sum): no relay cache.
PRED = tuple(jax.jit(
    lambda: net.predict_raw(params, stats, images(0), dtype=DT)
)()) + (geo,)


def tail_only(acc, seed, pred):
    d, v, ok = _nms_unmap(pred, meta, hw, CONF + 0.0, IOU, 300, True,
                          fallback="flag")
    return acc + d.sum() * 1e-9 + v.sum() * 1e-9 + seed * 1e-12


def pipe(acc_and_prev, seed):
    prev, acc = acc_and_prev
    nxt, d, v, ok = _detect_pipe_step(
        net, params, stats, prev, images(seed), meta, hw, CONF, IOU, dtype=DT
    )
    return (nxt, acc + d.sum() * 1e-9)


t_trunk = run("trunk-only", trunk_only)
t_tail = run("tail-only", tail_only, extra=(PRED,))

stepf = jax.jit(pipe)
carry = (_zero_carry(net, B, 640, DT), jnp.zeros(()))
t0 = time.perf_counter()
carry = stepf(carry, 0)
float(carry[1])
print(f"pipelined: warmup {time.perf_counter() - t0:.1f}s", flush=True)
t0 = time.perf_counter()
for i in range(ITERS):
    carry = stepf(carry, 1 + i)
float(carry[1])
t_pipe = (time.perf_counter() - t0) / ITERS * 1e3
print(f"pipelined: {t_pipe:8.2f} ms/batch  {B / t_pipe * 1e3:7.1f} img/s",
      flush=True)
print(
    f"overlap = trunk {t_trunk:.2f} + tail {t_tail:.2f} - step {t_pipe:.2f} "
    f"= {t_trunk + t_tail - t_pipe:.2f} ms", flush=True,
)

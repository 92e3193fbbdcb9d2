"""Two-tier pool vs FULL pool (PAIR_B1 = PAIR_G) on the raw tail.

The r4f/r4g ablations put the pool-rank stage at +3.6–3.9 ms/128-batch.
Its two-tier machinery ranks tier-2 rows with a per-row lax.top_k
((g-b1, nc) -> t_rows) and then a (14336,) k=1024 top_k. The FULL pool
(b1 >= g) skips the per-row top_k entirely and ranks the whole gathered
(g*nc = 30,720) key matrix in ONE top_k — bigger n, but XLA TopK cost is
shape-cliffy, not linear, and the in-pool certificate becomes trivially
True (the pool IS the gathered matrix; only the hidden-row check remains).

Stage-3 cumulative (trunk + prefilter + gather + pool rank) and the full
production step, two-tier vs full.

    python tools/exp_poolfull.py [B] [iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from edgeml_tpu.models.infer import _detect_pipe_step, _zero_carry
from edgeml_tpu.models.yolov5 import YoloV5, calibrate_bn
from edgeml_tpu.ops import nms as nms_mod
from edgeml_tpu.ops import nms_raw
from edgeml_tpu.utils.synth import hash_uniform

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 12
DT = jnp.bfloat16
CONF, IOU = 1e-5, 0.6

net = YoloV5(variant="n", num_classes=80, img_size=640)
params, stats = net.init(jax.random.PRNGKey(0))
stats = calibrate_bn(
    net, params, stats, lambda i: hash_uniform(9000 + i, (8, 640, 640, 3))
)
geo = net.raw_geometry(params, DT)
meta = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]]), (B, 1))
hw = jnp.tile(jnp.asarray([[640.0, 640.0]]), (B, 1))
g = nms_mod.PAIR_G


def time_step(tag, step, carry):
    t0 = time.perf_counter()
    c = step(carry, 0)
    float(c[-1] if isinstance(c, tuple) else c)
    print(f"{tag}: warmup {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for i in range(ITERS):
        c = step(c, 1 + i)
    last = c[-1] if isinstance(c, tuple) else c
    float(last)
    ms = (time.perf_counter() - t0) / ITERS * 1e3
    extra = ""
    if isinstance(c, tuple) and len(c) == 3:
        extra = f"  redos {int(c[2])}/{ITERS}"
    print(f"{tag}: {ms:8.2f} ms/batch  {B / ms * 1e3:7.1f} img/s{extra}",
          flush=True)


for name, b1 in (("two-tier", nms_mod.PAIR_B1), ("full-pool", 10**9)):
    saved = nms_mod.PAIR_B1
    nms_mod.PAIR_B1 = b1
    _detect_pipe_step.clear_cache()
    nms_raw.nms_split_batch_raw.clear_cache()
    try:
        @jax.jit
        def stage3(acc, seed):
            raw = net.predict_raw(
                params, stats, hash_uniform(seed, (B, 640, 640, 3)),
                dtype=DT)
            score, obj_s, xy, wh, cls = raw
            by_key = nms_mod._use_keys(cls, score.shape[1], 1024)

            def one(s1, o1, xy1, wh1, c1):
                box_score = jnp.where((o1 > CONF) & (s1 > CONF), s1, -1.0)
                best_top, box_pre, hid = nms_mod._prefilter_boxes(
                    box_score, g, by_key)
                cls_g, obj_g, xy_g, wh_g = nms_raw._gather_rows_raw(
                    box_pre, o1, xy1, wh1, c1)
                cls_conf = jax.nn.sigmoid(cls_g) * obj_g[:, None]
                xywh_pre = nms_raw.decode_rows(geo, box_pre, xy_g, wh_g)
                ts, row, col, ok = nms_mod._pool_rank(
                    best_top, hid, cls_conf, CONF, nms_mod.PAIR_T, 1024,
                    by_key)
                return ts.astype(jnp.float32).sum() \
                    + xywh_pre.sum() * 1e-9 + ok.astype(jnp.float32)

            return acc + jnp.sum(
                jax.vmap(one)(score, obj_s, xy, wh, cls)) * 1e-6

        time_step(f"{name} stage3", stage3, jnp.zeros(()))

        @jax.jit
        def full(carry, seed):
            prev, acc, nfail = carry
            nxt, d, _v, ok = _detect_pipe_step(
                net, params, stats, prev,
                hash_uniform(seed, (B, 640, 640, 3)),
                meta, hw, CONF, IOU, dtype=DT)
            return (nxt, acc + d.sum() * 1e-9,
                    nfail + (1 - ok.astype(jnp.int32)))

        time_step(f"{name} full  ", full,
                  (_zero_carry(net, B, 640, DT), jnp.zeros(()),
                   jnp.zeros((), jnp.int32)))
    finally:
        nms_mod.PAIR_B1 = saved
        _detect_pipe_step.clear_cache()
        nms_raw.nms_split_batch_raw.clear_cache()

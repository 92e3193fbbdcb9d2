"""Pool-ranking TopK A/B: lax.top_k vs exact chunked topk1d.

exp_rawablate (r4e) measured the pool-rank stage at +3.6 ms/128-batch; the
(14336,) k=1024 lax.top_k is the suspect (XLA TopK shape cliffs,
CLAUDE.md). This times the cumulative stage-3 pipeline (trunk + prefilter
+ gather + pool rank) under POOL_TOPK_CHUNK in {None, 4096, 7168}.

    python tools/exp_pooltopk.py [B] [iters] [chunks...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from edgeml_tpu.models.yolov5 import YoloV5, calibrate_bn
from edgeml_tpu.ops import nms as nms_mod
from edgeml_tpu.ops import nms_raw
from edgeml_tpu.utils.synth import hash_uniform

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 16
CHUNKS = [None if c == "none" else int(c) for c in (sys.argv[3:] or
                                                    ["none", "4096", "7168"])]
DT = jnp.bfloat16
CONF = 1e-5

net = YoloV5(variant="n", num_classes=80, img_size=640)
params, stats = net.init(jax.random.PRNGKey(0))
stats = calibrate_bn(
    net, params, stats, lambda i: hash_uniform(9000 + i, (8, 640, 640, 3))
)
geo = net.raw_geometry(params, DT)
t_rows, g, k = nms_mod.PAIR_T, nms_mod.PAIR_G, 1024

for chunk in CHUNKS:
    nms_mod.POOL_TOPK_CHUNK = chunk

    @jax.jit
    def step(acc, seed):
        raw = net.predict_raw(
            params, stats, hash_uniform(seed, (B, 640, 640, 3)), dtype=DT)
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
                best_top, hid, cls_conf, CONF, t_rows, k, by_key)
            return ts.astype(jnp.float32).sum() + xywh_pre.sum() * 1e-9 \
                + row.sum() * 1e-9 + ok.astype(jnp.float32)

        return acc + jnp.sum(jax.vmap(one)(score, obj_s, xy, wh, cls)) * 1e-6

    t0 = time.perf_counter()
    float(step(jnp.zeros(()), 0))
    print(f"chunk={chunk}: warmup {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    acc = jnp.zeros(())
    for i in range(ITERS):
        acc = step(acc, 1 + i)
    float(acc)
    ms = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"chunk={chunk}: {ms:8.2f} ms/batch", flush=True)
nms_mod.POOL_TOPK_CHUNK = None

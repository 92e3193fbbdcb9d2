"""POOL_SELECT A/B on the PRODUCTION pipelined serving step (bf16 tail).

The (30,720,)->1024 pool lax.top_k is ~3 ms of the ~23 ms B=128 bf16 step
(r4i exp_rawablate). ops/nms.py POOL_SELECT replaces it with an exact
threshold partial select (32 compare-count halvings to find the k-th key,
then a one-hot MXU / scatter compaction) — bit-identical on the unique
_pack17 keys (tests/test_nms_split_batch.py). This measures which selector
is fastest end to end in the production step. Chained launches, one float()
fetch per timed region (CLAUDE.md measurement rules).

    python tools/exp_poolsel.py [B] [iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

import edgeml_tpu.models.infer as infer_mod
import edgeml_tpu.ops.nms as nms_mod
import edgeml_tpu.ops.nms_raw as nms_raw_mod
from edgeml_tpu.models.infer import _detect_pipe_step, _zero_carry
from edgeml_tpu.models.yolov5 import YoloV5, calibrate_bn
from edgeml_tpu.utils.synth import hash_uniform

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 16
CONF, IOU = 1e-5, 0.6
DT = jnp.bfloat16  # POOL_SELECT applies to the keyed (bf16) path only

net = YoloV5(variant="n", num_classes=80, img_size=640)
params, stats = net.init(jax.random.PRNGKey(0))
stats = calibrate_bn(
    net, params, stats, lambda i: hash_uniform(9000 + i, (8, 640, 640, 3))
)
meta = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]]), (B, 1))
hw = jnp.tile(jnp.asarray([[640.0, 640.0]]), (B, 1))

assert infer_mod.RAW_TAIL == "bf16"

for mode in ("topk", "threshold", "scatter", "topk"):
    nms_mod.POOL_SELECT = mode
    # trace-time flag: clear every jitted wrapper on the path
    _detect_pipe_step.clear_cache()
    nms_raw_mod.nms_split_batch_raw.clear_cache()
    nms_mod.nms_split_batch.clear_cache()

    @jax.jit
    def step(carry, seed):
        prev, acc, nfail = carry
        imgs = hash_uniform(seed, (B, 640, 640, 3))
        nxt, d, v, ok = _detect_pipe_step(
            net, params, stats, prev, imgs, meta, hw, CONF, IOU, dtype=DT
        )
        return (nxt, acc + d.sum(), nfail + (1 - ok.astype(jnp.int32)))

    zero = (_zero_carry(net, B, 640, DT), jnp.zeros(()),
            jnp.zeros((), jnp.int32))
    t0 = time.perf_counter()
    carry = step(zero, 0)
    float(carry[1])
    print(f"{mode}: warmup {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for i in range(ITERS):
        carry = step(carry, 1 + i)
    acc = float(carry[1])
    el = time.perf_counter() - t0
    print(
        f"{mode:9s}: {el / ITERS * 1e3:7.2f} ms/batch  "
        f"{B * ITERS / el:7.1f} img/s  redos {int(carry[2])}/{ITERS}  "
        f"acc {acc:.1f}",
        flush=True,
    )
nms_mod.POOL_SELECT = "topk"

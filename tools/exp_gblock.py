"""RAW_GATHER blocked-one-hot A/B on the PRODUCTION pipelined serving step.

The concat one-hot materializes a (g, N) bf16 matrix (~19 MB/image at
N=25200 — ~2.5 GB HBM write+read per 128-batch, the r4e-measured gather
cost). The "blocked" layout splits the gather into a (g, N/blk) block
one-hot matmul + a per-row (g, blk) offset contraction: same MXU FLOPs,
~blk x less one-hot traffic, bit-identical results
(tests/test_nms_raw.py::test_gather_layouts_bit_identical). Chained
launches, one float() fetch per timed region.

    python tools/exp_gblock.py [B] [iters]
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
DT = jnp.bfloat16

net = YoloV5(variant="n", num_classes=80, img_size=640)
params, stats = net.init(jax.random.PRNGKey(0))
stats = calibrate_bn(
    net, params, stats, lambda i: hash_uniform(9000 + i, (8, 640, 640, 3))
)
meta = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]]), (B, 1))
hw = jnp.tile(jnp.asarray([[640.0, 640.0]]), (B, 1))

assert infer_mod.RAW_TAIL == "bf16"

for mode, blk in [("concat", None), ("blocked", 8), ("blocked", 16),
                  ("blocked", 32), ("blocked", 64), ("concat", None)]:
    nms_raw_mod.RAW_GATHER = mode
    if blk is not None:
        nms_raw_mod.GATHER_BLOCK = blk
    # trace-time flags: clear every jitted wrapper on the path
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
    print(f"{mode}/{blk}: warmup {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for i in range(ITERS):
        carry = step(carry, 1 + i)
    acc = float(carry[1])
    el = time.perf_counter() - t0
    print(
        f"{mode:8s} blk={str(blk):4s}: {el / ITERS * 1e3:7.2f} ms/batch  "
        f"{B * ITERS / el:7.1f} img/s  redos {int(carry[2])}/{ITERS}  "
        f"acc {acc:.1f}",
        flush=True,
    )
nms_raw_mod.RAW_GATHER = "concat"
nms_raw_mod.GATHER_BLOCK = 16

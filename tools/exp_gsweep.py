"""PAIR_G sweep on the production pipelined serving step (unfused tail).

The row-gather tier G is the tail's dominant serial cost (~1 cycle per
gathered element). Observed pair-holding stats (2560 calibrated images):
max 284 / mean 153 boxes of the top-1024 ever hold a top-1024 pair, so
G=384 keeps a ~100-box margin. This sweeps G downward and measures both
throughput and the certificate-failure rate (a failed batch is billed an
exact host-side redo in production, so the sweet spot is the smallest G
whose failures stay rare).

PAIR_G is a module constant read at trace time: each G re-sets it before
the first trace of a fresh step (fresh jit wrapper per G, empty cache).

    python tools/exp_gsweep.py [B] [iters] [dtype] [G values...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

import edgeml_tpu.ops.nms as nms_mod
from edgeml_tpu.models.infer import _detect_pipe_step, _zero_carry
from edgeml_tpu.ops.nms import nms_split_batch
from edgeml_tpu.models.yolov5 import YoloV5, calibrate_bn
from edgeml_tpu.utils.synth import hash_uniform

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 16
DT = {"f32": None, "bf16": jnp.bfloat16}[
    sys.argv[3] if len(sys.argv) > 3 else "bf16"
]
GS = [int(g) for g in sys.argv[4:]] or [256, 320, 384, 512]
CONF, IOU = 1e-5, 0.6

net = YoloV5(variant="n", num_classes=80, img_size=640)
params, stats = net.init(jax.random.PRNGKey(0))
stats = calibrate_bn(
    net, params, stats, lambda i: hash_uniform(9000 + i, (8, 640, 640, 3))
)
meta = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]]), (B, 1))
hw = jnp.tile(jnp.asarray([[640.0, 640.0]]), (B, 1))

for g in GS:
    nms_mod.PAIR_G = g
    # fresh traces: PAIR_G is read at trace time by BOTH jit layers, and a
    # nested jit's jaxpr is cached independently of the outer one — clearing
    # only _detect_pipe_step silently reuses the previous G's nms trace
    # (round 4: a 256/320/384/512 sweep measured G=256 four times, identical
    # timings and 12/16 redos at every point).
    _detect_pipe_step.clear_cache()
    nms_split_batch.clear_cache()

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
    print(f"G={g}: warmup {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for i in range(ITERS):
        carry = step(carry, 1 + i)
    float(carry[1])
    el = time.perf_counter() - t0
    print(
        f"G={g:4d}: {el / ITERS * 1e3:7.2f} ms/batch  "
        f"{B * ITERS / el:7.1f} img/s  redos {int(carry[2])}/{ITERS}",
        flush=True,
    )

"""Training-step batch-size sweep (YOLOv5n, bf16) — the cheap train-MFU
lever after exp_remat measured every remat policy NEGATIVE (backward is
recompute-dominated, not activation-traffic-bound). Bigger B raises the
implicit-GEMM row count per conv, filling MXU tiles that B=64 leaves
underfilled on the narrow-channel trunk. Param-state-chained launches,
float() fetch.

    python tools/exp_trainbatch.py [iters] [batches...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from edgeml_tpu.models.train import TrainConfig, make_train_step
from edgeml_tpu.models.yolov5 import YoloV5
from edgeml_tpu.utils.synth import hash_uniform

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 8
BATCHES = [int(a) for a in (sys.argv[2:] or ["64", "96", "128", "64"])]
NT = 32

net = YoloV5(variant="n", num_classes=80, img_size=640)
params, stats = net.init(jax.random.PRNGKey(0))

for B in BATCHES:
    trr = hash_uniform(123, (B, NT, 4)) * 0.4 + 0.2
    targets = jnp.concatenate(
        [jnp.zeros((B, NT, 1)), trr[..., :2], trr[..., 2:] * 0.3 + 0.05],
        axis=-1,
    )
    tvalid = jnp.ones((B, NT), bool)
    opt, step = make_train_step(net, TrainConfig(), dtype=jnp.bfloat16)
    opt_state = opt.init(params)

    @jax.jit
    def run_one(carry, seed, step=step, B=B, targets=targets, tvalid=tvalid):
        p, s, o, acc = carry
        imgs = hash_uniform(seed, (B, 640, 640, 3))
        p, s, o, loss, _ = step(p, s, o, imgs, targets, tvalid, 0.001)
        return (p, s, o, acc + loss)

    carry = (params, stats, opt_state, jnp.zeros(()))
    t0 = time.perf_counter()
    carry = run_one(carry, 0)
    float(carry[3])
    wu = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(ITERS):
        carry = run_one(carry, 1 + i)
    acc = float(carry[3])
    el = time.perf_counter() - t0
    print(
        f"bf16 B={B:4d}: {el / ITERS * 1e3:7.2f} ms/step  "
        f"{B * ITERS / el:7.1f} img/s  (warmup {wu:.1f}s, acc {acc:.3f})",
        flush=True,
    )

"""YOLOv5n training-step throughput on TPU (fwd + bwd + SGD update).

Chained launches, on-device synthetic images/targets.
Usage: python tools/exp_train_tp.py [batch] [iters] [f32|bf16]
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

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 8
DTYPE = jnp.bfloat16 if (len(sys.argv) > 3 and sys.argv[3] == "bf16") else None
NT = 32  # padded targets per image

net = YoloV5(variant="n", num_classes=80, img_size=640)
params, stats = net.init(jax.random.PRNGKey(0))
cfg = TrainConfig()
opt, step = make_train_step(net, cfg, dtype=DTYPE)
opt_state = opt.init(params)

# fixed padded targets: (B, NT, 5) rows [cls, x, y, w, h] normalized
tr = hash_uniform(123, (B, NT, 4)) * 0.4 + 0.2
targets = jnp.concatenate(
    [jnp.zeros((B, NT, 1)), tr[..., :2], tr[..., 2:] * 0.3 + 0.05], axis=-1
)
tvalid = jnp.ones((B, NT), bool)


@jax.jit
def run_one(carry, seed):
    params, stats, opt_state, acc = carry
    imgs = hash_uniform(seed, (B, 640, 640, 3))
    params, stats, opt_state, loss, _ = step(
        params, stats, opt_state, imgs, targets, tvalid, 0.001
    )
    return (params, stats, opt_state, acc + loss)


carry = (params, stats, opt_state, jnp.zeros(()))
t0 = time.perf_counter()
carry = run_one(carry, 0)
jax.block_until_ready(carry)
print(f"warmup incl. compile: {time.perf_counter() - t0:.1f}s", flush=True)
t0 = time.perf_counter()
for i in range(ITERS):
    carry = run_one(carry, 1 + i)
jax.block_until_ready(carry)
dt = (time.perf_counter() - t0) / ITERS
print(f"train step B={B}: {dt * 1e3:.2f} ms/step  {B / dt:.1f} img/s  "
      f"(loss {float(carry[3]):.3f})", flush=True)

"""TRAIN_REMAT policy A/B on the YOLOv5n training step (fwd+bwd+SGD).

The r4 train ablation (exp_train_ablate): fwd 18.79 ms | grad 78.58 |
step 80.32 at B=64 bf16 — backward 3x forward vs a 2x FLOP ratio; the
excess is saved-activation traffic. jax.checkpoint policies trade that
for recompute (models/train.py TRAIN_REMAT; gradients bit-identical).
Param-state-chained launches, float() fetch.

    python tools/exp_remat.py [B] [iters] [dtypes...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

import edgeml_tpu.models.train as tr
from edgeml_tpu.models.train import TrainConfig, make_train_step
from edgeml_tpu.models.yolov5 import YoloV5
from edgeml_tpu.utils.synth import hash_uniform

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 8
DTS = [{"f32": None, "bf16": jnp.bfloat16}[d]
       for d in (sys.argv[3:] or ["bf16", "f32"])]
NT = 32

net = YoloV5(variant="n", num_classes=80, img_size=640)
params, stats = net.init(jax.random.PRNGKey(0))
trr = hash_uniform(123, (B, NT, 4)) * 0.4 + 0.2
targets = jnp.concatenate(
    [jnp.zeros((B, NT, 1)), trr[..., :2], trr[..., 2:] * 0.3 + 0.05], axis=-1
)
tvalid = jnp.ones((B, NT), bool)

for dt in DTS:
    dname = "f32" if dt is None else "bf16"
    for pol in (None, "dots", "nothing"):
        tr.TRAIN_REMAT = pol
        opt, step = make_train_step(net, TrainConfig(), dtype=dt)
        opt_state = opt.init(params)

        @jax.jit
        def run_one(carry, seed, step=step):
            p, s, o, acc = carry
            imgs = hash_uniform(seed, (B, 640, 640, 3))
            p, s, o, loss, _ = step(p, s, o, imgs, targets, tvalid, 0.001)
            return (p, s, o, acc + loss)

        carry = (params, stats, opt_state, jnp.zeros(()))
        t0 = time.perf_counter()
        carry = run_one(carry, 0)
        float(carry[3])
        print(f"{dname} remat={pol}: warmup {time.perf_counter() - t0:.1f}s",
              flush=True)
        t0 = time.perf_counter()
        for i in range(ITERS):
            carry = run_one(carry, 1 + i)
        acc = float(carry[3])
        el = time.perf_counter() - t0
        print(
            f"{dname} remat={str(pol):7s}: {el / ITERS * 1e3:7.2f} ms/step  "
            f"{B * ITERS / el:7.1f} img/s  acc {acc:.3f}",
            flush=True,
        )
tr.TRAIN_REMAT = None

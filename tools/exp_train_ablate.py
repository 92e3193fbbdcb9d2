"""Cumulative ablation of the YOLOv5n training step: where do the training
milliseconds go, and does the C3 cv1/cv2 fused conv help the bwd pass?

Variants are CUMULATIVE programs inside one jit each (per-launch dispatch
overhead is process-state dependent — CLAUDE.md measurement rules), chained
through the param/accumulator state with one final value fetch:

  fwd    train-mode forward only (heads summed)
  loss   forward + yolo_loss
  grad   value_and_grad (fwd + bwd), gradients consumed by a scalar sum
  step   the production train step (fwd + bwd + optimizer update)
  step+fuse  the production step with C3_FUSE_CV12 on

    python tools/exp_train_ablate.py [B] [iters] [f32|bf16]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

import edgeml_tpu.models.yolov5 as y5
from edgeml_tpu.models.loss import yolo_loss
from edgeml_tpu.models.train import TrainConfig, amp_cast, make_train_step
from edgeml_tpu.models.yolov5 import YoloV5
from edgeml_tpu.utils.synth import hash_uniform

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 8
DTYPE = jnp.bfloat16 if (len(sys.argv) > 3 and sys.argv[3] == "bf16") else None
NT = 32

net = YoloV5(variant="n", num_classes=80, img_size=640)
params, stats = net.init(jax.random.PRNGKey(0))
cfg = TrainConfig()

tr = hash_uniform(123, (B, NT, 4)) * 0.4 + 0.2
targets = jnp.concatenate(
    [jnp.zeros((B, NT, 1)), tr[..., :2], tr[..., 2:] * 0.3 + 0.05], axis=-1
)
tvalid = jnp.ones((B, NT), bool)


def fwd_heads(p, images):
    p_c = amp_cast(p, DTYPE)
    x = images if DTYPE is None else images.astype(DTYPE)
    heads, new_stats, _ = net.apply(p_c, stats, x, train=True)
    if DTYPE is not None:
        heads = [h.astype(jnp.float32) for h in heads]
    return heads


def loss_of(p, images):
    total, _ = yolo_loss(net, fwd_heads(p, images), targets, tvalid)
    return total


@jax.jit
def run_fwd(carry, seed):
    acc = carry
    heads = fwd_heads(params, hash_uniform(seed, (B, 640, 640, 3)))
    return acc + sum(h.sum() for h in heads)


@jax.jit
def run_loss(carry, seed):
    return carry + loss_of(params, hash_uniform(seed, (B, 640, 640, 3)))


@jax.jit
def run_grad(carry, seed):
    loss, grads = jax.value_and_grad(loss_of)(
        params, hash_uniform(seed, (B, 640, 640, 3))
    )
    gsum = sum(g.sum() for g in jax.tree_util.tree_leaves(grads))
    return carry + loss + 0.0 * gsum


def time_stage(name, fn, zero):
    t0 = time.perf_counter()
    c = fn(zero, 0)
    jax.tree_util.tree_map(lambda a: float(jnp.asarray(a).reshape(-1)[0]),
                           c if isinstance(c, tuple) else (c,))
    warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(ITERS):
        c = fn(c, 1 + i)
    last = c[-1] if isinstance(c, tuple) else c
    float(jnp.asarray(last).reshape(-1)[0])
    el = time.perf_counter() - t0
    print(f"{name:10s} {el / ITERS * 1e3:8.2f} ms/batch "
          f"{B * ITERS / el:7.1f} img/s  (warmup {warm:.1f}s)", flush=True)


time_stage("fwd", run_fwd, jnp.zeros(()))
time_stage("loss", run_loss, jnp.zeros(()))
time_stage("grad", run_grad, jnp.zeros(()))

for fuse in (False, True):
    y5.C3_FUSE_CV12 = fuse
    opt, step = make_train_step(net, cfg, dtype=DTYPE)
    opt_state = opt.init(params)

    @jax.jit
    def run_step(carry, seed, step=step):
        p, s, o, acc = carry
        imgs = hash_uniform(seed, (B, 640, 640, 3))
        p, s, o, loss, _ = step(p, s, o, imgs, targets, tvalid, 0.001)
        return (p, s, o, acc + loss)

    time_stage("step+fuse" if fuse else "step", run_step,
               (params, stats, opt_state, jnp.zeros(())))
y5.C3_FUSE_CV12 = False

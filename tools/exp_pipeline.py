"""Can XLA overlap the MXU trunk with the serial VPU tail across batches?

step(carry, imgs): carry holds the PREVIOUS batch's trunk outputs; the jit
computes the new trunk AND the previous batch's tail (independent chains).
If the scheduler interleaves them, steady-state cost ≈ max(trunk, tail)
instead of trunk + tail.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from edgeml_tpu.models.yolov5 import YoloV5
from edgeml_tpu.ops.nms import nms_split

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
ITERS = 10
N, NC = 25200, 80

net = YoloV5(variant="n", num_classes=NC, img_size=640)
params, stats = net.init(jax.random.PRNGKey(0))


def tail(obj, xywh, cls):
    dets, valid = jax.vmap(
        lambda o, x, c: nms_split(o, x, c, 1e-3, 0.6)
    )(obj, xywh, cls)
    return dets.sum() * 1e-9 + valid.sum() * 1e-9


@jax.jit
def step_seq(acc, seed):
    imgs = jax.random.uniform(
        jax.random.PRNGKey(seed), (B, 640, 640, 3), jnp.float32
    )
    obj, xywh, cls = net.predict(params, stats, imgs, dtype=jnp.bfloat16)
    return acc + tail(obj, xywh, cls)


@jax.jit
def step_pipe(carry, seed):
    prev, acc = carry
    imgs = jax.random.uniform(
        jax.random.PRNGKey(seed), (B, 640, 640, 3), jnp.float32
    )
    new = net.predict(params, stats, imgs, dtype=jnp.bfloat16)
    acc = acc + tail(*prev)
    return (new, acc)


def timed(name, launch, init):
    st = launch(init, 0)
    jax.block_until_ready(st)
    t0 = time.perf_counter()
    for i in range(ITERS):
        st = launch(st, 1 + i)
    jax.block_until_ready(st)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:24s} {dt * 1e3:8.2f} ms  {B / dt:8.0f} img/s", flush=True)


timed("sequential", step_seq, jnp.zeros(()))

zero = (
    jnp.zeros((B, N), jnp.float32),
    jnp.zeros((B, N, 4), jnp.float32),
    jnp.zeros((B, N, NC), jnp.float32),
)
timed("pipelined", lambda st, s: step_pipe(st, s), (zero, jnp.zeros(())))

"""Does prior trunk compilation/execution slow later small kernels?"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from edgeml_tpu.models.yolov5 import YoloV5
from edgeml_tpu.ops import nms as nms_mod

B, N, NC, KB = 128, 25200, 80, 1024
ITERS = 8


def timed(name, fn, *args):
    acc = jnp.zeros(())
    acc = fn(acc, jnp.float32(0.0), *args)
    float(acc)  # value fetch; block_until_ready is a no-op on axon
    t0 = time.perf_counter()
    for i in range(ITERS):
        acc = fn(acc, jnp.float32(i), *args)
    float(acc)  # value fetch; block_until_ready is a no-op on axon
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:26s} {dt * 1e3:8.2f} ms/iter", flush=True)
    return dt


rng = np.random.default_rng(0)
cls = jnp.asarray(rng.random((B, N, NC), np.float32))
obj = jnp.asarray((rng.random((B, N)) * 0.002).astype(np.float32))
xywh = jnp.asarray(np.concatenate(
    [rng.uniform(0, 640, (B, N, 2)), rng.uniform(4, 200, (B, N, 2))], -1
).astype(np.float32))
bp = jnp.asarray(rng.integers(0, N, size=(B, KB)).astype(np.int32))


@jax.jit
def gathers(acc, salt, x, o, c, i):
    def one(xx, oo, cc, ii):
        return xx[ii], oo[ii], cc[ii]
    xg, og, cg = jax.vmap(one)(x, o, c, i)
    return acc + xg.sum() * 1e-12 + og.sum() * 1e-9 + cg.sum() * 1e-9 + salt * 0


timed("gathers BEFORE trunk", gathers, xywh, obj, cls, bp)

net = YoloV5(variant="n", num_classes=NC, img_size=640)
params, stats = net.init(jax.random.PRNGKey(0))
images = jnp.asarray(rng.random((B, 640, 640, 3), np.float32))


@partial(jax.jit, static_argnames=("dtype",))
def trunk(acc, salt, images, dtype=None):
    o, x, c = net.predict(params, stats, images + salt * 1e-9, dtype=dtype)
    return acc + o.astype(jnp.float32).sum() * 1e-12

timed("trunk f32", lambda a, s: trunk(a, s, images))
timed("gathers AFTER trunk f32", gathers, xywh, obj, cls, bp)
timed("trunk bf16", lambda a, s: trunk(a, s, images, dtype=jnp.bfloat16))
timed("gathers AFTER trunk bf16", gathers, xywh, obj, cls, bp)

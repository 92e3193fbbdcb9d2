"""Characterize the post-trunk per-launch slowdown: what pays it?"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from edgeml_tpu.models.yolov5 import YoloV5

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
    print(f"{name:34s} {dt * 1e3:8.2f} ms/iter", flush=True)
    return dt


def timed_nosalt(name, fn, *args):
    acc = jnp.zeros(())
    acc = fn(acc, *args)
    float(acc)  # value fetch; block_until_ready is a no-op on axon
    t0 = time.perf_counter()
    for _ in range(ITERS):
        acc = fn(acc, *args)
    float(acc)  # value fetch; block_until_ready is a no-op on axon
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:34s} {dt * 1e3:8.2f} ms/iter", flush=True)
    return dt


rng = np.random.default_rng(0)
cls = jnp.asarray(rng.random((B, N, NC), np.float32))
bp = jnp.asarray(rng.integers(0, N, size=(B, KB)).astype(np.int32))
salts = [jnp.float32(i) for i in range(ITERS + 1)]
for s in salts:
    s.block_until_ready()


@jax.jit
def trivial(acc, salt):
    return acc + salt * 2.0


@jax.jit
def gat(acc, salt, c, i):
    g = jax.vmap(lambda cc, ii: cc[ii])(c, i)
    return acc + g.sum() * 1e-9 + salt * 0


@jax.jit
def gat_nosalt(acc, c, i):
    g = jax.vmap(lambda cc, ii: cc[ii])(c, i)
    return acc + g.sum() * 1e-9


def timed_dsalt(name, fn, *args):
    acc = jnp.zeros(())
    acc = fn(acc, salts[-1], *args)
    float(acc)  # value fetch; block_until_ready is a no-op on axon
    t0 = time.perf_counter()
    for i in range(ITERS):
        acc = fn(acc, salts[i], *args)
    float(acc)  # value fetch; block_until_ready is a no-op on axon
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:34s} {dt * 1e3:8.2f} ms/iter", flush=True)
    return dt


timed("trivial BEFORE", trivial)
timed("gat BEFORE", gat, cls, bp)

net = YoloV5(variant="n", num_classes=NC, img_size=640)
params, stats = net.init(jax.random.PRNGKey(0))
images = jnp.asarray(rng.random((B, 640, 640, 3), np.float32))


@partial(jax.jit, static_argnames=("dtype",))
def trunk(acc, salt, images, dtype=None):
    o, x, c = net.predict(params, stats, images + salt * 1e-9, dtype=dtype)
    return acc + o.astype(jnp.float32).sum() * 1e-12

timed("trunk f32", lambda a, s: trunk(a, s, images))

timed("trivial AFTER", trivial)
timed_dsalt("trivial AFTER dev-salt", trivial)
timed("gat AFTER", gat, cls, bp)
timed_dsalt("gat AFTER dev-salt", gat, cls, bp)
timed_nosalt("gat AFTER no-salt", gat_nosalt, cls, bp)
timed("trunk f32 again", lambda a, s: trunk(a, s, images))

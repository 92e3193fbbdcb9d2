"""Resolve the gather timing discrepancy: same op, salt-dependent inputs."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

B, N, K = 128, 25200, 1024
ITERS = 16


def timed(name, fn, *args):
    acc = jnp.zeros(())
    acc = fn(acc, jnp.float32(0.0), *args)
    float(acc)  # value fetch; block_until_ready is a no-op on axon
    t0 = time.perf_counter()
    for i in range(ITERS):
        acc = fn(acc, jnp.float32(i), *args)
    float(acc)  # value fetch; block_until_ready is a no-op on axon
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:34s} {dt * 1e3:8.2f} ms/iter")
    return dt


rng = np.random.default_rng(0)
cls = jnp.asarray(rng.random((B, N, 80), np.float32))
idx = jnp.asarray(rng.integers(0, N, size=(B, K)).astype(np.int32))


@jax.jit
def gat_salted_idx(acc, salt, c, i):
    i = jnp.minimum(i + salt.astype(jnp.int32), N - 1)  # real dependency
    g = jax.vmap(lambda cc, ii: cc[ii])(c, i)
    return acc + g.sum() * 1e-9


@jax.jit
def gat_salted_cls(acc, salt, c, i):
    c = c + salt * 1e-9  # forces a fresh read/materialization of cls
    g = jax.vmap(lambda cc, ii: cc[ii])(c, i)
    return acc + g.sum() * 1e-9


@jax.jit
def gat_const(acc, salt, c, i):
    g = jax.vmap(lambda cc, ii: cc[ii])(c, i)
    return acc + g.sum() * 1e-9 + salt * 0


timed("gather const inputs", gat_const, cls, idx)
timed("gather salted idx", gat_salted_idx, cls, idx)
timed("gather salted cls (adds copy)", gat_salted_cls, cls, idx)

# the exp_topk variant verbatim: idx from a prior top_k output
from edgeml_tpu.ops import nms as nms_mod

x_h = (rng.random((B, N)) * 0.002).astype(np.float32)
hot = rng.integers(0, N, size=(B, 400))
for b in range(B):
    x_h[b, hot[b]] = rng.random(400) * 0.9 + 0.05
x = jnp.asarray(x_h)
_, bp = jax.jit(jax.vmap(lambda r: nms_mod.topk1d(r, K)))(x)
bp = jax.block_until_ready(bp)
timed("gather const, topk-idx", gat_const, cls, bp)
timed("gather salted idx, topk-idx", gat_salted_idx, cls, bp)

# ---- bisect the profiler's slow gathers ------------------------------------
print("--- bisect ---")
tile = rng.dirichlet(np.ones(80) * 0.2, size=(B, 512)).astype(np.float32)
cls_dir = jnp.asarray(np.tile(tile, (1, (N + 511) // 512, 1))[:, :N])
obj_v = jnp.asarray(x_h)
xywh = jnp.asarray(np.concatenate(
    [rng.uniform(0, 640, (B, N, 2)), rng.uniform(4, 200, (B, N, 2))], -1
).astype(np.float32))


@jax.jit
def gathers3(acc, salt, x, o, c, i):
    def one(xx, oo, cc, ii):
        return xx[ii], oo[ii], cc[ii]
    xg, og, cg = jax.vmap(one)(x, o, c, i)
    return acc + xg.sum() * 1e-12 + og.sum() * 1e-9 + cg.sum() * 1e-9 + salt * 0


timed("3-gathers, uniform cls", gathers3, xywh, obj_v, cls, bp)
timed("3-gathers, dirichlet cls", gathers3, xywh, obj_v, cls_dir, bp)
timed("1-gather, dirichlet cls", gat_const, cls_dir, bp)
cls_dir2 = jnp.maximum(cls_dir, 1e-20)  # clear subnormals
timed("1-gather, dirichlet clamped", gat_const, cls_dir2, bp)
nsub = int(jnp.sum((cls_dir > 0) & (cls_dir < 1.2e-38)))
print("subnormal count in dirichlet cls:", nsub)

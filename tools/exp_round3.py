"""Residual-tail experiments: box-topk chunking, conv2 s2d, NMS unroll."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from edgeml_tpu.models.common import silu
from edgeml_tpu.models.yolov5 import YoloV5
from edgeml_tpu.ops.nms import topk1d

B = 128
N, NC, KB = 25200, 80, 1024

net = YoloV5(variant="n", num_classes=NC, img_size=640)
params, stats = net.init(jax.random.PRNGKey(0))


def cheap(seed, shape, dtype=jnp.float32):
    n = 1
    for d in shape:
        n *= d
    i = jax.lax.broadcasted_iota(jnp.uint32, (n,), 0)
    h = (i + jnp.uint32(seed)) * jnp.uint32(2654435761)
    h = h ^ (h >> 15)
    h = h * jnp.uint32(2246822519)
    return ((h >> 8).astype(dtype) * (1.0 / (1 << 24))).reshape(shape)


def timed(name, fn, iters=8):
    acc = fn(jnp.zeros(()), 0)
    float(acc)  # value fetch; block_until_ready is a no-op on axon
    t0 = time.perf_counter()
    for i in range(iters):
        acc = fn(acc, 1 + i)
    float(acc)  # value fetch; block_until_ready is a no-op on axon
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:36s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


which = sys.argv[1] if len(sys.argv) > 1 else "all"

if which in ("all", "boxtopk"):
    # box-score topk over (25200,) per image, in-context after the trunk
    def build(chunk):
        def fn(acc, seed):
            imgs = cheap(seed, (B, 640, 640, 3))
            obj, xywh, cls = net.predict(params, stats, imgs,
                                         dtype=jnp.bfloat16)

            def one(o, c):
                best = jnp.max(c, axis=1) * o
                bs = jnp.where((o > 1e-5) & (best > 1e-5), best, -1.0)
                v, i = topk1d(bs, KB, chunk=chunk)
                return v.astype(jnp.float32).sum() + i.sum() * 1e-9

            return acc + jax.vmap(one)(obj, cls).sum()

        return jax.jit(fn)

    for chunk in (10240, 5120, 4096, 3072, 25600):
        timed(f"box topk chunk={chunk}", build(chunk))

if which in ("all", "conv2"):
    kw = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 16, 32),
                           jnp.bfloat16) * 0.1

    @jax.jit
    def conv2_direct(acc, seed):
        x = cheap(seed, (B, 320, 320, 16), jnp.bfloat16)
        y = jax.lax.conv_general_dilated(
            x, kw, (2, 2), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return acc + silu(y).sum().astype(jnp.float32)

    # zero-pad 3x3 to 4x4 (extra row/col at the FRONT so taps align with
    # p=1), then s2d: 2x2 s1 conv on (160, 160, 64)
    kw4 = jnp.zeros((4, 4, 16, 32), jnp.bfloat16).at[1:, 1:].set(kw)
    kw_s2d = (
        kw4.reshape(2, 2, 2, 2, 16, 32)
        .transpose(0, 2, 1, 3, 4, 5)
        .reshape(2, 2, 64, 32)
    )

    @jax.jit
    def conv2_s2d(acc, seed):
        x = cheap(seed, (B, 320, 320, 16), jnp.bfloat16)
        xs = (
            x.reshape(B, 160, 2, 160, 2, 16)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(B, 160, 160, 64)
        )
        y = jax.lax.conv_general_dilated(
            xs, kw_s2d, (1, 1), [(1, 0), (1, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return acc + silu(y).sum().astype(jnp.float32)

    d = timed("conv2 k3s2 16->32 direct", conv2_direct)
    s = timed("conv2 s2d k2s1 64->32", conv2_s2d)

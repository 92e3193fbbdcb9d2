"""Separate input-generation cost from stem cost; test cheap generators.

threefry uniform over (128, 640, 640, 3) may dominate the 'stem' timing and
inflates every e2e serving number (bench generates images in-loop).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from edgeml_tpu.models.common import silu

B = 128


def timed(name, fn, iters=8):
    acc = fn(jnp.zeros(()), 0)
    float(acc)  # value fetch; block_until_ready is a no-op on axon
    t0 = time.perf_counter()
    for i in range(iters):
        acc = fn(acc, 1 + i)
    float(acc)  # value fetch; block_until_ready is a no-op on axon
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:34s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


def cheap_images(seed, dtype=jnp.bfloat16):
    """Multiplicative-hash pseudo-images in [0, 1): a few VPU ops/element."""
    n = B * 640 * 640 * 3
    i = jax.lax.broadcasted_iota(jnp.uint32, (n,), 0)
    h = (i + jnp.uint32(seed)) * jnp.uint32(2654435761)
    h = h ^ (h >> 15)
    h = h * jnp.uint32(2246822519)
    return (h >> 8).astype(dtype) * (1.0 / (1 << 24))


@jax.jit
def gen_threefry(acc, seed):
    x = jax.random.uniform(jax.random.PRNGKey(seed), (B, 640, 640, 3),
                           jnp.bfloat16)
    return acc + x.sum().astype(jnp.float32)


@jax.jit
def gen_cheap(acc, seed):
    x = cheap_images(seed)
    return acc + x.sum().astype(jnp.float32)


kw = jax.random.normal(jax.random.PRNGKey(0), (6, 6, 3, 16), jnp.bfloat16) * 0.1
kw_s2d = (
    kw.reshape(3, 2, 3, 2, 3, 16)
    .transpose(0, 2, 1, 3, 4, 5)
    .reshape(3, 3, 12, 16)
)


@jax.jit
def stem_cheap(acc, seed):
    x = cheap_images(seed).reshape(B, 640, 640, 3)
    y = jax.lax.conv_general_dilated(
        x, kw, (2, 2), [(2, 2), (2, 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return acc + silu(y).sum().astype(jnp.float32)


@jax.jit
def stem_s2d_cheap(acc, seed):
    x = cheap_images(seed).reshape(B, 640, 640, 3)
    xs = (
        x.reshape(B, 320, 2, 320, 2, 3)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(B, 320, 320, 12)
    )
    y = jax.lax.conv_general_dilated(
        xs, kw_s2d, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return acc + silu(y).sum().astype(jnp.float32)


@jax.jit
def stem_s2d_slices(acc, seed):
    x = cheap_images(seed).reshape(B, 640, 640, 3)
    xs = jnp.concatenate(
        [x[:, i::2, j::2, :] for i in (0, 1) for j in (0, 1)], axis=-1
    )  # (B, 320, 320, 12), channel order (i, j, c) — same as kw_s2d
    y = jax.lax.conv_general_dilated(
        xs, kw_s2d, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return acc + silu(y).sum().astype(jnp.float32)


timed("gen threefry", gen_threefry)
timed("gen cheap hash", gen_cheap)
timed("stem direct (cheap gen)", stem_cheap)
timed("stem s2d transpose (cheap gen)", stem_s2d_cheap)
timed("stem s2d slices (cheap gen)", stem_s2d_slices)

"""Trunk-side experiments + e2e confirmation of the pipelined serving loop.

1) bench.run_yolo() — the production pipelined loop, f32 + bf16.
2) stem cost: k6 s2 3->16 conv on (B, 640, 640, 3) vs the space-to-depth
   equivalent (reshape to (B, 320, 320, 12), k3 s1 conv — identical math,
   better channel tiling).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

B = 128


def timed(name, fn, iters=8):
    acc = fn(jnp.zeros(()), 0)
    float(acc)  # value fetch; block_until_ready is a no-op on axon
    t0 = time.perf_counter()
    for i in range(iters):
        acc = fn(acc, 1 + i)
    float(acc)  # value fetch; block_until_ready is a no-op on axon
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:28s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


if "stem" in sys.argv or len(sys.argv) == 1:
    from edgeml_tpu.models.common import silu

    kw = jax.random.normal(jax.random.PRNGKey(0), (6, 6, 3, 16),
                           jnp.bfloat16) * 0.1

    @jax.jit
    def stem_direct(acc, seed):
        x = jax.random.uniform(jax.random.PRNGKey(seed), (B, 640, 640, 3),
                               jnp.bfloat16)
        y = jax.lax.conv_general_dilated(
            x, kw, (2, 2), [(2, 2), (2, 2)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return acc + silu(y).sum().astype(jnp.float32)

    # space-to-depth: x2x2 blocks -> 12 channels, kernel becomes 3x3 s1
    kw_s2d = (
        kw.reshape(3, 2, 3, 2, 3, 16)
        .transpose(0, 2, 1, 3, 4, 5)
        .reshape(3, 3, 12, 16)
    )

    @jax.jit
    def stem_s2d(acc, seed):
        x = jax.random.uniform(jax.random.PRNGKey(seed), (B, 640, 640, 3),
                               jnp.bfloat16)
        xs = (
            x.reshape(B, 320, 2, 320, 2, 3)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(B, 320, 320, 12)
        )
        y = jax.lax.conv_general_dilated(
            xs, kw_s2d, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return acc + silu(y).sum().astype(jnp.float32)

    timed("stem k6s2 3->16 direct", stem_direct)
    timed("stem s2d k3s1 12->16", stem_s2d)

if "e2e" in sys.argv or len(sys.argv) == 1:
    os.environ.setdefault("BENCH_YOLO_ITERS", "10")
    import bench

    out = bench.run_yolo()
    print("e2e pipelined:", out, flush=True)

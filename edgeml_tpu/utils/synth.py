"""Synthetic on-device benchmark inputs.

Benchmark inputs must be generated ON DEVICE from a per-iteration seed so
chained launches cannot be relay-cached (CLAUDE.md measurement rules), but
jax.random's threefry costs ~8 ms per (128, 640, 640, 3) batch on v5e —
billed to whatever is being measured. This multiplicative-hash generator is
a few VPU ops per element and serves the same purpose.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def hash_uniform(seed, shape, dtype=jnp.float32):
    """Pseudo-uniform values in [0, 1) from a cheap integer hash.

    Not statistically strong — do NOT use for training/sampling; use
    jax.random there. For benchmark inputs only, where per-iteration
    freshness (cache busting) is the requirement.
    """
    n = 1
    for d in shape:
        n *= d
    i = jax.lax.broadcasted_iota(jnp.uint32, (n,), 0)
    h = (i + jnp.uint32(seed)) * jnp.uint32(2654435761)
    h = h ^ (h >> 15)
    h = h * jnp.uint32(2246822519)
    return ((h >> 8).astype(dtype) * (1.0 / (1 << 24))).reshape(shape)


def hash_u8(seed, shape):
    """Pseudo-uniform uint8 pixels from the same hash — the deployment
    input interface (models/infer.py accepts uint8 batches and fuses the
    /255 normalize into the serving-dtype convert). Writing the generated
    batch costs 1/4 of hash_uniform's f32 (157 vs 629 MB per 128x640^2
    batch), so the serving bench bills input materialization at the size
    production actually streams."""
    n = 1
    for d in shape:
        n *= d
    i = jax.lax.broadcasted_iota(jnp.uint32, (n,), 0)
    h = (i + jnp.uint32(seed)) * jnp.uint32(2654435761)
    h = h ^ (h >> 15)
    h = h * jnp.uint32(2246822519)
    return ((h >> 8) & jnp.uint32(0xFF)).astype(jnp.uint8).reshape(shape)

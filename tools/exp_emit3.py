"""Correctness check of the fused Pallas suppressor vs the XLA fixpoint on
the SAME device, over adversarial workloads (heavy overlaps -> long
suppression chains, plus class offsets and gated-out rows).

    python tools/exp_emit3.py [B] [rounds]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from edgeml_tpu.ops.nms import MAX_WH, greedy_keep_mask
from edgeml_tpu.ops.nms_fused import greedy_keep_mask_fused
from edgeml_tpu.utils.synth import hash_uniform

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 6
K, IOU = 1024, 0.6


def make(seed, spread, ncls):
    u = hash_uniform(seed, (B, K, 6))
    xy = u[..., :2] * spread + 20.0
    wh = u[..., 2:4] * 120.0 + 30.0
    scores = jnp.sort(u[..., 4], axis=-1, descending=True)
    scores = jnp.where(scores > 0.05, scores, 0.0)  # gated-out tail
    cls_idx = jnp.floor(u[..., 5] * ncls)
    boxes = jnp.concatenate([xy - wh / 2, xy + wh / 2], axis=-1)
    return boxes + cls_idx[..., None] * MAX_WH, scores


@jax.jit
def both(seed, spread, ncls):
    off, scores = make(seed, spread, ncls)
    ref = jax.vmap(lambda b, s: greedy_keep_mask(b, s, IOU))(off, scores)
    got = greedy_keep_mask_fused(off, scores, IOU)
    return jnp.sum(ref != got), jnp.sum(ref), jnp.sum(got)


bad = 0
for r in range(ROUNDS):
    for spread, ncls in ((80.0, 1), (300.0, 4), (2000.0, 80)):
        d, nr, ng = both(jnp.asarray(100 + r, jnp.int32),
                         jnp.asarray(spread), jnp.asarray(ncls))
        d = int(d)
        bad += d
        print(f"round {r} spread={spread:6.0f} ncls={ncls:3d}: "
              f"mismatches={d}  kept ref/fused = {int(nr)}/{int(ng)}",
              flush=True)
print("TOTAL mismatches:", bad)

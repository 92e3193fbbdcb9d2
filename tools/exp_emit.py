"""Single-launch ablation of the NMS emit stage (_emit) at the production
shape (B=128 images x K=1024 candidates). Cumulative variants in ONE jit
each, chained through a scalar accumulator (CLAUDE.md measurement rules).

Stages: 0 inputs only | 1 +IoU matrix + sup build | 2 +fixpoint loop |
        3 +compaction scatter  == full _emit

    python tools/exp_emit.py [B] [iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from edgeml_tpu.ops.nms import MAX_WH, greedy_keep_mask
from edgeml_tpu.utils.synth import hash_uniform

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 8
K, MAXD, IOU = 1024, 300, 0.6


def make_inputs(seed):
    u = hash_uniform(seed, (B, K, 7))
    xy = u[..., :2] * 600.0 + 20.0
    wh = u[..., 2:4] * 80.0 + 4.0
    scores = jnp.sort(u[..., 4], axis=-1, descending=True)
    cls_idx = jnp.floor(u[..., 5] * 80.0)
    boxes = jnp.concatenate([xy - wh / 2, xy + wh / 2], axis=-1)
    return boxes + cls_idx[..., None] * MAX_WH, scores, cls_idx


def stage_pipeline(upto):
    def fn(acc, seed):
        off, scores, cls_idx = make_inputs(seed)
        if upto == 0:
            return acc + off.sum() * 1e-12 + scores.sum() * 1e-9

        def one(boxes, sc, ci, upto=upto):
            k = sc.shape[0]
            lo = jnp.maximum(boxes[:, None, :2], boxes[None, :, :2])
            hi = jnp.minimum(boxes[:, None, 2:4], boxes[None, :, 2:4])
            inter = jnp.prod(jnp.maximum(hi - lo, 0.0), axis=-1)
            area = jnp.prod(
                jnp.maximum(boxes[:, 2:4] - boxes[:, :2], 0.0), axis=-1
            )
            iou = inter / jnp.maximum(
                area[:, None] + area[None, :] - inter, 1e-12
            )
            row = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
            sup = ((iou > IOU) & (col < row)).astype(jnp.bfloat16)
            valid = sc > 0.0
            if upto == 1:
                return sup.astype(jnp.float32).sum() * 1e-9

            def cond(c):
                return c[1]

            def body(c):
                kept, _ = c
                hit = sup @ kept.astype(jnp.bfloat16)
                new = valid & (hit < 0.5)
                return new, jnp.any(new != kept)

            kept, _ = jax.lax.while_loop(
                cond, body, (valid, jnp.asarray(True))
            )
            if upto == 2:
                return kept.astype(jnp.float32).sum() * 1e-9
            rank = jnp.cumsum(kept) - 1
            take = kept & (rank < MAXD)
            slot = jnp.where(take, rank, MAXD)
            rows = jnp.concatenate(
                [boxes, sc[:, None], ci[:, None]], axis=1
            )
            out = jnp.zeros((MAXD + 1, 6), rows.dtype).at[slot].set(
                rows
            )[:MAXD]
            return out.sum() * 1e-12

        return acc + jnp.sum(jax.vmap(one)(off, scores, cls_idx))

    return fn


prev = 0.0
for st in range(4):
    step = jax.jit(stage_pipeline(st))
    t0 = time.perf_counter()
    # float() fetch, NOT block_until_ready (a no-op on axon — CLAUDE.md)
    float(step(jnp.zeros(()), 0))
    print(f"stage {st}: warmup {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    acc = jnp.zeros(())
    for i in range(ITERS):
        acc = step(acc, 1 + i)
    float(acc)
    ms = (time.perf_counter() - t0) / ITERS * 1e3
    print(
        f"stage {st}: {ms:8.2f} ms/batch  (+{ms - prev:7.2f})",
        flush=True,
    )
    prev = ms

"""Head-to-head A/B of NMS emit-stage variants at the production shape
(B x K=1024 candidates), each variant a full chained-accumulator pipeline in
ONE jit (CLAUDE.md measurement rules).

Variants:
  cur   : production _emit (split IoU, f32 divide, int8 sup, while fixpoint)
  nodiv : division-free threshold (inter > t * union) in the sup build
  fix8  : nodiv + fixed-8 fori fixpoint (no convergence matvec/test)
  half  : nodiv + two-block lower-triangular sup (A 512x512 fixpoint, rect
          hit matvec, C 512x512 fixpoint) -- ~halves IoU elements built

    python tools/exp_emit2.py [B] [iters] [variants...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from edgeml_tpu.ops.nms import MAX_WH, _emit
from edgeml_tpu.utils.synth import hash_uniform

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 12
K, MAXD, IOU = 1024, 300, 0.6


def make_inputs(seed):
    u = hash_uniform(seed, (B, K, 7))
    xy = u[..., :2] * 600.0 + 20.0
    wh = u[..., 2:4] * 80.0 + 4.0
    scores = jnp.sort(u[..., 4], axis=-1, descending=True)
    cls_idx = jnp.floor(u[..., 5] * 80.0)
    boxes = jnp.concatenate([xy - wh / 2, xy + wh / 2], axis=-1)
    return boxes, scores, cls_idx


def sup_matrix(off, divide):
    k = off.shape[0]
    x1, y1, x2, y2 = (off[:, i] for i in range(4))
    ix = jnp.minimum(x2[:, None], x2[None, :]) - jnp.maximum(
        x1[:, None], x1[None, :]
    )
    iy = jnp.minimum(y2[:, None], y2[None, :]) - jnp.maximum(
        y1[:, None], y1[None, :]
    )
    inter = jnp.maximum(ix, 0.0) * jnp.maximum(iy, 0.0)
    area = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)
    union = jnp.maximum(area[:, None] + area[None, :] - inter, 1e-12)
    if divide:
        hit = inter / union > IOU
    else:
        hit = inter > IOU * union
    row = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    return (hit & (col < row)).astype(jnp.int8)


def fixpoint_while(sup, valid):
    def cond(c):
        return c[1]

    def body(c):
        kept, _ = c
        hit = jnp.matmul(sup, kept.astype(jnp.int8),
                         preferred_element_type=jnp.int32)
        new = valid & (hit == 0)
        return new, jnp.any(new != kept)

    kept, _ = jax.lax.while_loop(cond, body, (valid, jnp.asarray(True)))
    return kept


def compact(boxes, scores, cls_idx, kept):
    k = scores.shape[0]
    keep_rank = jnp.where(kept, k - jax.lax.iota(jnp.int32, k), 0)
    rank_val, sel = jax.lax.top_k(keep_rank, MAXD)
    rows = jnp.concatenate(
        [boxes, scores[:, None], cls_idx[:, None]], axis=1
    )
    out = rows[sel] * (rank_val[:, None] > 0)
    return out.sum() * 1e-9


def emit_cur(boxes, scores, cls_idx):
    dets, valid = _emit(boxes, scores, cls_idx, IOU, MAXD)
    return dets.sum() * 1e-9 + valid.sum() * 1e-9


def emit_nodiv(boxes, scores, cls_idx):
    off = boxes + cls_idx[:, None] * MAX_WH
    sup = sup_matrix(off, divide=False)
    kept = fixpoint_while(sup, scores > 0.0)
    return compact(boxes, scores, cls_idx, kept)


def emit_fix8(boxes, scores, cls_idx):
    off = boxes + cls_idx[:, None] * MAX_WH
    sup = sup_matrix(off, divide=False)
    valid = scores > 0.0

    def body(_, kept):
        hit = jnp.matmul(sup, kept.astype(jnp.int8),
                         preferred_element_type=jnp.int32)
        return valid & (hit == 0)

    kept = jax.lax.fori_loop(0, 8, body, valid)
    return compact(boxes, scores, cls_idx, kept)


def emit_half(boxes, scores, cls_idx):
    off = boxes + cls_idx[:, None] * MAX_WH
    h = K // 2
    sup_a = sup_matrix(off[:h], divide=False)          # (h, h) lower
    sup_c = sup_matrix(off[h:], divide=False)          # (h, h) lower
    # rect block: rows h.., cols 0..h (j < i always true here)
    xa1, ya1, xa2, ya2 = (off[:h, i] for i in range(4))
    xb1, yb1, xb2, yb2 = (off[h:, i] for i in range(4))
    ix = jnp.minimum(xb2[:, None], xa2[None, :]) - jnp.maximum(
        xb1[:, None], xa1[None, :]
    )
    iy = jnp.minimum(yb2[:, None], ya2[None, :]) - jnp.maximum(
        yb1[:, None], ya1[None, :]
    )
    inter = jnp.maximum(ix, 0.0) * jnp.maximum(iy, 0.0)
    area_a = jnp.maximum(xa2 - xa1, 0.0) * jnp.maximum(ya2 - ya1, 0.0)
    area_b = jnp.maximum(xb2 - xb1, 0.0) * jnp.maximum(yb2 - yb1, 0.0)
    union = jnp.maximum(area_b[:, None] + area_a[None, :] - inter, 1e-12)
    sup_r = (inter > IOU * union).astype(jnp.int8)     # (h, h)
    valid = scores > 0.0
    kept_a = fixpoint_while(sup_a, valid[:h])
    hit_r = jnp.matmul(sup_r, kept_a.astype(jnp.int8),
                       preferred_element_type=jnp.int32)
    valid_c = valid[h:] & (hit_r == 0)

    def cond(c):
        return c[1]

    def body(c):
        kept, _ = c
        hit = jnp.matmul(sup_c, kept.astype(jnp.int8),
                         preferred_element_type=jnp.int32)
        new = valid_c & (hit == 0)
        return new, jnp.any(new != kept)

    kept_c, _ = jax.lax.while_loop(cond, body, (valid_c, jnp.asarray(True)))
    kept = jnp.concatenate([kept_a, kept_c])
    return compact(boxes, scores, cls_idx, kept)


VARIANTS = {
    "cur": emit_cur, "nodiv": emit_nodiv, "fix8": emit_fix8, "half": emit_half,
}

names = sys.argv[3:] or list(VARIANTS)

base_ms = None
for name in names:
    one = VARIANTS[name]

    def pipe(acc, seed, one=one):
        boxes, scores, cls_idx = make_inputs(seed)
        return acc + jnp.sum(jax.vmap(one)(boxes, scores, cls_idx))

    step = jax.jit(pipe)
    t0 = time.perf_counter()
    # float() fetch, NOT block_until_ready (a no-op on axon — CLAUDE.md)
    float(step(jnp.zeros(()), 0))
    print(f"{name}: warmup {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    acc = jnp.zeros(())
    for i in range(ITERS):
        acc = step(acc, 1 + i)
    float(acc)
    ms = (time.perf_counter() - t0) / ITERS * 1e3
    if base_ms is None:
        base_ms = ms
    print(f"{name}: {ms:8.2f} ms/batch  ({ms - base_ms:+6.2f} vs {names[0]})",
          flush=True)

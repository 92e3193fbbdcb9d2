"""TPU experiment: exact top-k via bit-level binary search vs chunked top_k.

Also measures: sorted- vs unsorted-index row gathers, bf16 suppression matvec.
Chained launches per the measurement rules.
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from edgeml_tpu.ops import nms as nms_mod

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
ITERS = 8
K = 1024


def timed(name, fn, *args):
    acc = jnp.zeros(())
    acc = fn(acc, jnp.float32(0.0), *args)
    float(acc)  # value fetch; block_until_ready is a no-op on axon
    t0 = time.perf_counter()
    for i in range(ITERS):
        acc = fn(acc, jnp.float32(i), *args)
    float(acc)  # value fetch; block_until_ready is a no-op on axon
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:24s} {dt * 1e3:8.2f} ms/iter")
    return dt


def topk_bits(x, k):
    """Exact top-k of a 1-D nonneg-or-sentinel array via 31-step binary search
    on the f32 bit pattern (positive floats compare like their int bits),
    then cumsum compaction + small stable sort. Ties resolve to the lowest
    index, like lax.top_k. Entries <= 0 never outrank positives."""
    n = x.shape[0]
    xb = jax.lax.bitcast_convert_type(jnp.maximum(x, 0.0), jnp.int32)

    def body(b, t):
        cand = t | (1 << b)
        cnt = jnp.sum(xb >= cand)
        return jnp.where(cnt >= k, cand, t)

    t = jax.lax.fori_loop(30, -1, lambda i, t: body(i, t), 0, unroll=4)
    # t = bits of the kth-largest positive value (0 if fewer than k positives)
    vk = jax.lax.bitcast_convert_type(t, jnp.float32)
    gt = xb > t
    eq = xb == t
    need = k - jnp.sum(gt)
    take_eq = eq & (jnp.cumsum(eq) <= need)
    take = gt | take_eq
    slot = jnp.where(take, jnp.cumsum(take) - 1, k)
    idx = jnp.arange(n, dtype=jnp.int32)
    vals = jnp.full((k + 1,), -1.0, x.dtype).at[slot].set(x)[:k]
    inds = jnp.zeros((k + 1,), jnp.int32).at[slot].set(idx)[:k]
    # order by value desc, stable -> ties keep ascending index
    order = jnp.argsort(-vals, stable=True)
    return vals[order], inds[order]


def main():
    rng = np.random.default_rng(0)
    for n in (25200, 81920):
        x_h = (rng.random((B, n)) * 0.002).astype(np.float32)
        hot = rng.integers(0, n, size=(B, 500))
        for b in range(B):
            x_h[b, hot[b]] = rng.random(500) * 0.9 + 0.05
        x_h[x_h < 0.001] = -1.0
        x = jnp.asarray(x_h)

        @jax.jit
        def run_old(acc, salt, x):
            v, i = jax.vmap(lambda r: nms_mod.topk1d(r + salt * 1e-12, K))(x)
            return acc + v.sum() * 1e-9 + i.sum() * 1e-12

        @jax.jit
        def run_bits(acc, salt, x):
            v, i = jax.vmap(lambda r: topk_bits(r + salt * 1e-12, K))(x)
            return acc + v.sum() * 1e-9 + i.sum() * 1e-12

        # correctness first
        vo, io = jax.vmap(lambda r: jax.lax.top_k(r, K))(x)
        vb, ib = jax.vmap(lambda r: topk_bits(r, K))(x)
        nv = int(jnp.sum(vo > 0))
        ok_v = bool(jnp.array_equal(jnp.where(vo > 0, vo, 0), jnp.where(vb > 0, vb, 0)))
        ok_i = bool(jnp.array_equal(jnp.where(vo > 0, io, 0), jnp.where(vb > 0, ib, 0)))
        print(f"n={n}: positives/img~{nv // B}, values exact: {ok_v}, indices exact: {ok_i}")
        timed(f"topk1d n={n}", run_old, x)
        timed(f"topk_bits n={n}", run_bits, x)

    # ---- gathers: sorted vs unsorted indices --------------------------------
    cls = jnp.asarray(rng.random((B, 25200, 80), np.float32))
    idx_u = jnp.asarray(rng.integers(0, 25200, size=(B, K)).astype(np.int32))
    idx_s = jnp.sort(idx_u, axis=1)

    @jax.jit
    def gat(acc, salt, cls, idx):
        g = jax.vmap(lambda c, i: c[i])(cls, idx)
        return acc + g.sum() * 1e-9 + salt * 0

    @jax.jit
    def gat_sorted_hint(acc, salt, cls, idx):
        g = jax.vmap(lambda c, i: jnp.take(c, i, axis=0, indices_are_sorted=True))(cls, idx)
        return acc + g.sum() * 1e-9 + salt * 0

    timed("gather unsorted", gat, cls, idx_u)
    timed("gather sorted", gat, cls, idx_s)
    timed("gather sorted+hint", gat_sorted_hint, cls, idx_s)

    cls16 = cls.astype(jnp.bfloat16)
    timed("gather bf16 unsorted", gat, cls16, idx_u)

    # ---- suppression matvec: f32 vs bf16 sup matrix --------------------------
    boxes = jnp.asarray(
        np.concatenate(
            [rng.uniform(0, 600, (B, K, 2)), rng.uniform(4, 100, (B, K, 2))], -1
        ).astype(np.float32)
    )
    scores = jnp.asarray((rng.random((B, K)) * 0.9 + 0.01).astype(np.float32))

    def keep_mask(b, s, sup_dtype):
        lo = jnp.maximum(b[:, None, :2], b[None, :, :2])
        hi = jnp.minimum(b[:, None, 2:4], b[None, :, 2:4])
        inter = jnp.prod(jnp.maximum(hi - lo, 0.0), axis=-1)
        area = jnp.prod(jnp.maximum(b[:, 2:4] - b[:, :2], 0.0), axis=-1)
        iou = inter / jnp.maximum(area[:, None] + area[None, :] - inter, 1e-12)
        row = jax.lax.broadcasted_iota(jnp.int32, (K, K), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (K, K), 1)
        sup = ((iou > 0.6) & (col < row)).astype(sup_dtype)
        valid = s > 0.0

        def cond(c):
            return c[1]

        def body(c):
            kept, _ = c
            hit = jnp.dot(sup, kept.astype(sup_dtype),
                          preferred_element_type=jnp.float32)
            new = valid & (hit < 0.5)
            return new, jnp.any(new != kept)

        kept, _ = jax.lax.while_loop(cond, body, (valid, jnp.asarray(True)))
        return kept

    @partial(jax.jit, static_argnames=("dt",))
    def sup_run(acc, salt, boxes, scores, dt):
        k = jax.vmap(lambda b, s: keep_mask(b, s + salt * 1e-12, dt))(boxes, scores)
        return acc + k.sum() * 1e-9

    kf = jax.vmap(lambda b, s: keep_mask(b, s, jnp.float32))(boxes, scores)
    kb = jax.vmap(lambda b, s: keep_mask(b, s, jnp.bfloat16))(boxes, scores)
    print("sup bf16 == f32:", bool(jnp.array_equal(kf, kb)),
          " kept/img ~", int(kf.sum()) // B)
    timed("fixpoint f32", sup_run, boxes, scores, jnp.float32)
    timed("fixpoint bf16", sup_run, boxes, scores, jnp.bfloat16)


if __name__ == "__main__":
    main()

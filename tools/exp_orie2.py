"""ORIE pair-eval ablation: is the per-draw (C, K) mask gather the bound,
and does a one-hot MXU matmul beat it?

orie_map_pair's single gather is lm_rows = lmask[pool.img] — a (N,) operand
indexed by the CONSTANT (C, K) img table, vmapped over B draws. The matmul
alternative computes all draws at once as (B, N) @ (N, C*K) against the 0/1
image-membership matrix M[n, (c,k)] = (pool.img[c,k] == n): every output is
exactly 0/1 (one 1 per column), so bf16 DEFAULT-precision accumulation is
exact. M streams at HBM/MXU rate instead of the gather's per-element rate.

Stages (cumulative, one jit each, chained acc, final float() fetch):
  0  ensemble sampling only (uniforms + e-th-smallest top_k)
  1  + lmask + label-histogram matmul (nt)
  2  + lm_rows gather (production)
  2m + lm_rows via the one-hot matmul instead
  3  full production _orie_batch
  3m full pair eval with the matmul lm_rows patched in

    python tools/exp_orie2.py [batch] [iters] [stages: 0 1 2 2m 3 3m]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from edgeml_tpu.ops import map_kernel as mk
from edgeml_tpu.reward.orie import _orie_batch

# bench.py's synthetic workload shape
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("BENCH_SKIP_YOLO", "1")
import bench  # noqa: E402  (module-level constants only)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 4
E = bench.NUM_ENSEMBLE

rng = np.random.default_rng(7)
weak, strong, labels = bench.make_workload(rng)
pool = mk.build_pool(weak, strong, labels)
N = pool.num_images
C, K, T = pool.tp.shape
print(f"pool: C={C} K={K} T={T} N={N}, B={B} E={E}", flush=True)


def lm_rows_matmul(lmask_f, pool):
    """(N,) 0/1 f32 -> (C, K) bool via the one-hot dot (vmap collapses the
    draw axis into one (B, N) @ (N, C*K) matmul)."""
    img_flat = pool.img.reshape(-1)  # (C*K,) constant
    m = (img_flat[None, :] == jax.lax.iota(jnp.int32, N)[:, None]).astype(
        jnp.bfloat16
    )
    v = jax.lax.dot_general(
        lmask_f.astype(jnp.bfloat16)[None, :], m, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )[0]
    return (v > 0.5).reshape(pool.img.shape)


def orie_pair_patched(pool, in_ens, target):
    """orie_map_pair with the gather swapped for the matmul (same math)."""
    dtype = jnp.float32
    lmask = in_ens | (jnp.arange(pool.num_images) == target)
    nt = jnp.matmul(lmask.astype(dtype), pool.hist,
                    preferred_element_type=dtype)
    lm_rows = lm_rows_matmul(lmask.astype(dtype), pool)
    is_t = pool.img == target
    sel_weak = lm_rows & ~pool.strong
    sel_strong = jnp.where(pool.strong, is_t, lm_rows & ~is_t)
    has = (nt > 0).astype(dtype)
    denom = jnp.sum(has) * pool.tp.shape[2]

    def mean_ap(sel):
        ap = mk._ap_from_sel(pool, sel, nt)
        return jnp.sum(ap * has[:, None]) / denom

    return mean_ap(sel_weak), mean_ap(sel_strong)


def stage(which):
    img_range = jnp.arange(N)

    def fn(acc, seed):
        key = jax.random.PRNGKey(seed)
        idx = (jax.lax.iota(jnp.int32, B) + seed * 131) % N

        def one(i, k):
            is_target = img_range == i
            u = jax.random.uniform(k, (N,))
            u = jnp.where(is_target, 2.0, u)
            kth = -jax.lax.top_k(-u, E)[0][E - 1]
            in_ens = u <= kth
            if which == "0":
                return in_ens.sum() * 1e-9
            lmask = in_ens | is_target
            nt = jnp.matmul(lmask.astype(jnp.float32), pool.hist,
                            preferred_element_type=jnp.float32)
            if which == "1":
                return nt.sum() * 1e-9
            if which == "2":
                lm_rows = lmask[pool.img]
                return lm_rows.sum() * 1e-9 + nt.sum() * 1e-9
            if which == "2m":
                lm_rows = lm_rows_matmul(lmask.astype(jnp.float32), pool)
                return lm_rows.sum() * 1e-9 + nt.sum() * 1e-9
            if which == "3m":
                w, s = orie_pair_patched(pool, in_ens, i)
                r = (s - w) * (E + 1)
                return jnp.where(jnp.isnan(r), 0.0, r) * 1e-3
            w, s = mk.orie_map_pair(pool, in_ens, i)
            r = (s - w) * (E + 1)
            return jnp.where(jnp.isnan(r), 0.0, r) * 1e-3

        keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(idx)
        return acc + jnp.sum(jax.vmap(one)(idx, keys))

    return fn


for which in (sys.argv[3:] or ["0", "1", "2", "2m", "3", "3m"]):
    if which == "3":
        # the production kernel itself (includes NaN->0 + reward scale)
        def fn(acc, seed, _w=which):
            idx = ((jax.lax.iota(jnp.int32, B) + seed * 131) % N)
            r = _orie_batch(pool, idx, jax.random.PRNGKey(seed), E)
            return acc + r.sum() * 1e-3
        step = jax.jit(fn)
    else:
        step = jax.jit(stage(which))
    t0 = time.perf_counter()
    float(step(jnp.zeros(()), 0))
    warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    acc = jnp.zeros(())
    for i in range(ITERS):
        acc = step(acc, 1 + i)
    float(acc)
    dt = (time.perf_counter() - t0) / ITERS
    print(
        f"stage {which:>2}: warmup {warm:5.1f}s  {dt * 1e3:8.2f} ms/batch  "
        f"{B / dt:9.1f} img/s",
        flush=True,
    )

# exactness spot check: matmul lm_rows == gather lm_rows on one batch
key = jax.random.PRNGKey(123)
u = jax.random.uniform(key, (N,))
kth = -jax.lax.top_k(-u, E)[0][E - 1]
lmask = (u <= kth) | (jnp.arange(N) == 17)
a = lmask[pool.img]
b = lm_rows_matmul(lmask.astype(jnp.float32), pool)
print("lm_rows matmul exact:", bool(jnp.all(a == b)), flush=True)

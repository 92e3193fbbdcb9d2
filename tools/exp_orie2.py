"""ORIE pair-eval ablation: is the per-draw (C, K) mask gather the bound,
and does a one-hot MXU matmul beat it?

orie_map_pair's single gather is lm_rows = lmask[pool.img] — a (N,) operand
indexed by the CONSTANT (C, K) img table, vmapped over B draws. The matmul
alternative computes all draws at once as (B, N) @ (N, C*K) against the 0/1
image-membership matrix M[n, (c,k)] = (pool.img[c,k] == n): every output is
exactly 0/1 (one 1 per column), so bf16 DEFAULT-precision accumulation is
exact. M streams at HBM/MXU rate instead of the gather's per-element rate.

A second candidate bound is the pair of per-draw cumsums in _ap_from_sel
(tpc over (C, T, K), npred over (C, K)): XLA lowers lane-axis cumsum as a
log2(K)-pass shifted-add scan on the VPU. The matmul form computes both as
(rows, K) @ U against the constant 0/1 upper-triangular (K, K): operands are
0/1 (bf16-exact), partial sums are integers < 2^24 accumulated in f32, so ANY
summation order gives the identical integer — bit-exact vs cumsum, but on
the MXU.

Stages (cumulative, one jit each, chained acc, final float() fetch):
  0  ensemble sampling only (uniforms + e-th-smallest top_k)
  1  + lmask + label-histogram matmul (nt)
  2  + lm_rows gather (production)
  2m + lm_rows via the one-hot matmul instead
  3  full production _orie_batch
  3m full pair eval with the matmul lm_rows patched in
  3c full pair eval, gather lm_rows + MATMUL cumsums
  3x full pair eval, matmul lm_rows + matmul cumsums

    python tools/exp_orie2.py [batch] [iters] [stages: 0 1 2 2m 3 3m 3c 3x]
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


def _ap_from_sel_mm(pool, sel, nt):
    """mk._ap_from_sel with both cumsums as triangular MXU matmuls.

    tpc[c,t,k] = sum_{k'<=k} inc[c,t,k'] == (inc @ U)[c,t,k] with
    U[k',k] = [k' <= k]; operands 0/1 in bf16 (exact), f32 accumulation,
    integer partial sums — bit-identical to jnp.cumsum."""
    dtype = jnp.float32
    m = (sel & pool.valid).astype(jnp.bfloat16)  # (C, K)
    tp_t = jnp.moveaxis(pool.tp, 2, 1)  # (C, T, K)
    c, t, k = tp_t.shape
    tri = (
        jax.lax.iota(jnp.int32, k)[:, None] <= jax.lax.iota(jnp.int32, k)[None, :]
    ).astype(jnp.bfloat16)
    inc = tp_t.astype(jnp.bfloat16) * m[:, None, :]  # (C, T, K) 0/1
    tpc = jax.lax.dot_general(
        inc.reshape(c * t, k), tri, (((1,), (0,)), ((), ())),
        preferred_element_type=dtype,
    ).reshape(c, t, k)
    npred = jax.lax.dot_general(
        m, tri, (((1,), (0,)), ((), ())), preferred_element_type=dtype
    )  # (C, K)
    fpc = npred[:, None, :] - tpc
    per_t = jax.vmap(mk.ap_interp101, in_axes=(0, 0, None))
    return jax.vmap(per_t)(tpc, fpc, nt)  # (C, T)


def orie_pair_patched(pool, in_ens, target, mm_rows=True, mm_cumsum=False):
    """orie_map_pair with the gather and/or cumsums swapped for matmuls
    (same math)."""
    dtype = jnp.float32
    lmask = in_ens | (jnp.arange(pool.num_images) == target)
    nt = jnp.matmul(lmask.astype(dtype), pool.hist,
                    preferred_element_type=dtype)
    if mm_rows:
        lm_rows = lm_rows_matmul(lmask.astype(dtype), pool)
    else:
        lm_rows = lmask[pool.img]
    is_t = pool.img == target
    sel_weak = lm_rows & ~pool.strong
    sel_strong = jnp.where(pool.strong, is_t, lm_rows & ~is_t)
    has = (nt > 0).astype(dtype)
    denom = jnp.sum(has) * pool.tp.shape[2]
    ap_fn = _ap_from_sel_mm if mm_cumsum else mk._ap_from_sel

    def mean_ap(sel):
        ap = ap_fn(pool, sel, nt)
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
            if which in ("3m", "3c", "3x"):
                w, s = orie_pair_patched(
                    pool, in_ens, i,
                    mm_rows=which in ("3m", "3x"),
                    mm_cumsum=which in ("3c", "3x"),
                )
                r = (s - w) * (E + 1)
                return jnp.where(jnp.isnan(r), 0.0, r) * 1e-3
            w, s = mk.orie_map_pair(pool, in_ens, i)
            r = (s - w) * (E + 1)
            return jnp.where(jnp.isnan(r), 0.0, r) * 1e-3

        keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(idx)
        return acc + jnp.sum(jax.vmap(one)(idx, keys))

    return fn


for which in (sys.argv[3:] or ["0", "1", "2", "2m", "3", "3m", "3c", "3x"]):
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
in_ens = (u <= kth) & (jnp.arange(N) != 17)
a = lmask[pool.img]
b = lm_rows_matmul(lmask.astype(jnp.float32), pool)
print("lm_rows matmul exact:", bool(jnp.all(a == b)), flush=True)

# exactness spot check: matmul-cumsum pair eval == production pair eval
ref = mk.orie_map_pair(pool, in_ens, jnp.asarray(17))
for name, kw in (
    ("3c", dict(mm_rows=False, mm_cumsum=True)),
    ("3x", dict(mm_rows=True, mm_cumsum=True)),
):
    got = orie_pair_patched(pool, in_ens, jnp.asarray(17), **kw)
    same = bool(
        jnp.all(jnp.asarray(got) == jnp.asarray(ref))
    )
    print(f"pair eval {name} bit-exact vs production:", same, flush=True)

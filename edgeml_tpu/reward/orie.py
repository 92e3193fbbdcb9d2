"""Offloading-reward kernels: ORIE / ORI (Monte-Carlo ensemble mAP) and DCSB.

TPU-first rebuild of /root/reference/reward.py:16-69. The reference fans the
per-image reward out over a ThreadPoolExecutor and, per image, concatenates
ensemble detections and runs two full `ap_per_class` evaluations (reward.py:40-50)
— O(num_img) NumPy mAP evaluations over ~(E+1)-image arrays.

Here the whole Monte-Carlo grid is one batched device computation:
  * detections are preprocessed once into a per-class sorted DetectionPool;
  * each (image, ensemble draw) is just a pair of per-image inclusion masks;
  * `map_from_masks` vmaps over images, sharded across chips on the image axis
    (see edgeml_tpu.parallel) — no re-concatenation, no re-sorting, ever.

RNG: the reference samples ensembles with the *unseeded* global NumPy RNG
(reward.py:38), so its rewards are nondeterministic run-to-run. We use
counter-based `jax.random` keys folded per image: deterministic given --seed,
statistically equivalent (documented divergence, SURVEY.md section 5.2).
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.map_kernel import DetectionPool, build_pool, orie_map_pair


@partial(jax.jit, static_argnames=("num_ensemble",))
def _orie_batch(
    pool: DetectionPool,
    img_idx: jax.Array,  # (B,) int32
    key: jax.Array,
    num_ensemble: int,
) -> jax.Array:
    """ORIE for a batch of images. Returns (B,) rewards (NaN -> 0 applied)."""
    n = pool.num_images
    e = max(num_ensemble, 0)
    img_range = jnp.arange(n)

    def one(i, k):
        # Sample `num_ensemble` distinct other images, uniformly without
        # replacement (statistically identical to the reference's
        # permutation-prefix draw, reward.py:35-38): draw one uniform per
        # image, exclude the target, keep the E smallest. No permutation,
        # no scatter — one top_k and a comparison (TPU-friendly).
        is_target = img_range == i
        u = jax.random.uniform(k, (n,))
        u = jnp.where(is_target, 2.0, u)
        if e > 0:
            # top_k, not jnp.sort: the full sort of (n,) measured ~7% slower
            # end-to-end on v5e (15.2k -> 14.2k img/s)
            kth = -jax.lax.top_k(-u, e)[0][e - 1]  # e-th smallest
            in_ens = u <= kth
        else:
            in_ens = jnp.zeros((n,), bool)
        # fused pair evaluation: one mask gather + one histogram matmul for
        # both the weak and the strong dataset mAP (ops/map_kernel.py)
        weak_map, strong_map = orie_map_pair(pool, in_ens, i)
        r = (strong_map - weak_map) * (e + 1)
        return jnp.where(jnp.isnan(r), 0.0, r)

    keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(img_idx)
    return jax.vmap(one)(img_idx, keys)


def orie_rewards(
    weak_data,
    strong_data,
    labels,
    num_ensemble: int = 1000,
    seed: int = 0,
    batch: int | None = None,
    pool: DetectionPool | None = None,
    verbose: bool = False,
    mesh=None,
) -> np.ndarray:
    """ORIE reward for every image (ORI when num_ensemble=0).

    Args mirror /root/reference/reward.py:16-52; inputs are the `set_data`
    triples. Edge-case handling matches the reference: num_ensemble is clamped
    to [0, num_img - 1] with a warning (reward.py:29-34), NaN rewards (no
    labelled image in the ensemble) become 0 (reward.py:86).

    :param mesh: optional jax.sharding.Mesh with a 'dp' axis. The image axis
        of each Monte-Carlo batch is sharded across it (pool replicated) —
        the multi-chip scaling axis of SURVEY.md section 5.7.
    """
    if pool is None:
        pool = build_pool(weak_data, strong_data, labels)
    n = pool.num_images
    if num_ensemble > n - 1:
        num_ensemble = n - 1
        print("Ensemble size is too large. Set to the dataset size.")
    if num_ensemble < 0:
        num_ensemble = 0
        print("Ensemble size is negative. Set to 0.")

    if batch is not None and batch < 1:
        raise ValueError(f"batch must be >= 1, got {batch}")
    if batch is None:
        # Size batches so per-batch live intermediates fit HBM comfortably:
        # the per-class AP pass materializes ~8 (C, K, T) f32 arrays per image
        # (cumsums, precision, envelope, interp operands) x2 (weak+strong).
        # Cap at 512: device time per launch is tiny (the tunnel dispatch
        # dominates), but XLA compile time grows with the vmap width.
        subpools = pool.pools if hasattr(pool, "pools") else (pool,)
        ckt = sum(int(np.prod(p.tp.shape)) for p in subpools)
        per_img = max(16 * ckt * 4, 1)
        batch = int(min(max(4 * 2**30 // per_img, 1), 512))

    if mesh is not None:
        from ..parallel.mesh import replicate, shard_along

        n_shards = int(np.prod(mesh.devices.shape))
        batch = -(-batch // n_shards) * n_shards
        pool = replicate(pool, mesh)

    key = jax.random.PRNGKey(seed)
    out = np.zeros((n,), np.float32)
    # Dispatch every batch before syncing any: per-launch dispatch latency
    # (tens of ms through the remote runtime) overlaps with device compute
    # instead of serializing on a host round trip per batch.
    pending = []
    for s in range(0, n, batch):
        e = min(s + batch, n)
        # Pad the tail batch so shapes (and shard counts) stay static; padded
        # indices recompute image (e-1)'s reward and are discarded.
        idx = np.minimum(np.arange(s, s + batch, dtype=np.int32), n - 1)
        if mesh is not None:
            idx = shard_along(jnp.asarray(idx), mesh, mesh.axis_names[0])
        else:
            idx = jnp.asarray(idx)
        pending.append((s, e, _orie_batch(pool, idx, key, num_ensemble)))
    for s, e, dev in pending:
        out[s:e] = np.asarray(dev)[: e - s]
        if verbose:
            for i in range(s, e):
                print(f"ORIE for image {i}: {out[i]:.2f}.")
    return out


def dcsb_rewards(weak_data, strong_data, conf_thresh: float = 0.5) -> np.ndarray:
    """DCSB reward: strong-count minus weak-count of confident detections.

    Parity with /root/reference/reward.py:55-69 (strict `conf > 0.5`).
    """
    out = np.zeros((len(weak_data),), np.int64)
    for i, (w, s) in enumerate(zip(weak_data, strong_data)):
        out[i] = int(np.sum(np.asarray(s[1]) > conf_thresh)) - int(
            np.sum(np.asarray(w[1]) > conf_thresh)
        )
    return out


def compute_rewards(
    weak_data,
    strong_data,
    labels,
    method: str = "orie",
    num_ensemble: int = 1000,
    seed: int = 0,
    verbose: bool = False,
    mesh="auto",
    batch: int | None = None,
):
    """Full reward computation with the wall-time measurement the reference
    persists in the output npz (reward.py:76-92). Returns (reward, seconds).

    mesh: "auto" shards the image axis over all visible devices when more
    than one is present (SURVEY.md section 5.7's scaling axis); None forces
    single-device; or pass an explicit jax.sharding.Mesh.
    batch: images per kernel launch; None sizes it from HBM (cap 512). Use a
    smaller value (e.g. 256) when the one-time XLA compile must stay cheap.
    """
    start = time.perf_counter()
    if method == "orie":
        if mesh == "auto":
            import jax

            mesh = None
            if len(jax.devices()) > 1:
                from ..parallel.mesh import make_mesh

                mesh = make_mesh(("dp",))
        reward = orie_rewards(
            weak_data, strong_data, labels, num_ensemble, seed,
            verbose=verbose, mesh=mesh, batch=batch,
        )
    else:
        reward = dcsb_rewards(weak_data, strong_data).astype(int)
    reward = np.where(np.isnan(reward), 0, reward)
    return reward, time.perf_counter() - start

"""Offloading-policy evaluation: realized mAP vs offloading ratio.

TPU-first rebuild of /root/reference/test.py:11-43. The reference evaluates
11 offloading ratios by rebuilding a per-image detection list and running the
NumPy `ap_per_class` per ratio; here all ratio masks are evaluated by ONE
vmapped `dataset_map` call over the shared DetectionPool — the same kernel
that powers ORIE.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from .ops.map_kernel import DetectionPool, build_pool, dataset_map

# The offloading ratios to evaluate (test.py:11).
OFFLOADING_RATIOS = np.arange(0, 1.01, 0.1)


def offload_masks_for_estimates(
    estimate_path: str, dataset_split: np.ndarray, ratios=OFFLOADING_RATIOS
) -> np.ndarray:
    """Per-ratio offload masks from per-fold estimate{k}.npz files.

    Threshold rule parity with test.py:33-38: the threshold for ratio r is the
    train estimate at descending rank floor((n_train - 1) * r); a validation
    image offloads when its estimate is STRICTLY greater.
    """
    n_img = dataset_split.shape[1]
    masks = np.zeros((len(ratios), n_img), dtype=bool)
    for cv_idx, val_mask in enumerate(dataset_split):
        data = np.load(os.path.join(estimate_path, f"estimate{cv_idx + 1}.npz"))
        train_est, val_est = data["train_est"], data["val_est"]
        desc = np.sort(train_est)[::-1]
        for ri, ratio in enumerate(ratios):
            thresh = desc[int((len(train_est) - 1) * ratio)]
            masks[ri, val_mask] = val_est > thresh
    return masks


def test_map(
    weak_data,
    strong_data,
    labels,
    reward_estimates,
    dataset_split,
    pool: DetectionPool | None = None,
) -> np.ndarray:
    """Realized mAP per estimate directory per offloading ratio.

    Returns (n_estimates, 11), the content of test_map.npy (test.py:57-59).
    """
    if pool is None:
        pool = build_pool(weak_data, strong_data, labels)
    batched = jax.jit(jax.vmap(lambda m: dataset_map(pool, m)))
    results = []
    for estimate_path in reward_estimates:
        masks = offload_masks_for_estimates(estimate_path, dataset_split)
        results.append(np.asarray(batched(jnp.asarray(masks))))
    return np.array(results)

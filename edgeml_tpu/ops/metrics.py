"""Box geometry and detection-matching kernels (JAX, fixed shapes, vmappable).

TPU-first rebuild of the reference's pure-NumPy metrics core
(/root/reference/lib/metrics.py:6-86). Every function here works on padded,
fixed-shape arrays with explicit validity masks so it can be jit/vmap'ed — no
ragged lists, no data-dependent shapes.

The key departure from the reference: the reference's greedy IoU matching
(metrics.py:38-64) is a sequential sort + two `np.unique` passes. We prove the
same semantics reduce to a closed-form, O(m*n) fully-vectorized rule (see
`box_correct`), which vmaps over images for free.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_BIG = jnp.float32(3.4e38)


def xywh2xyxy(x: jax.Array) -> jax.Array:
    """(x_center, y_center, w, h) -> (x1, y1, x2, y2) for an (..., 4) array.

    Behavioral parity with /root/reference/lib/metrics.py:6-18.
    """
    xy, wh = x[..., :2], x[..., 2:4]
    half = wh * 0.5
    return jnp.concatenate([xy - half, xy + half], axis=-1)


def xyxy2xywh(x: jax.Array) -> jax.Array:
    """(x1, y1, x2, y2) -> (x_center, y_center, w, h) for an (..., 4) array."""
    lo, hi = x[..., :2], x[..., 2:4]
    return jnp.concatenate([(lo + hi) * 0.5, hi - lo], axis=-1)


def box_area(boxes: jax.Array) -> jax.Array:
    """Area of (..., 4) xyxy boxes."""
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def box_iou(a: jax.Array, b: jax.Array) -> jax.Array:
    """Pairwise IoU between (m, 4) and (n, 4) xyxy boxes -> (m, n).

    Behavioral parity with /root/reference/lib/metrics.py:67-86 (including its
    division-without-epsilon: IoU of two degenerate boxes is NaN there; callers
    that care use `box_iou_safe`).
    """
    lo = jnp.maximum(a[:, None, :2], b[None, :, :2])
    hi = jnp.minimum(a[:, None, 2:4], b[None, :, 2:4])
    inter = jnp.prod(jnp.maximum(hi - lo, 0.0), axis=-1)
    union = box_area(a)[:, None] + box_area(b)[None, :] - inter
    return inter / union


def box_iou_safe(a: jax.Array, b: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Pairwise IoU with an epsilon so degenerate (zero-area) pairs give 0."""
    lo = jnp.maximum(a[:, None, :2], b[None, :, :2])
    hi = jnp.minimum(a[:, None, 2:4], b[None, :, 2:4])
    inter = jnp.prod(jnp.maximum(hi - lo, 0.0), axis=-1)
    union = box_area(a)[:, None] + box_area(b)[None, :] - inter
    return inter / (union + eps)


def box_correct(
    det_boxes: jax.Array,
    det_cls: jax.Array,
    det_valid: jax.Array,
    lab_boxes: jax.Array,
    lab_cls: jax.Array,
    lab_valid: jax.Array,
    iouv: jax.Array,
) -> jax.Array:
    """True-positive matrix for padded detections against padded labels.

    Semantics mirror the reference's greedy matcher
    (/root/reference/lib/metrics.py:38-64), which does, per IoU threshold:
      1. candidate pairs = {(label i, det j) : iou >= thr and class match},
      2. sort pairs by IoU descending,
      3. keep, for each detection, its first pair in that order (= max IoU),
      4. re-order survivors by detection index ascending (np.unique sorts by
         value) and keep, for each label, its first pair in THAT order
         (= the surviving pair with the smallest detection index),
      5. detections in surviving pairs are correct.
    This is order-equivalent to the closed form implemented below:
      best(j)   = argmax_i iou_masked(i, j)            (per-detection champion)
      minj(i)   = min { j : best(j) = i, iou >= thr }  (per-label champion)
      tp(j, t)  = iou(best(j), j) >= iouv[t]  and  minj(best(j)) = j
    which needs no sort and no sequential loop — one (m, n) max/min sweep.

    Tie-breaking: the reference's `argsort` on IoU is an unstable quicksort, so
    exactly-equal IoUs are matched in unspecified order there. We fix the tie
    order deterministically (largest label index wins a detection, matching the
    most common NumPy ordering of `np.where` + reversed argsort); tests compare
    on distinct IoUs.

    :param det_boxes: (n, 4) xyxy detection boxes (padded).
    :param det_cls: (n,) detection classes.
    :param det_valid: (n,) bool validity mask for padded rows.
    :param lab_boxes: (m, 4) xyxy label boxes (padded).
    :param lab_cls: (m,) label classes.
    :param lab_valid: (m,) bool validity mask.
    :param iouv: (t,) ascending IoU thresholds.
    :return: (n, t) bool true-positive matrix.
    """
    iou = box_iou(lab_boxes, det_boxes)  # (m, n)
    ok = (
        (lab_cls[:, None] == det_cls[None, :])
        & lab_valid[:, None]
        & det_valid[None, :]
    )
    iou = jnp.where(ok, iou, -1.0)

    m = lab_boxes.shape[0]
    # Per-detection champion label: max IoU; ties go to the largest label index
    # (see docstring). Computed without argmax-ties ambiguity by scoring.
    best_iou = jnp.max(iou, axis=0)  # (n,)
    is_best = iou == best_iou[None, :]  # (m, n)
    lab_idx = jnp.arange(m)[:, None]
    best_lab = jnp.max(jnp.where(is_best, lab_idx, -1), axis=0)  # (n,)

    n = det_boxes.shape[0]
    det_idx = jnp.arange(n)

    def per_thresh(thr):
        cand = (best_iou >= thr) & (best_iou >= 0.0)  # (n,) detections with a pair
        # Per-label champion detection: smallest det index among candidates
        # whose champion is this label.
        j_or_big = jnp.where(cand, det_idx, n)  # (n,)
        minj = jnp.full((m,), n).at[best_lab].min(j_or_big, mode="drop")
        return cand & (minj[best_lab] == det_idx)

    return jax.vmap(per_thresh, out_axes=1)(iouv)


def pad_rows(arr, n_rows: int, fill=0.0):
    """Pad a NumPy/JAX (k, ...) array to (n_rows, ...) rows with `fill`.

    Host-side helper for turning ragged per-image data into fixed shapes.
    Returns (padded, valid_mask).
    """
    import numpy as np

    arr = np.asarray(arr)
    k = arr.shape[0]
    if k > n_rows:
        raise ValueError(f"cannot pad {k} rows into {n_rows}")
    pad_width = [(0, n_rows - k)] + [(0, 0)] * (arr.ndim - 1)
    padded = np.pad(arr, pad_width, constant_values=fill)
    valid = np.zeros((n_rows,), dtype=bool)
    valid[:k] = True
    return padded, valid

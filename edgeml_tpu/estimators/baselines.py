"""Baseline offloading predictors: Adaptive Feeding SVM and DCSB thresholds.

Behavioral counterparts of /root/reference/baseline.py:29-152:
  * fit_af — Adaptive Feeding (Zhou et al.): a linear SVM on the stage-24
    output features vs binarized reward, with a class weight on the positive
    class. The reference uses sklearn LinearSVC(dual=False) (squared-hinge,
    L2, C=1); here the same primal objective is minimized with full-batch
    Adam in JAX.
  * fit_dcsb — DCSB: calibrates a confidence threshold by binary search until
    the expected object count matches ground truth (tolerance 1e-4), then
    grid-searches an object-count threshold (1..10) and a minimum-area
    threshold (0.2..0.89 step 0.01). The per-image count/min-area reduction
    runs as one padded JAX kernel instead of a Python loop; the whole
    (num x area) accuracy grid is evaluated with a single vmapped pass.

Both return {train_est, val_est, train_time, val_time} and persist
wts{k}.pickle in the reference's formats (AF: classifier state; DCSB: the
3-scalar tuple).
"""

from __future__ import annotations

import os
import pickle
import time
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .common import SaveOpt

_f32 = jnp.float32


# ----------------------------------------------------------------------------
# Adaptive Feeding: weighted squared-hinge linear SVM
# ----------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("steps",))
def _svc_fit(x, t, cw, C, lr, steps):
    """min 0.5 |w|^2 + C * sum_i cw_i * max(0, 1 - t_i (x_i w + b))^2."""
    f = x.shape[1]

    def loss(p):
        w, b = p
        margin = jnp.maximum(0.0, 1.0 - t * (x @ w + b))
        return 0.5 * w @ w + C * jnp.sum(cw * margin**2)

    opt = optax.adam(lr)
    p = (jnp.zeros((f,), x.dtype), jnp.asarray(0.0, x.dtype))
    state = opt.init(p)

    def body(carry, _):
        p, state = carry
        g = jax.grad(loss)(p)
        updates, state = opt.update(g, state)
        return (optax.apply_updates(p, updates), state), None

    (p, _), _ = jax.lax.scan(body, (p, state), None, length=steps)
    return p


def fit_af(data, weight: float = 3.0, save_opts: SaveOpt | None = None):
    """Adaptive Feeding binary offloading classifier (baseline.py:29-64)."""
    save_opts = save_opts or SaveOpt()
    train_feature, val_feature, train_reward, val_reward = data
    x_train = np.stack([np.asarray(f, np.float64).reshape(-1) for f in train_feature])
    x_val = np.stack([np.asarray(f, np.float64).reshape(-1) for f in val_feature])
    y_train = np.asarray(train_reward).astype(int)

    wts_path = (
        os.path.join(save_opts.model_dir, f"wts{save_opts.model_idx}.pickle")
        if save_opts.model_dir
        else None
    )
    if save_opts.load and wts_path:
        with open(wts_path, "rb") as f:
            state = pickle.load(f)
    else:
        t = jnp.asarray(np.where(y_train > 0, 1.0, -1.0), _f32)
        cw = jnp.asarray(np.where(y_train > 0, weight, 1.0), _f32)
        w, b = _svc_fit(
            jnp.asarray(x_train, _f32), t, cw, 1.0, 0.05, 2000
        )
        state = {"w": np.asarray(w), "b": float(b)}

    @jax.jit
    def decide(x):
        return (x @ jnp.asarray(state["w"], _f32) + state["b"] > 0).astype(jnp.int32)

    t1 = time.perf_counter()
    train_est = np.asarray(decide(jnp.asarray(x_train, _f32)))
    t2 = time.perf_counter()
    val_est = np.asarray(decide(jnp.asarray(x_val, _f32)))
    t3 = time.perf_counter()

    train_acc = float(np.mean(train_est == y_train))
    val_acc = float(np.mean(val_est == np.asarray(val_reward).astype(int)))
    print(
        f"Trained Adaptive Feeding SVM with training accuracy: {train_acc:.3f}, "
        f"validation accuracy: {val_acc:.3f}"
    )
    if save_opts.save and wts_path:
        Path(save_opts.model_dir).mkdir(parents=True, exist_ok=True)
        with open(wts_path, "wb") as f:
            pickle.dump(state, f)
    return {
        "train_est": train_est,
        "val_est": val_est,
        "train_time": (t2 - t1) / max(len(train_est), 1),
        "val_time": (t3 - t2) / max(len(val_est), 1),
    }


# ----------------------------------------------------------------------------
# DCSB: confidence calibration + (count, area) threshold search
# ----------------------------------------------------------------------------


def _pad_boxes(feature):
    """Per-image (conf, area) pairs -> padded (N, D) arrays + validity."""
    n = len(feature)
    d = max([len(f[0]) for f in feature] + [1])
    conf = np.full((n, d), -np.inf, np.float32)
    area = np.zeros((n, d), np.float32)
    for i, (c, a) in enumerate(feature):
        k = len(c)
        if k:
            conf[i, :k] = c
            area[i, :k] = a
    return jnp.asarray(conf), jnp.asarray(area)


@jax.jit
def _filter_box(conf, area, thresh):
    """Counts and minimum retained-box area per image at a conf threshold.

    Parity with baseline.py:81-89 (strict >; empty selection -> area 0).
    """
    mask = conf > thresh
    num = jnp.sum(mask, axis=1)
    big = jnp.where(mask, area, jnp.inf)
    amin = jnp.min(big, axis=1)
    return num, jnp.where(num > 0, amin, 0.0)


def _dcsb_predict(conf, area, conf_thresh, num_thresh, area_thresh):
    est_num, est_area = _filter_box(conf, area, conf_thresh)
    det_num, _ = _filter_box(conf, area, 0.5)
    differs = est_num != det_num
    offload = differs & (
        (est_num > num_thresh) | (est_area < area_thresh)
    )
    return np.asarray(offload).astype(int)


def fit_dcsb(data, train_label, save_opts: SaveOpt | None = None):
    """DCSB threshold model (baseline.py:67-152)."""
    save_opts = save_opts or SaveOpt()
    train_feature, val_feature, train_reward, val_reward = data
    tr_conf, tr_area = _pad_boxes(train_feature)
    va_conf, va_area = _pad_boxes(val_feature)
    total_gt = float(np.sum(train_label))

    wts_path = (
        os.path.join(save_opts.model_dir, f"wts{save_opts.model_idx}.pickle")
        if save_opts.model_dir
        else None
    )
    if save_opts.load and wts_path:
        with open(wts_path, "rb") as f:
            conf_thresh, num_thresh, area_thresh = pickle.load(f)
    else:
        # Binary search the confidence threshold so the expected number of
        # objects matches the ground-truth count within 1e-4 relative.
        lo, hi = 0.0, 1.0
        conf_thresh = 0.5
        for _ in range(64):
            conf_thresh = (lo + hi) / 2
            num, _ = _filter_box(tr_conf, tr_area, conf_thresh)
            diff = float(jnp.sum(num)) - total_gt
            if abs(diff) / max(total_gt, 1e-12) < 1e-4:
                break
            if diff >= 0:
                lo = conf_thresh
            else:
                hi = conf_thresh

        est_num, est_area = _filter_box(tr_conf, tr_area, conf_thresh)
        det_num, _ = _filter_box(tr_conf, tr_area, 0.5)
        differs = est_num != det_num
        y = jnp.asarray(np.asarray(train_reward).astype(int))

        n_grid = jnp.arange(1, 11)
        a_grid = jnp.arange(0.2, 0.9, 0.01)

        @jax.jit
        def grid_acc(nT, aT):
            pred = differs & ((est_num > nT) | (est_area < aT))
            return jnp.mean((pred.astype(jnp.int32) == y).astype(_f32))

        acc = jax.vmap(lambda nT: jax.vmap(lambda aT: grid_acc(nT, aT))(a_grid))(
            n_grid
        )
        acc = np.asarray(acc)
        # Match the reference's scan order: smaller num_thresh wins ties
        # (strict improvement per n, argmax per row takes the first best a).
        best_per_n = acc.max(axis=1)
        best_n_idx = 0
        for i in range(1, len(n_grid)):
            if best_per_n[i] > best_per_n[best_n_idx]:
                best_n_idx = i
        num_thresh = int(n_grid[best_n_idx])
        area_thresh = float(a_grid[int(np.argmax(acc[best_n_idx]))])

    t1 = time.perf_counter()
    train_est = _dcsb_predict(tr_conf, tr_area, conf_thresh, num_thresh, area_thresh)
    t2 = time.perf_counter()
    val_est = _dcsb_predict(va_conf, va_area, conf_thresh, num_thresh, area_thresh)
    t3 = time.perf_counter()

    train_acc = float(np.mean(train_est == np.asarray(train_reward).astype(int)))
    val_acc = float(np.mean(val_est == np.asarray(val_reward).astype(int)))
    print(
        f"Computed DCSB thresholds with training accuracy: {train_acc:.3f}, "
        f"validation accuracy: {val_acc:.3f}"
    )
    if save_opts.save and wts_path:
        Path(save_opts.model_dir).mkdir(parents=True, exist_ok=True)
        with open(wts_path, "wb") as f:
            pickle.dump((conf_thresh, num_thresh, area_thresh), f)
    return {
        "train_est": train_est,
        "val_est": val_est,
        "train_time": (t2 - t1) / max(len(train_est), 1),
        "val_time": (t3 - t2) / max(len(val_est), 1),
    }

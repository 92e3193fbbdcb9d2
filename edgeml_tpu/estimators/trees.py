"""Histogram-based decision-tree ensembles in JAX (Random Forest, GBT).

Replaces the reference's sklearn RandomForestRegressor /
GradientBoostingRegressor (/root/reference/regression.py:169-202) — the one
part of its model zoo whose heavy lifting is recursive Cython — with a
TPU-idiomatic formulation:

  * features are quantile-binned once (int bins, static width B);
  * trees grow LEVEL-WISE with fixed-shape state: per level, one scatter-add
    builds (slots, F, B) histograms of (sum g, count) for every active node
    simultaneously, prefix sums over the bin axis give every candidate split's
    left/right statistics, and an argmax picks the best (feature, bin) per
    node — no recursion, no ragged frontier;
  * samples carry a node-slot id; splitting reassigns ids via one gather;
  * the ensemble is a `lax.scan` over trees (bootstrap weights for the
    forest, residual boosting for GBT).

Split gain is plain variance reduction (sklearn's 'squared_error' criterion;
GBR's default friedman_mse differs only in tie-breaking). Behavioral
equivalence is checked against sklearn in tests/test_estimators.py.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .common import SaveOpt, fit_model

_f32 = jnp.float32


@dataclasses.dataclass
class RFROpt:
    """Options for the Random Forest regression model."""

    n_estimators: int = 100  # The number of trees in the forest.
    max_depth: int = 20  # The maximum depth of the tree.
    min_samples_split: int = 100  # Min samples required to split a node.
    n_bins: int = 64
    seed: int = 0


@dataclasses.dataclass
class GBROpt:
    """Options for the Gradient Boosting regression model."""

    learning_rate: float = 0.1  # Shrinkage per boosting stage.
    n_estimators: int = 1000  # The number of boosting stages to perform.
    subsample: float = 1.0  # Fraction of samples per stage.
    max_depth: int = 3  # sklearn GBR default.
    min_samples_split: int = 2
    n_bins: int = 64
    seed: int = 0


_RFROPT = RFROpt()
_GBROPT = GBROpt()


def quantile_bins(x: np.ndarray, n_bins: int) -> np.ndarray:
    """Per-feature bin edges (n_bins - 1, F) from training-data quantiles."""
    qs = np.linspace(0, 100, n_bins + 1)[1:-1]
    return np.percentile(x, qs, axis=0)


def bin_features(x, edges) -> jnp.ndarray:
    """Digitize (N, F) features into int32 bins using per-feature edges."""
    x = jnp.asarray(x, _f32)
    edges = jnp.asarray(edges, _f32)  # (B-1, F)
    return jnp.sum(x[:, None, :] >= edges[None, :, :], axis=1).astype(jnp.int32)


@partial(jax.jit, static_argnames=("depth", "slots", "n_bins", "min_split"))
def _build_tree(xb, g, w, depth, slots, n_bins, min_split):
    """Grow one regression tree level-wise. Returns flat node arrays.

    xb: (N, F) int32 binned features; g: (N,) targets; w: (N,) sample weights.
    Output: dict of (slots,) arrays — feature, bin, left, right, leaf value —
    plus each sample's final slot (for training-set prediction shortcuts).
    """
    n, f = xb.shape
    node = jnp.zeros((n,), jnp.int32)  # per-sample slot id
    feat = jnp.zeros((slots,), jnp.int32)
    thr = jnp.zeros((slots,), jnp.int32)
    left = jnp.zeros((slots,), jnp.int32)
    right = jnp.zeros((slots,), jnp.int32)
    is_split = jnp.zeros((slots,), bool)
    terminal = jnp.zeros((slots,), bool)
    next_free = jnp.asarray(1, jnp.int32)

    def level(carry, _):
        node, feat, thr, left, right, is_split, terminal, next_free = carry
        # Histograms over (slot, feature, bin) in one scatter-add each.
        flat = (node[:, None] * f + jnp.arange(f)[None, :]) * n_bins + xb  # (N, F)
        flat = flat.reshape(-1)
        size = slots * f * n_bins
        gw = (g * w)[:, None].repeat(f, 1).reshape(-1)
        ww = w[:, None].repeat(f, 1).reshape(-1)
        hist_s = jnp.zeros((size,), _f32).at[flat].add(gw).reshape(slots, f, n_bins)
        hist_c = jnp.zeros((size,), _f32).at[flat].add(ww).reshape(slots, f, n_bins)

        cum_s = jnp.cumsum(hist_s, axis=2)
        cum_c = jnp.cumsum(hist_c, axis=2)
        tot_s = cum_s[:, :, -1:]
        tot_c = cum_c[:, :, -1:]
        eps = 1e-12
        # Variance-reduction gain of splitting at "bin <= b".
        gain = (
            cum_s**2 / jnp.maximum(cum_c, eps)
            + (tot_s - cum_s) ** 2 / jnp.maximum(tot_c - cum_c, eps)
            - tot_s**2 / jnp.maximum(tot_c, eps)
        )
        ok = (cum_c >= 1.0) & (tot_c - cum_c >= 1.0)
        gain = jnp.where(ok, gain, -jnp.inf)
        gain = gain.at[:, :, -1].set(-jnp.inf)  # last bin = no split
        best = jnp.argmax(gain.reshape(slots, -1), axis=1)  # (slots,)
        best_f = (best // n_bins).astype(jnp.int32)
        best_b = (best % n_bins).astype(jnp.int32)
        best_gain = jnp.take_along_axis(
            gain.reshape(slots, -1), best[:, None], 1
        )[:, 0]

        cnt = tot_c[:, 0, 0]
        # Only slots that currently hold samples and are still open are
        # considered; unallocated future slots (cnt == 0) must stay open.
        considered = (~terminal) & (~is_split) & (cnt > 0.0)
        can = (
            considered
            & (cnt >= min_split)
            & jnp.isfinite(best_gain)
            & (best_gain > 1e-7)
        )
        # Ranks are monotone in slot id, so a budget overflow drops a suffix
        # of the candidates and next_free stays consistent.
        rank = jnp.cumsum(can.astype(jnp.int32)) - 1
        new_l = next_free + 2 * rank
        new_r = new_l + 1
        can = can & (new_r < slots)  # slot budget guard

        feat = jnp.where(can, best_f, feat)
        thr = jnp.where(can, best_b, thr)
        left = jnp.where(can, new_l, left)
        right = jnp.where(can, new_r, right)
        is_split = is_split | can
        terminal = terminal | (considered & ~can)
        next_free = next_free + 2 * jnp.sum(can.astype(jnp.int32))

        go_left = xb[jnp.arange(n), feat[node]] <= thr[node]
        node = jnp.where(
            can[node], jnp.where(go_left, left[node], right[node]), node
        )
        return (node, feat, thr, left, right, is_split, terminal, next_free), None

    carry = (node, feat, thr, left, right, is_split, terminal, next_free)
    carry, _ = jax.lax.scan(level, carry, None, length=depth)
    node, feat, thr, left, right, is_split, terminal, next_free = carry

    leaf_sum = jnp.zeros((slots,), _f32).at[node].add(g * w)
    leaf_cnt = jnp.zeros((slots,), _f32).at[node].add(w)
    leaf_val = leaf_sum / jnp.maximum(leaf_cnt, 1e-12)
    return {
        "feat": feat,
        "thr": thr,
        "left": left,
        "right": right,
        "is_split": is_split,
        "leaf": leaf_val,
    }


@partial(jax.jit, static_argnames=("depth",))
def _tree_predict(tree, xb, depth):
    n = xb.shape[0]
    node = jnp.zeros((n,), jnp.int32)

    def step(node, _):
        go_left = xb[jnp.arange(n), tree["feat"][node]] <= tree["thr"][node]
        nxt = jnp.where(go_left, tree["left"][node], tree["right"][node])
        node = jnp.where(tree["is_split"][node], nxt, node)
        return node, None

    node, _ = jax.lax.scan(step, node, None, length=depth)
    return tree["leaf"][node]


def _ensemble_predict(trees, xb, depth, scale, base):
    preds = jax.vmap(lambda t: _tree_predict(t, xb, depth))(trees)  # (T, N)
    return base + scale * jnp.sum(preds, axis=0)


class _RFR:
    def __init__(self, opts: RFROpt):
        self.opts = opts

    def fit(self, x, y):
        o = self.opts
        x = np.asarray(x, np.float32)
        y = jnp.asarray(y, _f32)
        n = x.shape[0]
        edges = quantile_bins(x, o.n_bins)
        xb = bin_features(x, edges)
        slots = int(min(2 ** (o.max_depth + 1), 2 * o.max_depth * max(n // max(o.min_samples_split, 1), 1) + 16, 2 * n + 2))
        depth = o.max_depth

        def one_tree(key):
            # bootstrap via multinomial counts as sample weights
            idx = jax.random.randint(key, (n,), 0, n)
            w = jnp.zeros((n,), _f32).at[idx].add(1.0)
            return _build_tree(xb, y, w, depth, slots, o.n_bins, o.min_samples_split)

        keys = jax.random.split(jax.random.PRNGKey(o.seed), o.n_estimators)
        trees = jax.lax.map(one_tree, keys)
        return {
            "trees": jax.device_get(trees),
            "edges": edges,
            "depth": depth,
            "scale": 1.0 / o.n_estimators,
            "base": 0.0,
        }

    def predict(self, state, x):
        xb = bin_features(np.asarray(x, np.float32), state["edges"])
        trees = jax.tree_util.tree_map(jnp.asarray, state["trees"])
        return _ensemble_predict(
            trees, xb, state["depth"], state["scale"], state["base"]
        )


class _GBR:
    def __init__(self, opts: GBROpt):
        self.opts = opts

    def fit(self, x, y):
        o = self.opts
        x = np.asarray(x, np.float32)
        yj = jnp.asarray(y, _f32)
        n = x.shape[0]
        edges = quantile_bins(x, o.n_bins)
        xb = bin_features(x, edges)
        slots = 2 ** (o.max_depth + 1)
        depth = o.max_depth
        base = float(np.mean(np.asarray(y)))

        def stage(carry, key):
            pred = carry
            resid = yj - pred
            if o.subsample < 1.0:
                w = (jax.random.uniform(key, (n,)) < o.subsample).astype(_f32)
            else:
                w = jnp.ones((n,), _f32)
            tree = _build_tree(xb, resid, w, depth, slots, o.n_bins, o.min_samples_split)
            pred = pred + o.learning_rate * _tree_predict(tree, xb, depth)
            return pred, tree

        keys = jax.random.split(jax.random.PRNGKey(o.seed), o.n_estimators)
        pred0 = jnp.full((n,), base, _f32)
        _, trees = jax.lax.scan(stage, pred0, keys)
        return {
            "trees": jax.device_get(trees),
            "edges": edges,
            "depth": depth,
            "scale": o.learning_rate,
            "base": base,
        }

    predict = _RFR.predict


def fit_RFR(data, opts: RFROpt = _RFROPT, save_opts: SaveOpt | None = None):
    """Fit a Random Forest Regressor."""
    return fit_model(_RFR(opts), "Random Forest Regressor", data, save_opts)


def fit_GBR(data, opts: GBROpt = _GBROPT, save_opts: SaveOpt | None = None):
    """Fit a Gradient Boosting Regressor."""
    return fit_model(_GBR(opts), "Gradient Boosting Regressor", data, save_opts)

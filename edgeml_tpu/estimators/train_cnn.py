"""CNN/MLP reward-estimator training loop (optax, torch-Adam semantics).

Behavioral counterpart of the reference's `fit_CNN`
(/root/reference/regression.py:221-355): Adam(lr 5e-3, weight-decay 5e-5 added
to the raw gradient, torch-style), MultiStep LR schedule ([60, 75, 90],
gamma 0.5), 100 epochs, batch 64 in fixed order (the reference's DataLoader
does not shuffle), MSE or reward-weighted MSE `mean((pred - y)^2 * y)`,
periodic validation with best-by-val-loss snapshotting, and per-image
train/val inference latency persisted with the estimates.

The training step is one jitted function; batches of equal shape reuse the
compiled step. Checkpoints are saved per fold as wts{k}.npz (best/last).
"""

from __future__ import annotations

import dataclasses
import os
import time
from pathlib import Path
from typing import List

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..utils.paths import parse_path
from .common import SaveOpt
from .nn import EdgeDetectionNet


@dataclasses.dataclass
class CNNOpt:
    """Options for the Convolutional Neural Network model
    (field names and defaults mirror regression.py:221-239)."""

    resize: bool = True  # Whether the inputs share the same shape.
    learning_rate: float = 5e-3  # Initial learning rate.
    gamma: float = 0.5  # Scale for updating learning rate at each milestone.
    weight_decay: float = 5e-5  # Weight decay parameter for optimizer.
    milestones: List = dataclasses.field(default_factory=lambda: [60, 75, 90])
    max_epoch: int = 100  # Maximum number of epochs for training.
    batch_size: int = 64  # Batch size for model training.
    channels: List = dataclasses.field(default_factory=lambda: [])
    kernels: List = dataclasses.field(default_factory=lambda: [3, 3, 3, 3, 3])
    pools: List = dataclasses.field(
        default_factory=lambda: [True, True, False, False, False]
    )
    weight: bool = False  # Reward-weighted MSE loss.
    linear: List = dataclasses.field(
        default_factory=lambda: [145, 16, 16, 16, 16, 1]
    )
    test_epoch: int = 1  # Validation period in epochs.
    seed: int = 0


_CNNOPT = CNNOpt()


def _batches(feats, rewards, batch_size):
    """Fixed-order batches; per-sample arrays stacked (requires equal shapes
    within a batch, which resize=True guarantees and batch_size=1 sidesteps)."""
    n = len(rewards)
    for s in range(0, n, batch_size):
        e = min(s + batch_size, n)
        x = np.stack([np.asarray(f, np.float32) for f in feats[s:e]])
        y = np.asarray(rewards[s:e], np.float32).reshape(-1, 1)
        yield x, y


def _loss_fn(net, params, bn_state, x, y, rng, weighted, train):
    pred, new_state = net.apply(params, bn_state, x, train=train, rng=rng)
    err = (pred - y) ** 2
    loss = jnp.mean(err * y) if weighted else jnp.mean(err)
    return loss, new_state


def fit_CNN(
    data,
    opts: CNNOpt = _CNNOPT,
    save_opts: SaveOpt | None = None,
    plot: bool = True,
):
    """Train EdgeDetectionNet; returns (best_result, last_result) dicts
    matching the reference's estimate{k}.npz payloads (regression.py:347-355)."""
    save_opts = save_opts or SaveOpt()
    train_feature, val_feature, train_reward, val_reward = data
    train_reward = np.asarray(train_reward, np.float32)
    val_reward = np.asarray(val_reward, np.float32)

    # Infer channel chain: prepend the input channel count when conv layers
    # are configured relative to the data (reference passes the full chain).
    channels = list(opts.channels)
    net = EdgeDetectionNet.from_opts(
        channels, opts.kernels, opts.pools, opts.linear, opts.resize
    )
    key = jax.random.PRNGKey(opts.seed)
    key, init_key = jax.random.split(key)
    params = net.init(init_key)
    bn_state = net.init_bn_state()

    model_best_dir, model_last_dir = parse_path(save_opts.model_dir)
    if save_opts.load and save_opts.model_dir:
        loaded = np.load(
            os.path.join(model_last_dir, f"wts{save_opts.model_idx}.npz"),
            allow_pickle=True,
        )
        params = jax.tree_util.tree_map(jnp.asarray, loaded["params"].item())
        bn_state = jax.tree_util.tree_map(jnp.asarray, loaded["bn"].item())

    # MultiStepLR: lr * gamma^(milestones passed), stepped per epoch.
    def lr_for_epoch(epoch: int) -> float:
        lr = opts.learning_rate
        for m in sorted(opts.milestones):
            if epoch >= m:
                lr *= opts.gamma
        return lr

    opt = optax.chain(
        optax.add_decayed_weights(opts.weight_decay),
        optax.scale_by_adam(),
        optax.scale(-1.0),
    )
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, bn_state, opt_state, x, y, rng, lr):
        (loss, new_bn), grads = jax.value_and_grad(
            lambda p: _loss_fn(net, p, bn_state, x, y, rng, opts.weight, True),
            has_aux=True,
        )(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        updates = jax.tree_util.tree_map(lambda u: u * lr, updates)
        params = optax.apply_updates(params, updates)
        return params, new_bn, opt_state, loss

    @jax.jit
    def eval_loss(params, bn_state, x, y):
        loss, _ = _loss_fn(
            net, params, bn_state, x, y, jax.random.PRNGKey(0), opts.weight, False
        )
        return loss

    @jax.jit
    def forward(params, bn_state, x):
        pred, _ = net.apply(params, bn_state, x, train=False)
        return pred

    def test_loss_of(params, bn_state):
        losses = [
            float(eval_loss(params, bn_state, x, y))
            for x, y in _batches(val_feature, val_reward, opts.batch_size)
        ]
        return float(np.mean(losses)) if losses else float("inf")

    best_params, best_bn = params, bn_state
    best_test_err = np.inf
    train_losses, test_losses = [], []
    step_rng = key
    for epoch in range(opts.max_epoch):
        lr = lr_for_epoch(epoch)
        epoch_losses = []
        for x, y in _batches(train_feature, train_reward, opts.batch_size):
            step_rng, sub = jax.random.split(step_rng)
            params, bn_state, opt_state, loss = train_step(
                params, bn_state, opt_state, x, y, sub, lr
            )
            epoch_losses.append(float(loss))
        train_losses.append(float(np.mean(epoch_losses)) if epoch_losses else 0.0)
        if epoch % opts.test_epoch == 0:
            tl = test_loss_of(params, bn_state)
            test_losses.append(tl)
            if tl < best_test_err:
                best_test_err = tl
                best_params = jax.tree_util.tree_map(lambda a: a, params)
                best_bn = jax.tree_util.tree_map(lambda a: a, bn_state)
        if epoch % 10 == 0 or epoch == opts.max_epoch - 1:
            print(
                f"Epoch {epoch + 1}: train loss {train_losses[-1]:.6f}"
                + (f", val loss {test_losses[-1]:.6f}" if test_losses else "")
            )

    if plot:
        try:
            from .plotting import cnn_plot

            cnn_plot(
                train_losses,
                test_losses,
                opts.test_epoch,
                opts.milestones,
                save_opts.model_idx,
            )
        except Exception as exc:  # plotting must never kill a training run
            print(f"Skipping loss plot: {exc}")

    def estimate(p, b):
        t1 = time.perf_counter()
        tr = [
            np.asarray(forward(p, b, x))
            for x, _ in _batches(train_feature, train_reward, opts.batch_size)
        ]
        tr = np.concatenate(tr).reshape(-1) if tr else np.zeros(0, np.float32)
        t2 = time.perf_counter()
        va = [
            np.asarray(forward(p, b, x))
            for x, _ in _batches(val_feature, val_reward, opts.batch_size)
        ]
        va = np.concatenate(va).reshape(-1) if va else np.zeros(0, np.float32)
        t3 = time.perf_counter()
        return (
            tr,
            va,
            (t2 - t1) / max(len(train_reward), 1),
            (t3 - t2) / max(len(val_reward), 1),
        )

    tb, vb, tbt, vbt = estimate(best_params, best_bn)
    tl_, vl, tlt, vlt = estimate(params, bn_state)

    if save_opts.save and save_opts.model_dir:
        for d, p, b in (
            (model_best_dir, best_params, best_bn),
            (model_last_dir, params, bn_state),
        ):
            Path(d).mkdir(parents=True, exist_ok=True)
            np.savez(
                os.path.join(d, f"wts{save_opts.model_idx}.npz"),
                params=np.array(
                    jax.tree_util.tree_map(np.asarray, p), dtype=object
                ),
                bn=np.array(jax.tree_util.tree_map(np.asarray, b), dtype=object),
            )

    best = {"train_est": tb, "val_est": vb, "train_time": tbt, "val_time": vbt}
    last = {"train_est": tl_, "val_est": vl, "train_time": tlt, "val_time": vlt}
    return best, last

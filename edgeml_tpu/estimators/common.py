"""Shared estimator plumbing: scaling, save/load, the generic fit driver.

Counterpart of the reference's `fit_model` wrapper (/root/reference/regression.py:38-77):
flatten features -> standardize -> fit -> timed predictions on train+val ->
MSE log -> optional pickle of (model_state, scaler) as wts{k}.pickle. The
models themselves are JAX (edgeml_tpu.estimators.linear/trees), not sklearn.
"""

from __future__ import annotations

import dataclasses
import os
import pickle
import time
from pathlib import Path

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class SaveOpt:
    """Options for loading/saving model weights (regression.py:27-35)."""

    model_dir: str = ""  # Directory to save the model weights.
    load: bool = False  # If model is loaded from pre-trained weights.
    save: bool = True  # If model weights need to be saved after training.
    model_idx: int = 1  # The index of model in cross validation.


class StandardScaler:
    """Per-feature zero-mean unit-variance scaling (population std, like
    sklearn's StandardScaler)."""

    def __init__(self, mean=None, scale=None):
        self.mean = mean
        self.scale = scale

    def fit(self, x: np.ndarray) -> "StandardScaler":
        x = np.asarray(x, np.float64)
        self.mean = x.mean(axis=0)
        std = x.std(axis=0)
        self.scale = np.where(std == 0.0, 1.0, std)
        return self

    def transform(self, x) -> np.ndarray:
        return (np.asarray(x, np.float64) - self.mean) / self.scale

    def state(self):
        return {"mean": self.mean, "scale": self.scale}

    @classmethod
    def from_state(cls, s):
        return cls(s["mean"], s["scale"])


def _flatten_features(feats) -> np.ndarray:
    return np.stack([np.asarray(f, np.float64).reshape(-1) for f in feats])


def fit_model(model, name: str, data, save_opts: SaveOpt | None = None):
    """Generic fit/predict driver for the non-CNN regressors.

    `model` must expose fit(X, y) -> state and predict(state, X) -> y_hat,
    with X already standardized. Returns the estimate{k}.npz payload
    {train_est, val_est, train_time, val_time} (regression.py:77).
    """
    save_opts = save_opts or SaveOpt()
    train_feature, val_feature, train_reward, val_reward = data
    x_train = _flatten_features(train_feature)
    x_val = _flatten_features(val_feature)

    wts_path = (
        os.path.join(save_opts.model_dir, f"wts{save_opts.model_idx}.pickle")
        if save_opts.model_dir
        else None
    )
    if save_opts.load and wts_path:
        with open(wts_path, "rb") as f:
            state, scaler_state = pickle.load(f)
        scaler = StandardScaler.from_state(scaler_state)
        x_train = scaler.transform(x_train)
        x_val = scaler.transform(x_val)
    else:
        scaler = StandardScaler().fit(x_train)
        x_train = scaler.transform(x_train)
        x_val = scaler.transform(x_val)
        state = model.fit(x_train, np.asarray(train_reward, np.float64))

    t1 = time.perf_counter()
    train_est = np.asarray(model.predict(state, x_train)).reshape(-1)
    t2 = time.perf_counter()
    val_est = np.asarray(model.predict(state, x_val)).reshape(-1)
    t3 = time.perf_counter()
    train_time = (t2 - t1) / max(len(train_reward), 1)
    val_time = (t3 - t2) / max(len(val_reward), 1)

    train_mse = float(np.mean((np.asarray(train_reward) - train_est) ** 2))
    val_mse = float(np.mean((np.asarray(val_reward) - val_est) ** 2))
    print(
        f"Trained {name} model with training MSE: {train_mse:.3f}, "
        f"validation MSE: {val_mse:.3f}"
    )

    if save_opts.save and wts_path:
        Path(save_opts.model_dir).mkdir(parents=True, exist_ok=True)
        with open(wts_path, "wb") as f:
            pickle.dump((state, scaler.state()), f)
    return {
        "train_est": train_est,
        "val_est": val_est,
        "train_time": train_time,
        "val_time": val_time,
    }

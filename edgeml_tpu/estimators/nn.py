"""EdgeDetectionNet: the configurable conv/MLP reward estimator, in pure JAX.

Architecture parity with /root/reference/lib/nn_model.py:28-112:
  * conv stacks: Conv2d(kernel, padding='same', kaiming-uniform init)
    [+ BatchNorm2d if resize] + ReLU + Dropout(0.1) [+ MaxPool2d(2, 2)];
  * linear stacks: Linear (kaiming-uniform) [+ BatchNorm1d + ReLU +
    Dropout(0.1) on all but the last];
  * empty `channels` -> pure MLP; empty `linear` -> fully-convolutional with
    global average pooling; resize=False -> spatial mean before flatten so
    variable-shape feature maps are supported (batch size 1).

Implemented as an init/apply pair over a parameter pytree (NCHW layout to
match the on-disk feature-map format). BatchNorm keeps torch semantics:
eps 1e-5, momentum 0.1, biased batch variance for normalization, unbiased
for the running update.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

BN_EPS = 1e-5
BN_MOMENTUM = 0.1
DROPOUT_P = 0.1


def _kaiming_uniform(key, shape, fan_in):
    bound = math.sqrt(6.0 / fan_in)  # gain sqrt(2) * sqrt(3 / fan_in)
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def _bias_uniform(key, shape, fan_in):
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


@dataclasses.dataclass(frozen=True)
class EdgeDetectionNet:
    """Static architecture spec; parameters live in a separate pytree."""

    channels: tuple  # per-conv-layer (in, out) channel chain, e.g. (C, 32, 64)
    kernels: tuple  # kernel size per conv layer
    pools: tuple  # whether each conv layer is followed by 2x2 max pooling
    linear: tuple  # feature chain of the linear head, e.g. (145, 16, 1)
    resize: bool = True  # inputs share one shape (enables BatchNorm)

    def __post_init__(self):
        assert len(self.channels) > 1 or len(self.linear) > 1, (
            "Invalid CNN architecture. Please add at least 1 convolutional "
            "or linear layer."
        )

    @property
    def n_conv(self):
        return max(len(self.channels) - 1, 0)

    @property
    def n_linear(self):
        return max(len(self.linear) - 1, 0)

    def init(self, key) -> dict:
        params: dict = {"conv": [], "linear": []}
        for i in range(self.n_conv):
            cin, cout, k = self.channels[i], self.channels[i + 1], self.kernels[i]
            key, kw, kb = jax.random.split(key, 3)
            fan_in = cin * k * k
            layer = {
                "w": _kaiming_uniform(kw, (cout, cin, k, k), fan_in),
                "b": _bias_uniform(kb, (cout,), fan_in),
            }
            if self.resize:
                layer["bn"] = {
                    "scale": jnp.ones((cout,)),
                    "bias": jnp.zeros((cout,)),
                }
            params["conv"].append(layer)
        for i in range(self.n_linear):
            fin, fout = self.linear[i], self.linear[i + 1]
            key, kw, kb = jax.random.split(key, 3)
            layer = {
                "w": _kaiming_uniform(kw, (fout, fin), fin),
                "b": _bias_uniform(kb, (fout,), fin),
            }
            if self.resize and i != self.n_linear - 1:
                layer["bn"] = {
                    "scale": jnp.ones((fout,)),
                    "bias": jnp.zeros((fout,)),
                }
            params["linear"].append(layer)
        return params

    def init_bn_state(self) -> dict:
        state: dict = {"conv": [], "linear": []}
        for i in range(self.n_conv):
            cout = self.channels[i + 1]
            state["conv"].append(
                {"mean": jnp.zeros((cout,)), "var": jnp.ones((cout,))}
                if self.resize
                else {}
            )
        for i in range(self.n_linear):
            fout = self.linear[i + 1]
            state["linear"].append(
                {"mean": jnp.zeros((fout,)), "var": jnp.ones((fout,))}
                if (self.resize and i != self.n_linear - 1)
                else {}
            )
        return state

    def _bn(self, x, p, s, train, axes):
        if train:
            mean = jnp.mean(x, axis=axes)
            var = jnp.var(x, axis=axes)
            n = x.size / mean.size
            unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
            new_s = {
                "mean": (1 - BN_MOMENTUM) * s["mean"] + BN_MOMENTUM * mean,
                "var": (1 - BN_MOMENTUM) * s["var"] + BN_MOMENTUM * unbiased,
            }
        else:
            mean, var, new_s = s["mean"], s["var"], s
        shape = [1] * x.ndim
        shape[1] = -1
        x = (x - mean.reshape(shape)) * jax.lax.rsqrt(var.reshape(shape) + BN_EPS)
        return x * p["scale"].reshape(shape) + p["bias"].reshape(shape), new_s

    def _dropout(self, x, key, train):
        if not train:
            return x
        keep = jax.random.bernoulli(key, 1.0 - DROPOUT_P, x.shape)
        return jnp.where(keep, x / (1.0 - DROPOUT_P), 0.0)

    def apply(self, params, bn_state, x, *, train: bool = False, rng=None):
        """Forward pass. x: (B, C, H, W) for conv nets, (B, F) or (B, C, H, W)
        for MLPs. Returns (pred (B, 1), new_bn_state)."""
        if rng is None:
            rng = jax.random.PRNGKey(0)
        new_state = {"conv": [], "linear": []}
        for i, layer in enumerate(params["conv"]):
            x = jax.lax.conv_general_dilated(
                x,
                layer["w"],
                window_strides=(1, 1),
                padding="SAME",
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
            ) + layer["b"].reshape(1, -1, 1, 1)
            if "bn" in layer:
                x, s = self._bn(
                    x, layer["bn"], bn_state["conv"][i], train, axes=(0, 2, 3)
                )
            else:
                s = bn_state["conv"][i]
            new_state["conv"].append(s)
            x = jax.nn.relu(x)
            rng, sub = jax.random.split(rng)
            x = self._dropout(x, sub, train)
            if self.pools[i]:
                x = jax.lax.reduce_window(
                    x,
                    -jnp.inf,
                    jax.lax.max,
                    (1, 1, 2, 2),
                    (1, 1, 2, 2),
                    "VALID",
                )
        if x.ndim == 4:
            if not self.resize:
                # Average pooling when feature maps have different shapes
                # (nn_model.py:106-108).
                x = jnp.mean(x, axis=(2, 3), keepdims=True)
            elif self.n_linear == 0:
                # Fully-convolutional net ends with global average pooling.
                x = jnp.mean(x, axis=(2, 3), keepdims=True)
            x = x.reshape(x.shape[0], -1)
        for i, layer in enumerate(params["linear"]):
            x = x @ layer["w"].T + layer["b"]
            if "bn" in layer:
                x, s = self._bn(
                    x, layer["bn"], bn_state["linear"][i], train, axes=(0,)
                )
            else:
                s = bn_state["linear"][i]
            new_state["linear"].append(s)
            if i != self.n_linear - 1:
                x = jax.nn.relu(x)
                rng, sub = jax.random.split(rng)
                x = self._dropout(x, sub, train)
        return x, new_state

    @staticmethod
    def from_opts(channels: Sequence[int], kernels, pools, linear, resize=True):
        return EdgeDetectionNet(
            tuple(channels), tuple(kernels), tuple(pools), tuple(linear), resize
        )

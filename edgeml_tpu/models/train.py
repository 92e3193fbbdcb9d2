"""Detector training: jitted step, mesh data parallelism, checkpointing.

Counterpart of the reference trainer stack (torch_models/train.py:85-139 +
references/engine.py:12-60): SGD(momentum)/AdamW, MultiStep or cosine LR with
a linear warmup on the first epoch, per-epoch checkpoints of
{model, optimizer, lr_scheduler, args, epoch} plus every 10th epoch, --resume.

The TPU redesign: one jitted `train_step` (forward + loss + optimizer update,
optionally with batch-stat BatchNorm updates) whose batch axis is sharded
over a Mesh 'dp' axis — XLA inserts the gradient all-reduce over ICI,
replacing the reference's (latent) DDP/NCCL path (references/utils.py:260-283).
"""

from __future__ import annotations

import dataclasses
import os
import pickle
from functools import partial
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..parallel.mesh import is_primary
from .loss import yolo_loss
from .yolov5 import YoloV5


@dataclasses.dataclass
class TrainConfig:
    """Optimization settings (names/defaults mirror torch_models/train.py:143-164).

    The last four fields extend the reference surface with the ultralytics
    YOLO recipe's optimizer shape (yolov5_scripts.md trains through
    ultralytics train.py): nesterov momentum, a cosine floor (one_cycle's
    lrf), epoch-based warmup, and weight decay restricted to kernel weights
    (BN gains and biases excluded). Defaults keep exact reference behavior.
    """

    opt: str = "sgd"
    lr: float = 0.02
    momentum: float = 0.9
    weight_decay: float = 1e-4
    lr_scheduler: str = "multisteplr"
    lr_steps: tuple = (16, 22)
    lr_gamma: float = 0.1
    epochs: int = 30
    warmup_iters: int = 1000  # engine.py:18-25: min(1000, len(loader) - 1)
    warmup_factor: float = 1.0 / 1000
    nesterov: bool = False
    lrf: float = 0.0  # cosine final LR as a fraction of lr (ultralytics lrf)
    warmup_epochs: float = 0.0  # >0: linear warmup over this many epochs
    decay_mask: str = "all"  # "weights": decay only ndim>=2 kernels


def yolo_recipe_config(epochs: int = 300) -> TrainConfig:
    """The ultralytics hyp.scratch-low optimizer recipe (the settings behind
    the reference's prescribed YOLO training, yolov5_scripts.md:9): nesterov
    SGD(0.937), lr 0.01 one_cycle-cosine to lrf=0.01, 3-epoch warmup, weight
    decay 5e-4 on kernel weights only. Divergence (documented): ultralytics
    ramps bias LR from 0.1 and momentum from 0.8 during warmup per param
    group; this config uses one global 0 -> lr ramp."""
    return TrainConfig(
        opt="sgd", lr=0.01, momentum=0.937, weight_decay=5e-4,
        lr_scheduler="cosineannealinglr", epochs=epochs, nesterov=True,
        lrf=0.01, warmup_epochs=3.0, decay_mask="weights",
    )


def lr_at(cfg: TrainConfig, epoch: int, it: int, steps_per_epoch: int) -> float:
    """LR schedule: linear warmup (epoch-0 iter-based by default; over
    warmup_epochs when set), then MultiStep or cosine (one_cycle floor at
    lr * lrf — lrf=0 reduces to the reference's plain cosine)."""
    if cfg.lr_scheduler == "multisteplr":
        lr = cfg.lr * cfg.lr_gamma ** sum(epoch >= m for m in cfg.lr_steps)
    else:  # cosineannealinglr / one_cycle with floor
        lr = cfg.lr * (
            (1 - np.cos(np.pi * epoch / cfg.epochs)) / 2 * (cfg.lrf - 1) + 1
        )
    if cfg.warmup_epochs > 0:
        w = max(cfg.warmup_epochs * steps_per_epoch, 1)
        g = epoch * steps_per_epoch + it
        if g < w:
            lr = lr * (g / w)
    elif epoch == 0:
        w = min(cfg.warmup_iters, max(steps_per_epoch - 1, 1))
        a = min(it / max(w, 1), 1.0)
        lr = lr * (cfg.warmup_factor * (1 - a) + a)
    return float(lr)


def _decay_mask_fn(cfg: TrainConfig):
    if cfg.decay_mask == "all":
        return None
    if cfg.decay_mask == "weights":
        # ultralytics param grouping: decay conv/linear kernels only; BN
        # gains ('g') and every bias ('b') are ndim-1 and stay undecayed.
        return lambda params: jax.tree_util.tree_map(
            lambda a: jnp.asarray(a).ndim >= 2, params
        )
    raise RuntimeError(f"Invalid decay_mask {cfg.decay_mask!r}.")


def make_optimizer(cfg: TrainConfig):
    mask = _decay_mask_fn(cfg)
    if cfg.opt == "sgd":
        return optax.chain(
            optax.add_decayed_weights(cfg.weight_decay, mask=mask),
            optax.trace(decay=cfg.momentum, nesterov=cfg.nesterov),
            optax.scale(-1.0),
        )
    if cfg.opt == "adamw":
        return optax.chain(
            optax.scale_by_adam(),
            optax.add_decayed_weights(cfg.weight_decay, mask=mask),
            optax.scale(-1.0),
        )
    raise RuntimeError(f"Invalid optimizer {cfg.opt}. Only SGD and AdamW are supported.")


def amp_cast(tree, dtype, keep=("m", "v")):
    """Cast every float32 leaf of a param pytree to the AMP compute dtype,
    EXCEPT leaves named in `keep` (frozen-BN running statistics — normalizing
    with bf16-rounded variances would bake a systematic error into every
    activation; the norm layers upcast them internally anyway).

    dtype=None returns the tree unchanged. This is the parameter half of the
    mixed-precision recipe (f32 master weights, low-precision compute) that
    replaces the reference's torch.cuda.amp autocast+GradScaler
    (/root/reference/torch_models/references/engine.py:27-43); bfloat16
    shares float32's exponent range, so no loss scaler is needed.
    """
    if dtype is None:
        return tree

    def cast(path, a):
        if getattr(a, "dtype", None) != jnp.float32:
            return a
        last = path[-1]
        name = getattr(last, "key", getattr(last, "name", None))
        if name in keep:
            return a
        return a.astype(dtype)

    return jax.tree_util.tree_map_with_path(cast, tree)


TRAIN_REMAT = None
"""Rematerialization policy for the training forward (trace-time knob;
clear the step cache after flipping). The r4 train ablation measured the
backward at 3x the forward (theoretical FLOP ratio 2x) — the excess is
saved-activation HBM traffic, which jax.checkpoint trades for recompute:

  None      — no checkpointing (XLA saves what it likes);
  "dots"    — save conv/matmul outputs, recompute elementwise (BN/SiLU)
              in the backward: ~3x fewer saved activations per conv block;
  "nothing" — save nothing, recompute the whole forward per backward
              segment (max memory savings, max extra FLOPs).

Decided by TPU A/B (tools/exp_remat.py); gradients are bit-identical
(recompute re-runs the identical subgraph)."""


def _remat_policy():
    import jax.ad_checkpoint as adc

    return {
        None: None,
        "dots": adc.checkpoint_policies.dots_with_no_batch_dims_saveable,
        "nothing": adc.checkpoint_policies.nothing_saveable,
    }[TRAIN_REMAT]


def make_train_step(net: YoloV5, cfg: TrainConfig, dtype=None):
    """Build the jitted training step: (params, stats, opt_state, batch, lr)
    -> (params, stats, opt_state, loss, parts). Shard `images`/`targets`
    along their leading axis for data parallelism.

    dtype: optional AMP compute dtype (jnp.bfloat16). Master weights,
    optimizer state, gradients, BN statistics, and the loss stay float32;
    the forward/backward convolutions run in `dtype` (params and images are
    cast inside loss_fn, so autodiff produces f32 gradients through the
    cast). Head outputs are upcast before the loss. The reference equivalent
    is engine.py:27-43's AMP-optional path."""
    opt = make_optimizer(cfg)

    @jax.jit
    def step(params, stats, opt_state, images, targets, target_valid, lr):
        def fwd(p_c, x):
            return net.apply(p_c, stats, x, train=True)

        if TRAIN_REMAT is not None:
            fwd = jax.checkpoint(fwd, policy=_remat_policy())

        def loss_fn(p):
            p_c = amp_cast(p, dtype)
            x = images if dtype is None else images.astype(dtype)
            heads, new_stats, _ = fwd(p_c, x)
            if dtype is not None:
                heads = [h.astype(jnp.float32) for h in heads]
            total, parts = yolo_loss(net, heads, targets, target_valid)
            return total, (new_stats, parts)

        (loss, (new_stats, parts)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        updates = jax.tree_util.tree_map(lambda u: u * lr, updates)
        params = optax.apply_updates(params, updates)
        return params, new_stats, opt_state, loss, parts

    return opt, step


def make_ema_update(decay: float = 0.9999, tau: float = 2000.0):
    """Model EMA with the ultralytics warmup ramp — the missing half of the
    reference's prescribed YOLO training recipe (yolov5_scripts.md:9 trains
    through ultralytics train.py, whose ModelEMA shadows every floating
    state-dict entry, BN running stats included):

        d(n) = decay * (1 - exp(-n / tau));   ema <- d*ema + (1-d)*value

    Returns a jitted (ema_tree, value_tree, n_updates) -> ema_tree; apply it
    to {"params": ..., "stats": ...} so BN statistics are shadowed like
    ultralytics does. n_updates is the 1-based optimizer-update count (a host
    scalar, like lr) so resuming a run keeps the ramp position."""

    @jax.jit
    def update(ema, value, n_updates):
        d = decay * (1.0 - jnp.exp(-n_updates / tau))

        def one(e, v):
            if not jnp.issubdtype(jnp.asarray(e).dtype, jnp.floating):
                return v  # integer state (e.g. step counters) tracks the live value
            return e + (1.0 - d) * (v.astype(e.dtype) - e)

        return jax.tree_util.tree_map(one, ema, value)

    return update


def save_checkpoint(path: str, params, stats, opt_state, cfg, epoch: int,
                    backend: str = "pickle", ema=None):
    """Checkpoint dict parity with train.py:126-136 ({model, optimizer,
    lr_scheduler, args, epoch}); written only by the primary process.

    backend="orbax" stores the same payload through orbax-checkpoint
    (directory format, async-capable, multi-host safe) — the TPU-native
    upgrade path; "pickle" (default) keeps the reference's single-file
    protocol.

    ema: optional {"params", "stats", "n_updates"} EMA shadow (--ema); stored
    under an extra "ema" key so reference-shaped consumers are unaffected.
    """
    if not is_primary():
        return
    payload = {
        "model": jax.tree_util.tree_map(np.asarray, {"params": params, "stats": stats}),
        "optimizer": jax.tree_util.tree_map(np.asarray, opt_state),
        "lr_scheduler": {
            "name": cfg.lr_scheduler,
            "steps": list(cfg.lr_steps),
            "gamma": cfg.lr_gamma,
        },
        "args": dataclasses.asdict(cfg),
        "epoch": epoch,
    }
    if ema is not None:
        payload["ema"] = jax.tree_util.tree_map(np.asarray, ema)
    if backend == "orbax":
        import orbax.checkpoint as ocp

        with ocp.PyTreeCheckpointer() as ckptr:
            ckptr.save(os.path.abspath(path), payload, force=True)
        return
    Path(os.path.dirname(path) or ".").mkdir(parents=True, exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(payload, f)


def load_checkpoint(path: str):
    if os.path.isdir(path):  # orbax directory checkpoint
        import orbax.checkpoint as ocp

        with ocp.PyTreeCheckpointer() as ckptr:
            payload = ckptr.restore(os.path.abspath(path))
    else:
        with open(path, "rb") as f:
            payload = pickle.load(f)
    model = jax.tree_util.tree_map(jnp.asarray, payload["model"])
    opt_state = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a) if isinstance(a, np.ndarray) else a,
        payload["optimizer"],
    )
    return model["params"], model["stats"], opt_state, payload


def pad_targets(label_list, max_targets: int):
    """Per-image (m, 5) [cls, x, y, w, h] arrays -> (B, MAXT, 5) + mask."""
    b = len(label_list)
    out = np.zeros((b, max_targets, 5), np.float32)
    valid = np.zeros((b, max_targets), bool)
    for i, lab in enumerate(label_list):
        lab = np.asarray(lab, np.float32).reshape(-1, 5)[:max_targets]
        out[i, : len(lab)] = lab
        valid[i, : len(lab)] = True
    return out, valid

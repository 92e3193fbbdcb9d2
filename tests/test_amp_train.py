"""bfloat16 mixed-precision training (the reference engine's AMP equivalent,
/root/reference/torch_models/references/engine.py:27-43: autocast+GradScaler;
bf16 needs no scaler).

Contract under test: master weights / optimizer state / BN statistics / loss
stay float32, the forward+backward runs in bfloat16, and one bf16 step stays
numerically close to the f32 step from identical state."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from edgeml_tpu.models.engine import make_detector, make_family_train_step
from edgeml_tpu.models.train import TrainConfig, amp_cast, pad_targets


def _batch(b, size, seed=0):
    rng = np.random.default_rng(seed)
    images = rng.random((b, size, size, 3)).astype(np.float32)
    labels = [
        np.array(
            [[1, 0.5, 0.5, 0.3, 0.4], [2, 0.3, 0.3, 0.2, 0.2]], np.float32
        )
        for _ in range(b)
    ]
    targets, valid = pad_targets(labels, max_targets=8)
    return jnp.asarray(images), jnp.asarray(targets), jnp.asarray(valid)


def _leaf_dtypes(tree):
    return {
        str(a.dtype)
        for a in jax.tree_util.tree_leaves(tree)
        if hasattr(a, "dtype")
    }


@pytest.mark.parametrize("family,size", [("yolov5n", 64), ("ssd", 64),
                                         ("retinanet", 64)])
def test_bf16_step_close_to_f32(family, size):
    net, params, stats = make_detector(family, 8, size)
    cfg = TrainConfig()
    _, step32 = make_family_train_step(net, cfg, dtype=None)
    _, step16 = make_family_train_step(net, cfg, dtype=jnp.bfloat16)
    images, targets, valid = _batch(2, size)
    key = jax.random.PRNGKey(0)

    def run(step):
        from edgeml_tpu.models.engine import make_optimizer

        opt = make_optimizer(cfg)
        opt_state = opt.init(params)
        return step(params, stats, opt_state, images, targets, valid, 0.01, key)

    p32, s32, _, loss32, _ = run(step32)
    p16, s16, _, loss16, _ = run(step16)

    loss32, loss16 = float(loss32), float(loss16)
    assert np.isfinite(loss16)
    # bf16 has ~3 decimal digits; the losses agree to ~1%
    assert loss16 == pytest.approx(loss32, rel=0.02), (loss32, loss16)

    # master weights and BN statistics stay f32
    assert _leaf_dtypes(p16) == {"float32"}
    if s16 is not None:
        assert _leaf_dtypes(s16) == {"float32"}

    # the updates go the same general direction: parameters changed, and the
    # bf16 update is close to the f32 update relative to its own size
    d32 = jax.tree_util.tree_map(lambda a, b: np.asarray(a - b), p32, params)
    d16 = jax.tree_util.tree_map(lambda a, b: np.asarray(a - b), p16, params)
    n32 = np.sqrt(sum(float((d**2).sum()) for d in jax.tree_util.tree_leaves(d32)))
    n16 = np.sqrt(sum(float((d**2).sum()) for d in jax.tree_util.tree_leaves(d16)))
    assert n32 > 0 and n16 > 0
    # loose bound: families with ranking-based losses (SSD's hard-negative
    # mining) legitimately reselect under bf16 score perturbations at random
    # init, shifting the gradient more than the loss
    assert n16 == pytest.approx(n32, rel=0.35), (n32, n16)


def test_faster_rcnn_bf16_step_close_to_f32():
    """Faster R-CNN AMP: compute stages (backbone/RPN/RoIAlign/box head) in
    bf16, every decision stage (proposal decode/NMS, matching, sampling,
    encode, losses) f32 — the same boundaries as its serving knob. The two
    steps share one PRNG key, so the balanced samplers draw identical keys;
    proposal sets may still differ slightly (RPN scores perturb the top-k),
    hence looser tolerances than the single-stage families."""
    net, params, stats = make_detector("faster_rcnn", 8, 64)
    cfg = TrainConfig()
    _, step32 = make_family_train_step(net, cfg, dtype=None)
    _, step16 = make_family_train_step(net, cfg, dtype=jnp.bfloat16)
    images, targets, valid = _batch(2, 64)
    key = jax.random.PRNGKey(0)

    def run(step):
        from edgeml_tpu.models.engine import make_optimizer

        opt = make_optimizer(cfg)
        opt_state = opt.init(params)
        return step(params, stats, opt_state, images, targets, valid, 0.01, key)

    p32, _, _, loss32, _ = run(step32)
    p16, _, _, loss16, _ = run(step16)
    loss32, loss16 = float(loss32), float(loss16)
    assert np.isfinite(loss16)
    assert loss16 == pytest.approx(loss32, rel=0.05), (loss32, loss16)
    assert _leaf_dtypes(p16) == {"float32"}  # master weights stay f32
    n32 = np.sqrt(sum(
        float(((np.asarray(a - b)) ** 2).sum())
        for a, b in zip(jax.tree_util.tree_leaves(p32),
                        jax.tree_util.tree_leaves(params))))
    n16 = np.sqrt(sum(
        float(((np.asarray(a - b)) ** 2).sum())
        for a, b in zip(jax.tree_util.tree_leaves(p16),
                        jax.tree_util.tree_leaves(params))))
    assert n32 > 0 and n16 > 0
    assert n16 == pytest.approx(n32, rel=0.5), (n32, n16)


def test_amp_cast_keeps_frozen_stats_f32():
    net, params, _ = make_detector("retinanet", 8, 64)
    cast = amp_cast(params, jnp.bfloat16)

    def walk(path, a):
        name = getattr(path[-1], "key", getattr(path[-1], "name", None))
        if getattr(a, "dtype", None) is None:
            return
        if name in ("m", "v"):
            assert a.dtype == jnp.float32, path
        elif name == "w":
            assert a.dtype == jnp.bfloat16, path

    jax.tree_util.tree_map_with_path(walk, cast)


def test_bn_apply_mixed_precision_contract():
    """bf16 input -> bf16 output, but batch/running stats computed in f32."""
    from edgeml_tpu.models.common import bn_apply

    rng = np.random.default_rng(0)
    x = rng.random((4, 6, 6, 8)).astype(np.float32) * 3
    p = {
        "scale": jnp.ones((8,)),
        "bias": jnp.zeros((8,)),
        "mean": jnp.zeros((8,)),
        "var": jnp.ones((8,)),
    }
    y16, new16 = bn_apply(
        jnp.asarray(x, jnp.bfloat16), p, eps=1e-3, momentum=0.03, train=True
    )
    y32, new32 = bn_apply(
        jnp.asarray(x), p, eps=1e-3, momentum=0.03, train=True
    )
    assert y16.dtype == jnp.bfloat16 and y32.dtype == jnp.float32
    assert new16["mean"].dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(new16["mean"]), np.asarray(new32["mean"]), rtol=1e-2
    )
    np.testing.assert_allclose(
        np.asarray(y16, np.float32), np.asarray(y32), atol=0.05
    )

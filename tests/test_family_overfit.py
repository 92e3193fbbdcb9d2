"""Per-family overfit-convergence tests for the torchvision-family trainers.

The reference's PRIMARY trainer is the torchvision-family loop
(/root/reference/torch_models/train.py:120-139 over SSDLite / RetinaNet /
Faster R-CNN); the YOLO overfit test (test_detector_pipeline.py
test_loss_decreases_on_overfit) covered only the YOLO step. These drive
make_family_train_step (models/engine.py:66) for each anchor family on a
tiny fixed batch and require the loss to fall — the convergence smoke the
loss unit tests and CLI smokes don't give.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from edgeml_tpu.models.engine import make_family_train_step
from edgeml_tpu.models.train import TrainConfig, pad_targets


def _targets(b, max_t=4):
    rows = [np.array([[1, 0.5, 0.5, 0.4, 0.4],
                      [2, 0.25, 0.3, 0.2, 0.3]], np.float32)] * b
    t, v = pad_targets(rows, max_t)
    return jnp.asarray(t), jnp.asarray(v)


def _overfit(net, stats, steps=10, lr=0.003, b=2, seed=1):
    params = net.init(jax.random.PRNGKey(0))
    if isinstance(params, tuple):  # (params, stats) families
        params, stats = params
    cfg = TrainConfig(opt="sgd", lr=lr)
    opt, step = make_family_train_step(net, cfg)
    opt_state = opt.init(params)
    rng = np.random.default_rng(seed)
    size = net.image_size
    images = jnp.asarray(rng.random((b, size, size, 3)), jnp.float32)
    targets, valid = _targets(b)
    key = jax.random.PRNGKey(7)  # FIXED key: deterministic loss landscape
    losses = []
    for _ in range(steps):
        params, stats, opt_state, loss, _ = step(
            params, stats, opt_state, images, targets, valid, lr, key
        )
        losses.append(float(loss))
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0], losses
    return losses


def test_ssdlite_overfit():
    from edgeml_tpu.models.ssdlite import SSDLite

    net = SSDLite(num_classes=8, image_size=64)
    params, stats = net.init(jax.random.PRNGKey(0))
    _overfit(net, stats)


def test_retinanet_overfit():
    from edgeml_tpu.models.retinanet import RetinaNet

    net = RetinaNet(num_classes=7, image_size=256)
    _overfit(net, None, steps=8, lr=0.001)


def test_faster_rcnn_overfit():
    from edgeml_tpu.models.faster_rcnn import FasterRCNN

    net = FasterRCNN(num_classes=6, image_size=256, rpn_post_nms=64,
                     detections_per_img=16)
    _overfit(net, None, steps=8, lr=0.001)

"""RetinaNet-ResNet50-FPN: backbone shapes, anchors, matcher, loss, postproc."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from edgeml_tpu.models.resnet import ResNet50FPN
from edgeml_tpu.models.retinanet import (
    RetinaNet, retina_anchors, retina_match, retina_loss, retina_postprocess,
)


def test_fpn_shapes():
    bb = ResNet50FPN(extra="p6p7")
    params = bb.init(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 256, 256, 3))
    feats = bb.apply(params, x)
    sizes = [f.shape[1] for f in feats]
    assert sizes == [32, 16, 8, 4, 2]  # strides 8..128
    assert all(f.shape[-1] == 256 for f in feats)


def test_fpn_maxpool_variant():
    bb = ResNet50FPN(extra="maxpool")
    params = bb.init(jax.random.PRNGKey(0))
    feats = bb.apply(params, jnp.zeros((1, 256, 256, 3)))
    assert [f.shape[1] for f in feats] == [32, 16, 8, 4]


def test_anchor_grid():
    a = retina_anchors(256)
    want = sum(9 * (-(-256 // s)) ** 2 for s in (8, 16, 32, 64, 128))
    assert a.shape == (want, 4)
    # first anchor: P3 cell (0,0), size 32, torchvision ratio h/w = 0.5
    w = a[0, 2] - a[0, 0]
    h = a[0, 3] - a[0, 1]
    assert w * h == pytest.approx(32 * 32, rel=1e-4)
    assert h / w == pytest.approx(0.5, rel=1e-4)


def test_matcher_ignore_band():
    anchors = jnp.asarray([[0, 0, 10, 10], [0, 0, 20, 10], [50, 50, 60, 60]], jnp.float32)
    gt = jnp.asarray([[0, 0, 10, 14]], jnp.float32)  # IoU: 0.714, 0.417, 0
    m = np.asarray(retina_match(anchors, gt, jnp.asarray([True])))
    assert m[0] == 0  # above hi
    assert m[1] == -2  # ignore band
    assert m[2] == -1  # background


@pytest.mark.slow
def test_retina_forward_loss_postprocess():
    net = RetinaNet(num_classes=7, image_size=256)
    params = net.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 256, 256, 3))
    cls, reg = jax.jit(net.apply)(params, x)
    anchors = jnp.asarray(retina_anchors(256))
    assert cls.shape == (1, anchors.shape[0], 7)
    assert reg.shape == (1, anchors.shape[0], 4)

    gt_boxes = jnp.asarray([[[30, 30, 120, 120]]], jnp.float32)
    gt_cls = jnp.asarray([[3]])
    gt_valid = jnp.ones((1, 1), bool)
    total, parts = retina_loss(net, cls, reg, anchors, gt_boxes, gt_cls, gt_valid)
    assert np.isfinite(float(total))
    # with prior bias, initial focal loss should be small-ish but positive
    assert float(parts["classification"]) > 0

    dets, valid = retina_postprocess(net, cls, reg, anchors, max_det=16)
    assert dets.shape == (1, 16, 6)
    assert np.isfinite(np.asarray(dets)).all()

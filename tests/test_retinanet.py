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


def test_retina_raw_tail_bit_exact():
    """RETINA_RAW prefilter-first tail vs the dense sigmoid/decode-
    everything path: BIT-identical detections in f32; from bf16 head
    outputs, selection/scores/classes stay bit-identical and box
    coordinates may drift ~1 f32 ulp (XLA fuses the bf16->f32 convert into
    the decode arithmetic differently for full-matrix vs gathered-row
    consumers — the same consumer-dependent-rounding contract as the YOLO
    bf16 raw tail, ops/nms_raw.py). The ranking argument: sigmoid(rowmax)
    is bit-equal to max(sigmoid) (monotone + rounding preserves order),
    ranked with the same chunked topk1d."""
    import edgeml_tpu.models.retinanet as rn

    rng = np.random.default_rng(3)
    a, c = 4096, 7
    net = RetinaNet(num_classes=c, image_size=256)
    anchors = jnp.asarray(
        np.sort(rng.uniform(0, 256, (a, 2, 2)), axis=1).reshape(a, 4)[
            :, [0, 2, 1, 3]
        ].astype(np.float32)
    )
    for dt in (jnp.float32, jnp.bfloat16):
        cls = jnp.asarray(rng.normal(-4, 2, (2, a, c)).astype(np.float32))
        reg = jnp.asarray(rng.normal(0, 0.2, (2, a, 4)).astype(np.float32))
        cls, reg = cls.astype(dt), reg.astype(dt)
        assert rn.RETINA_RAW and a > rn.RETINA_PRE
        d1, v1 = retina_postprocess(net, cls, reg, anchors, max_det=32)
        rn.RETINA_RAW = False
        retina_postprocess.clear_cache()
        try:
            d0, v0 = retina_postprocess(net, cls, reg, anchors, max_det=32)
        finally:
            rn.RETINA_RAW = True
            retina_postprocess.clear_cache()
        d1, d0 = np.asarray(d1), np.asarray(d0)
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v0))
        np.testing.assert_array_equal(d1[..., 4:], d0[..., 4:])  # score, cls
        if dt == jnp.float32:
            np.testing.assert_array_equal(d1, d0)
        else:
            np.testing.assert_allclose(d1[..., :4], d0[..., :4], rtol=1e-5)

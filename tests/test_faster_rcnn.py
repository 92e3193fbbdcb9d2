"""Faster R-CNN: RPN anchors, RoIAlign, proposal flow, end-to-end detect."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from edgeml_tpu.models.faster_rcnn import (
    FasterRCNN, roi_align_fpn, rpn_anchors, _decode, _encode,
)


def test_rpn_anchor_levels():
    anc = rpn_anchors(256)
    assert len(anc) == 5
    # 3 anchors per cell, bottom level = P2 (stride 4)
    assert anc[0].shape == ((256 // 4) ** 2 * 3, 4)
    w = anc[0][1, 2] - anc[0][1, 0]
    h = anc[0][1, 3] - anc[0][1, 1]
    assert w * h == pytest.approx(32 * 32, rel=1e-3)


def test_box_coder_roundtrip():
    rng = np.random.default_rng(0)
    anchors = jnp.asarray(
        np.concatenate(
            [rng.uniform(0, 100, (20, 2)), rng.uniform(120, 250, (20, 2))], 1
        ).astype(np.float32)
    )
    gt = jnp.asarray(
        np.concatenate(
            [rng.uniform(0, 100, (20, 2)), rng.uniform(120, 250, (20, 2))], 1
        ).astype(np.float32)
    )
    for w in ((1.0, 1.0, 1.0, 1.0), (10.0, 10.0, 5.0, 5.0)):
        enc = _encode(gt, anchors, w)
        dec = _decode(enc, anchors, w)
        assert np.allclose(np.asarray(dec), np.asarray(gt), atol=1e-2)


def test_roi_align_constant_map():
    # constant feature maps -> pooled output equals the constant
    feats = [jnp.full((256 // s, 256 // s, 8), float(i + 1))
             for i, s in enumerate((4, 8, 16, 32))]
    boxes = jnp.asarray(
        [[10, 10, 40, 40],      # small -> level 0 (stride 4)
         [0, 0, 250, 250]],     # large -> higher level
        jnp.float32,
    )
    pooled = roi_align_fpn(feats, boxes, 256)
    assert pooled.shape == (2, 7, 7, 8)
    assert np.allclose(np.asarray(pooled[0]), 1.0, atol=1e-5)
    v = float(np.asarray(pooled[1]).mean())
    assert v > 1.0  # mapped to a deeper level


def test_roi_align_bilinear_values():
    # Linear ramp along x on the stride-4 level: pooled values follow the ramp.
    H = 64
    x = jnp.broadcast_to(jnp.arange(H, dtype=jnp.float32)[None, :, None], (H, H, 1))
    feats = [x, jnp.zeros((32, 32, 1)), jnp.zeros((16, 16, 1)), jnp.zeros((8, 8, 1))]
    boxes = jnp.asarray([[80.0, 80.0, 120.0, 120.0]])  # feature coords 20..30
    pooled = np.asarray(roi_align_fpn(feats, boxes, 256))[0, :, :, 0]
    assert pooled[0, 0] < pooled[0, -1]
    assert pooled[:, 0].std() < 1e-4  # constant along y


@pytest.mark.slow
def test_detect_end_to_end_smoke():
    net = FasterRCNN(num_classes=6, image_size=256, rpn_post_nms=64,
                     detections_per_img=16)
    params = net.init(jax.random.PRNGKey(0))
    anchors = [jnp.asarray(a) for a in rpn_anchors(256)]
    images = jax.random.uniform(jax.random.PRNGKey(1), (1, 256, 256, 3))
    dets, valid = net.detect(params, images, anchors)
    assert dets.shape == (1, 16, 6)
    assert np.isfinite(np.asarray(dets)).all()
    d = np.asarray(dets[0])
    v = np.asarray(valid[0])
    if v.any():
        assert (d[v][:, :4] >= 0).all() and (d[v][:, :4] <= 256).all()
        assert (d[v][:, 5] >= 1).all()

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


def test_roi_align_patch_matches_corner():
    """The patch gather layout (ROI_GATHER="patch", one (2,2,C) slice per
    sample point) must match the four-corner gather form to float noise
    (<=2 ulp from XLA fusion reassociation — faster_rcnn.ROI_GATHER doc),
    including edge-hugging boxes (the shifted-corner clamp algebra) and
    zero-padded proposal rows (finite output)."""
    import edgeml_tpu.models.faster_rcnn as fr

    rng = np.random.default_rng(7)
    feats = [jnp.asarray(rng.standard_normal((s, s, 16)).astype(np.float32))
             for s in (160, 80, 40, 20)]
    n = 73
    c = rng.uniform(0, 640, (n, 2))
    wh = np.exp(rng.uniform(np.log(4), np.log(600), (n, 2)))
    b = np.concatenate(
        [np.maximum(c - wh / 2, 0), np.minimum(c + wh / 2, 640)], 1
    ).astype(np.float32)
    b[-3:] = 0.0                     # pad rows
    b[0] = [600, 600, 640, 640]      # edge-hugging (clamped corners)
    boxes = jnp.asarray(b)
    prev = fr.ROI_GATHER
    try:
        fr.ROI_GATHER = "corner"
        want = np.asarray(roi_align_fpn(feats, boxes, 640))
        fr.ROI_GATHER = "patch"
        got = np.asarray(roi_align_fpn(feats, boxes, 640))
    finally:
        fr.ROI_GATHER = prev
    assert np.isfinite(got).all()
    assert np.allclose(want[:-3], got[:-3], atol=1e-6, rtol=0)


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


@pytest.mark.parametrize("mode", ["fused", "pair"])
def test_roi_align_fused_matches_patch(mode):
    """ROI_GATHER="fused" / "pair" gather the SAME cells as "patch"
    (through a row-flattened / row-paired pyramid view) and apply the
    identical weighting expression — outputs must match bitwise."""
    import edgeml_tpu.models.faster_rcnn as fr

    rng = np.random.default_rng(11)
    feats = [jnp.asarray(rng.standard_normal((s, s, 16)).astype(np.float32))
             for s in (160, 80, 40, 20)]
    n = 41
    c = rng.uniform(0, 640, (n, 2))
    wh = np.exp(rng.uniform(np.log(4), np.log(600), (n, 2)))
    b = np.concatenate(
        [np.maximum(c - wh / 2, 0), np.minimum(c + wh / 2, 640)], 1
    ).astype(np.float32)
    b[-2:] = 0.0                     # pad rows
    b[0] = [600, 600, 640, 640]      # edge-hugging (clamped corners)
    boxes = jnp.asarray(b)
    prev = fr.ROI_GATHER
    try:
        fr.ROI_GATHER = "patch"
        want = np.asarray(roi_align_fpn(feats, boxes, 640))
        fr.ROI_GATHER = mode
        got = np.asarray(roi_align_fpn(feats, boxes, 640))
    finally:
        fr.ROI_GATHER = prev
    assert np.isfinite(got).all()
    np.testing.assert_array_equal(want, got)


def test_roi_pyr_bf16_close():
    """ROI_PYR="bf16" stores the read-only pyramid in bfloat16 (bandwidth
    knob). Pooled features must stay within bf16 rounding of the f32
    pyramid (weights/decode stay f32) — the documented divergence bound."""
    import edgeml_tpu.models.faster_rcnn as fr

    rng = np.random.default_rng(13)
    feats = [jnp.asarray(rng.standard_normal((s, s, 16)).astype(np.float32))
             for s in (160, 80, 40, 20)]
    n = 32
    c = rng.uniform(0, 640, (n, 2))
    wh = np.exp(rng.uniform(np.log(8), np.log(500), (n, 2)))
    b = np.concatenate(
        [np.maximum(c - wh / 2, 0), np.minimum(c + wh / 2, 640)], 1
    ).astype(np.float32)
    boxes = jnp.asarray(b)
    want = np.asarray(roi_align_fpn(feats, boxes, 640))
    got = np.asarray(
        roi_align_fpn(feats, boxes, 640, pyr_dtype=jnp.bfloat16)
    )
    # ROI_W16 (default on) keeps the whole weighting in bf16; the head
    # upcasts after pooling (run_box_head). bf16 has ~2^-8 relative
    # precision; bilinear averaging cannot amplify.
    got = got.astype(np.float32)
    np.testing.assert_allclose(got, want, rtol=0, atol=4e-2)
    assert np.abs(got - want).max() > 0  # the knob actually changed values

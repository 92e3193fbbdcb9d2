"""SSDLite-MobileNetV3: shapes, anchors, matcher, loss, postprocess."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from edgeml_tpu.models.ssdlite import SSDLite, default_boxes
from edgeml_tpu.models.ssd_loss import match_anchors, ssd_loss, ssd_postprocess


@pytest.fixture(scope="module")
def small_ssd():
    net = SSDLite(num_classes=5, image_size=320)
    params, stats = net.init(jax.random.PRNGKey(0))
    return net, params, stats


def test_anchor_count_and_geometry():
    a = default_boxes(320)
    want = sum(f * f * 6 for f in (20, 10, 5, 3, 2, 1))
    assert a.shape == (want, 4)
    # first cell of the first level: center (0.5/20, 0.5/20)*320 = (8, 8)
    cx = (a[0, 0] + a[0, 2]) / 2
    cy = (a[0, 1] + a[0, 3]) / 2
    assert cx == pytest.approx(8.0) and cy == pytest.approx(8.0)
    # first box is the s=0.2 square
    assert (a[0, 2] - a[0, 0]) == pytest.approx(0.2 * 320)
    # third box has aspect ratio 2
    w = a[2, 2] - a[2, 0]
    h = a[2, 3] - a[2, 1]
    assert w / h == pytest.approx(2.0, rel=1e-4)


def test_forward_shapes(small_ssd):
    net, params, stats = small_ssd
    x = jnp.zeros((1, 320, 320, 3))
    (cls, reg), _ = net.apply(params, stats, x)
    a = default_boxes(320).shape[0]
    assert cls.shape == (1, a, 5)
    assert reg.shape == (1, a, 4)


def test_box_coder_roundtrip(small_ssd):
    net, _, _ = small_ssd
    rng = np.random.default_rng(0)
    anchors = jnp.asarray(default_boxes(320)[:50])
    gt = jnp.asarray(
        np.concatenate(
            [rng.uniform(0, 150, (50, 2)), rng.uniform(160, 310, (50, 2))], axis=1
        ).astype(np.float32)
    )
    enc = net.encode_boxes(gt, anchors)
    dec = net.decode_boxes(enc, anchors)
    assert np.allclose(np.asarray(dec), np.asarray(gt), atol=1e-2)


def test_matcher_forces_best_anchor():
    anchors = jnp.asarray(
        [[0, 0, 10, 10], [20, 20, 40, 40], [100, 100, 200, 200]], jnp.float32
    )
    # GT overlaps anchor 2 weakly (IoU < 0.5) but must still be matched to it.
    gt = jnp.asarray([[150, 150, 400, 400]], jnp.float32)
    m = match_anchors(anchors, gt, jnp.asarray([True]))
    assert int(m[2]) == 0
    assert int(m[0]) == -1 and int(m[1]) == -1


def test_loss_decreases(small_ssd):
    net, params, stats = small_ssd
    import optax

    anchors = jnp.asarray(default_boxes(320))
    rng = np.random.default_rng(1)
    images = jnp.asarray(rng.random((2, 320, 320, 3)), jnp.float32)
    gt_boxes = jnp.asarray([[[40, 40, 140, 140]], [[180, 180, 300, 280]]], jnp.float32)
    gt_cls = jnp.asarray([[2], [3]])
    gt_valid = jnp.ones((2, 1), bool)

    opt = optax.sgd(1e-3, momentum=0.9)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, stats, opt_state):
        def loss_fn(p):
            (cls, reg), ns = net.apply(p, stats, images, train=True)
            total, parts = ssd_loss(net, cls, reg, anchors, gt_boxes, gt_cls, gt_valid)
            return total, ns

        (loss, ns), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, ns, opt_state, loss

    losses = []
    for _ in range(6):
        params, stats, opt_state, loss = step(params, stats, opt_state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_postprocess_basic(small_ssd):
    net, _, _ = small_ssd
    anchors = jnp.asarray(default_boxes(320))
    a = anchors.shape[0]
    # craft logits: anchor 0 strongly class 2, everything else background
    cls = np.full((1, a, 5), 0.0, np.float32)
    cls[:, :, 0] = 5.0
    cls[0, 0, 0] = 0.0
    cls[0, 0, 2] = 8.0
    reg = np.zeros((1, a, 4), np.float32)
    dets, valid = ssd_postprocess(
        net, jnp.asarray(cls), jnp.asarray(reg), anchors,
        score_thresh=0.5, nms_thresh=0.55, max_det=10,
    )
    v = np.asarray(valid[0])
    d = np.asarray(dets[0])[v]
    assert len(d) == 1
    assert d[0, 5] == 2  # class id in the model's (background-inclusive) space
    # box equals the anchor (zero deltas), clipped to the image
    want = np.clip(np.asarray(anchors[0]), 0.0, 320.0)
    assert np.allclose(d[0, :4], want, atol=1e-3)


def test_detect_generic_bf16_knob():
    """_detect_generic(dtype=bf16) for the backbone-bound families: runs,
    returns normalized rows close to the f32 path."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from edgeml_tpu.models.infer import _detect_generic
    from edgeml_tpu.models.ssdlite import SSDLite

    net = SSDLite(num_classes=11)
    params, stats = net.init(jax.random.PRNGKey(0))
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (2, 320, 320, 3))
    d32, v32 = _detect_generic(net, params, stats, imgs, 0.05, 0.5)
    d16, v16 = _detect_generic(net, params, stats, imgs, 0.05, 0.5,
                               dtype=jnp.bfloat16)
    assert d16.shape == d32.shape and v16.shape == v32.shape
    assert np.asarray(v16).sum() > 0
    # same coordinate contract, loosely tracking the f32 detections
    assert np.asarray(d16)[..., 1:5].max() <= 1.0 + 1e-6
    assert np.isfinite(np.asarray(d16)).all()

"""SSDLite int8 PTQ (models/quant_ssd.py): structure, drift, serving."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from edgeml_tpu.models.quant_ssd import Q8SSD, prepare_int8_ssd, q8_ssd_apply
from edgeml_tpu.models.ssdlite import SSDLite


@pytest.fixture(scope="module")
def small_ssd():
    net = SSDLite(num_classes=8, image_size=64)
    params, stats = net.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(5)

    def images(i):
        return jnp.asarray(rng.random((2, 64, 64, 3)), jnp.float32)

    q8 = prepare_int8_ssd(net, params, stats, images, iters=2)
    return net, params, stats, q8


def test_q8_ssd_output_contract(small_ssd):
    net, params, stats, q8 = small_ssd
    x = jnp.asarray(np.random.default_rng(9).random((2, 64, 64, 3)),
                    jnp.float32)
    (cls_f, reg_f), _ = net.apply(params, stats, x, train=False)
    cls_q, reg_q = q8.apply(x)
    assert cls_q.shape == cls_f.shape and reg_q.shape == reg_f.shape
    assert cls_q.dtype == jnp.float32 and reg_q.dtype == jnp.float32
    # int8 drift is a measured knob, not a contract — but the quantized
    # logits must track the float ones closely on the calibration regime
    cf, cq = np.asarray(cls_f), np.asarray(cls_q)
    denom = max(1e-6, float(np.abs(cf).max()))
    rel = float(np.abs(cf - cq).max()) / denom
    assert rel < 0.15, f"cls logit drift {rel}"
    corr = np.corrcoef(cf.ravel(), cq.ravel())[0, 1]
    assert corr > 0.99, corr


def test_q8_ssd_tree_functional(small_ssd):
    """q8_ssd_apply over the plain pytree (the jitted-serving entry) matches
    the bundle's method bitwise, under jit."""
    net, params, stats, q8 = small_ssd
    x = jnp.asarray(np.random.default_rng(3).random((2, 64, 64, 3)),
                    jnp.float32)
    # Both sides arg-passing + jitted: the bundle method bakes weights in
    # as XLA constants, and constant-folding vs runtime args can flip int8
    # requant boundary values — program-identity, not bit-identity, is the
    # contract here.
    a = jax.jit(
        lambda tree, xi: Q8SSD(net, tree["qparams"], tree["se"],
                               tree["scales"]).apply(xi)
    )(q8.tree, x)
    f = jax.jit(lambda tree, xi: q8_ssd_apply(net, tree, xi))(q8.tree, x)
    for u, v in zip(a, f):
        np.testing.assert_array_equal(np.asarray(u), np.asarray(v))


def test_q8_ssd_postprocess_pipeline(small_ssd):
    """Full int8 serving tail: quantized logits through ssd_postprocess
    (score softmax, NMS) — finite detections, plausible count."""
    from edgeml_tpu.models.ssd_loss import ssd_postprocess
    from edgeml_tpu.models.ssdlite import default_boxes

    net, params, stats, q8 = small_ssd
    x = jnp.asarray(np.random.default_rng(4).random((2, 64, 64, 3)),
                    jnp.float32)
    cls_q, reg_q = q8.apply(x)
    anchors = jnp.asarray(default_boxes(net.image_size, net.feature_sizes))
    dets, valid = ssd_postprocess(net, cls_q, reg_q, anchors,
                                  score_thresh=0.01, nms_thresh=0.55)
    assert np.isfinite(np.asarray(dets)).all()


@pytest.fixture(scope="module")
def trained_ssd():
    """Overfit a tiny SSDLite on drawable synthetic data (class-colored
    rectangles — boxes recoverable from pixels) until it genuinely
    detects, so the PTQ mAP delta is measured on a real detector (the
    test_recipe_e2e::test_int8_ptq_map_delta protocol, SSD edition)."""
    from edgeml_tpu.models.engine import make_family_train_step
    from edgeml_tpu.models.train import TrainConfig, pad_targets

    size, n_img = 64, 16
    colors = {1: (0.95, 0.2, 0.1), 2: (0.1, 0.35, 0.95)}  # ids 1.. (0 = bg)
    rng = np.random.default_rng(3)
    images, gt_rows = [], []
    for _ in range(n_img):
        img = rng.random((size, size, 3)).astype(np.float32) * 0.15
        rows = []
        for _ in range(2):
            c = int(rng.integers(1, 3))
            w, h = rng.uniform(0.3, 0.5, 2)
            x = rng.uniform(w / 2 + 0.02, 1 - w / 2 - 0.02)
            y = rng.uniform(h / 2 + 0.02, 1 - h / 2 - 0.02)
            img[int((y - h / 2) * size):int((y + h / 2) * size),
                int((x - w / 2) * size):int((x + w / 2) * size)] = colors[c]
            rows.append((c, x, y, w, h))
        images.append(img)
        gt_rows.append(np.array(rows, np.float32))

    net = SSDLite(num_classes=3, image_size=size)
    params, stats = net.init(jax.random.PRNGKey(0))
    lr0 = 0.02
    opt, step = make_family_train_step(net, TrainConfig(opt="sgd", lr=lr0))
    opt_state = opt.init(params)
    # training targets are 0-BASED (the YOLO-format convention —
    # engine._to_xyxy_px shifts them to the SSD 1-based space); the eval
    # gt_rows stay 1-based to match ssd_postprocess's detection ids.
    t, v = pad_targets([r - np.array([1, 0, 0, 0, 0], np.float32)
                        for r in gt_rows], 4)
    t, v = jnp.asarray(t), jnp.asarray(v)
    # train on the SERVING preprocessing (ImageNet normalize — what the
    # family train CLI feeds and engine.evaluate applies internally)
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    x = jnp.asarray((np.stack(images) - mean) / std)
    key = jax.random.PRNGKey(1)
    for i in range(200):
        lr = lr0 if i < 150 else lr0 / 5
        params, stats, opt_state, loss, _ = step(
            params, stats, opt_state, x, t, v, lr, key)
    assert np.isfinite(float(loss))
    return net, params, stats, images, gt_rows


def test_int8_ptq_map_delta_ssd(trained_ssd):
    """The int8 PTQ accuracy number a --int8 ssd user needs: dataset mAP of
    the quantized SSDLite vs the f32 path on a model that genuinely
    detects, with a stated bound on the drop."""
    from edgeml_tpu.models.engine import evaluate
    from edgeml_tpu.models.quant_ssd import prepare_int8_ssd

    net, params, stats, images, gt_rows = trained_ssd
    f32_sum = evaluate(net, params, stats, images, gt_rows, batch_size=4,
                       conf_thres=0.05)
    f32_map50 = float(f32_sum["map50"])
    assert f32_map50 > 0.05, f"precondition: model does not detect ({f32_map50})"

    # calibrate on the serving distribution (resized+normalized — evaluate
    # normalizes internally; here images are already square so the resize
    # is identity and we replicate the normalize)
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    calib = jnp.asarray((np.stack(images[:8]) - mean) / std)
    q8 = prepare_int8_ssd(net, params, stats, lambda i: calib, iters=1).tree
    int8_sum = evaluate(net, params, stats, images, gt_rows, batch_size=4,
                        conf_thres=0.05, q8=q8)
    int8_map50 = float(int8_sum["map50"])
    drop = f32_map50 - int8_map50
    assert int8_map50 >= 0.8 * f32_map50 and drop <= 0.1, (
        f"int8 PTQ mAP@.5 {int8_map50:.4f} vs f32 {f32_map50:.4f} "
        f"(drop {drop:.4f})"
    )

"""Raw-logit serving tail (ops/nms_raw.py + YoloV5.predict_raw): the
bit-identity contract vs the decoded path, end to end.

The raw tail's whole claim is "same ops on the same values, applied to
fewer of them" — so every test here asserts EXACT equality (not closeness)
against the decoded path, for both serving dtypes, through every entry
point: decode_full materialization, the batched NMS (flag and cond
fallbacks, certificate flags included), the forced-fallback regime, and
the full run_detection pipeline with its zero carry and flush step."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from edgeml_tpu.models.yolov5 import YoloV5
from edgeml_tpu.ops import nms as nms_mod
from edgeml_tpu.ops.nms import nms_split_batch
from edgeml_tpu.ops.nms_raw import decode_full, nms_split_batch_raw

IMG = 64


@pytest.fixture(scope="module")
def small_net():
    net = YoloV5(variant="n", num_classes=80, img_size=IMG)
    params, stats = net.init(jax.random.PRNGKey(0))
    return net, params, stats


def _images(b=4, seed=5):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.random((b, IMG, IMG, 3), np.float32))


@pytest.mark.parametrize("dtype", [None, jnp.bfloat16])
def test_decode_full_matches_predict(small_net, dtype):
    """decode_full(geo, predict_raw(x)) == predict(x) bitwise: the raw path
    defers sigmoid/bias/decode but must reproduce the decoded view exactly
    (same casts, same op order — yolov5.predict_raw docstring)."""
    net, params, stats = small_net
    imgs = _images()
    raw = net.predict_raw(params, stats, imgs, dtype=dtype)
    geo = net.raw_geometry(params)
    obj_r, xywh_r, cls_r = decode_full(geo, raw)
    obj, xywh, cls = net.predict(params, stats, imgs, dtype=dtype)
    np.testing.assert_array_equal(np.asarray(obj_r), np.asarray(obj))
    np.testing.assert_array_equal(np.asarray(xywh_r), np.asarray(xywh))
    np.testing.assert_array_equal(np.asarray(cls_r), np.asarray(cls))
    # the trunk-side score is the decoded path's best-pair confidence
    best = jnp.max(cls, axis=-1) * obj
    np.testing.assert_array_equal(np.asarray(raw[0]), np.asarray(best))


@pytest.mark.parametrize("dtype", [None, jnp.bfloat16])
@pytest.mark.parametrize("fallback", ["flag", "cond"])
def test_nms_raw_matches_decoded(small_net, dtype, fallback):
    net, params, stats = small_net
    imgs = _images()
    raw = net.predict_raw(params, stats, imgs, dtype=dtype)
    geo = net.raw_geometry(params)
    dec = net.predict(params, stats, imgs, dtype=dtype)
    kw = dict(conf_thres=1e-4, iou_thres=0.5, max_det=64, max_cand=256)
    out_r = nms_split_batch_raw(*raw, geo, fallback=fallback, **kw)
    out_d = nms_split_batch(*dec, fallback=fallback, **kw)
    np.testing.assert_array_equal(np.asarray(out_r[0]), np.asarray(out_d[0]))
    np.testing.assert_array_equal(np.asarray(out_r[1]), np.asarray(out_d[1]))
    if fallback == "flag":
        # the exactness certificates see identical values -> identical flag
        assert bool(out_r[2]) == bool(out_d[2])
    assert np.asarray(out_r[1]).any(), "degenerate case: no detections"


@pytest.mark.parametrize("dtype", [None, jnp.bfloat16])
def test_nms_raw_forced_fallback_regime(small_net, dtype):
    """Starved pool constants (G=2/B1=1/T=1): the raw path must report the
    SAME certificate verdict as the decoded path, the cond fallback must
    land in the same exact ranking, and whenever the certificate claims
    exactness the fast result must actually equal the pool=False exact one
    (soundness). In the f32/value-ranked regime the strict hidden-row rule
    provably fails here (random-init outputs spread the top pairs over ~14
    boxes); in the bf16/keyed regime the tie-tolerant rule can legitimately
    hold — the soundness check is the meaningful assertion there."""
    net, params, stats = small_net
    imgs = _images(seed=11)
    raw = net.predict_raw(params, stats, imgs, dtype=dtype)
    geo = net.raw_geometry(params)
    dec = net.predict(params, stats, imgs, dtype=dtype)
    kw = dict(conf_thres=1e-4, iou_thres=0.5, max_det=32, max_cand=128)
    saved = nms_mod.PAIR_G, nms_mod.PAIR_B1, nms_mod.PAIR_T
    nms_mod.PAIR_G, nms_mod.PAIR_B1, nms_mod.PAIR_T = 2, 1, 1
    nms_split_batch.clear_cache()
    nms_split_batch_raw.clear_cache()
    try:
        d_r, v_r, ok_r = nms_split_batch_raw(*raw, geo, fallback="flag", **kw)
        d_d, v_d, ok_d = nms_split_batch(*dec, fallback="flag", **kw)
        assert bool(ok_r) == bool(ok_d)
        if dtype is None:
            assert not bool(ok_r), "starved f32 certificate must fail"
        exact = nms_split_batch(*dec, fallback="cond", pool=False, **kw)
        if bool(ok_r):  # certificate soundness: claimed exact -> IS exact
            np.testing.assert_array_equal(np.asarray(d_r),
                                          np.asarray(exact[0]))
            np.testing.assert_array_equal(np.asarray(v_r),
                                          np.asarray(exact[1]))
        c_r = nms_split_batch_raw(*raw, geo, fallback="cond", **kw)
        c_d = nms_split_batch(*dec, fallback="cond", **kw)
    finally:
        nms_mod.PAIR_G, nms_mod.PAIR_B1, nms_mod.PAIR_T = saved
        nms_split_batch.clear_cache()
        nms_split_batch_raw.clear_cache()
    np.testing.assert_array_equal(np.asarray(c_r[0]), np.asarray(c_d[0]))
    np.testing.assert_array_equal(np.asarray(c_r[1]), np.asarray(c_d[1]))
    np.testing.assert_array_equal(np.asarray(c_d[0]), np.asarray(exact[0]))


@pytest.mark.parametrize("dtype", [None, jnp.bfloat16])
def test_run_detection_raw_tail_files_equal(small_net, tmp_path, dtype):
    """Full serving pipeline (run_detection: pipelined steps, zero carry,
    flush, letterbox unmap, host redo protocol) with RAW_TAIL on vs off:
    per-image output files bit-equal."""
    from edgeml_tpu.models import infer as infer_mod
    from edgeml_tpu.models.infer import run_detection

    net, params, stats = small_net
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(3)
    for i in range(5):  # odd count: exercises the padded last batch
        np.save(img_dir / f"im{i}.npy",
                rng.random((IMG, IMG, 3)).astype(np.float32))

    def clear():
        infer_mod._detect_pipe_step.clear_cache()
        infer_mod._detect_batch.clear_cache()

    assert not infer_mod.RAW_TAIL  # decoded tail is the current default
    out_a = tmp_path / "decoded"
    run_detection(net, params, stats, str(img_dir), str(out_a),
                  batch_size=2, conf_thres=1e-3, iou_thres=0.5,
                  img_size=IMG, dtype=dtype)
    infer_mod.RAW_TAIL = True
    clear()  # the flag is read at trace time
    try:
        out_b = tmp_path / "raw"
        run_detection(net, params, stats, str(img_dir), str(out_b),
                      batch_size=2, conf_thres=1e-3, iou_thres=0.5,
                      img_size=IMG, dtype=dtype)
    finally:
        infer_mod.RAW_TAIL = False
        clear()
    for i in range(5):
        a = np.load(out_a / f"im{i}.npy")
        b = np.load(out_b / f"im{i}.npy")
        np.testing.assert_array_equal(a, b)
    assert any(
        np.load(out_a / f"im{i}.npy").size for i in range(5)
    ), "degenerate case: no detections anywhere"

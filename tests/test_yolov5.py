"""YOLOv5 model: shapes, decode geometry, NMS semantics, weight import."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from edgeml_tpu.models.yolov5 import YoloV5, STRIDES
from edgeml_tpu.models.common import letterbox_batch
from edgeml_tpu.ops.nms import non_max_suppression


@pytest.fixture(scope="module")
def tiny_net():
    net = YoloV5(variant="n", num_classes=4, img_size=128)
    params, stats = net.init(jax.random.PRNGKey(0))
    return net, params, stats


def test_forward_shapes(tiny_net):
    net, params, stats = tiny_net
    x = jnp.zeros((2, 128, 128, 3))
    heads, new_stats, taps = net.apply(params, stats, x, taps=(9, 17, 20, 23))
    assert len(heads) == 3
    for h, s in zip(heads, STRIDES):
        g = 128 // s
        assert h.shape == (2, g, g, 3, 9)
    # tap channels: l9 SPPF out = 256*0.25, l17/20/23 = 64/128/256
    assert taps[9].shape[-1] == 256
    assert taps[17].shape[-1] == 64
    assert taps[20].shape[-1] == 128
    assert taps[23].shape[-1] == 256


def test_train_mode_updates_stats(tiny_net):
    net, params, stats = tiny_net
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 128, 128, 3))
    _, new_stats, _ = net.apply(params, stats, x, train=True)
    before = stats["l0"]["m"]
    after = new_stats["l0"]["m"]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_decode_geometry(tiny_net):
    net, params, stats = tiny_net
    # Construct a head tensor where logit 0 everywhere: sigmoid=0.5 ->
    # xy = (2*0.5 - 0.5 + cell)*stride = (cell + 0.5)*stride;
    # wh = (2*0.5)^2 * anchor = anchor.
    heads = [
        jnp.zeros((1, 128 // s, 128 // s, 3, 9)) for s in STRIDES
    ]
    pred = np.asarray(net.decode(heads))[0]
    g0 = 128 // STRIDES[0]
    # first row: level 0, cell (0, 0), anchor 0
    assert pred[0, 0] == pytest.approx(0.5 * STRIDES[0])
    assert pred[0, 1] == pytest.approx(0.5 * STRIDES[0])
    assert pred[0, 2:4] == pytest.approx(np.asarray(net.anchors[0][0]))
    # second anchor of the same cell
    assert pred[1, 2:4] == pytest.approx(np.asarray(net.anchors[0][1]))
    # second cell moves one stride in x
    assert pred[3, 0] == pytest.approx(1.5 * STRIDES[0])


def np_nms_oracle(boxes, scores, iou_thres):
    """Greedy NMS, straight-line NumPy."""
    order = np.argsort(-scores)
    keep = []
    alive = np.ones(len(scores), bool)
    for i in order:
        if not alive[i]:
            continue
        keep.append(i)
        x1 = np.maximum(boxes[i, 0], boxes[:, 0])
        y1 = np.maximum(boxes[i, 1], boxes[:, 1])
        x2 = np.minimum(boxes[i, 2], boxes[:, 2])
        y2 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.maximum(x2 - x1, 0) * np.maximum(y2 - y1, 0)
        a = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        b = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        iou = inter / (a + b - inter)
        alive &= iou <= iou_thres
    return keep


def test_nms_matches_oracle():
    rng = np.random.default_rng(3)
    n, nc = 64, 1
    xy = rng.uniform(100, 500, (n, 2))
    wh = rng.uniform(20, 120, (n, 2))
    obj = rng.uniform(0.1, 1.0, n)
    cls = np.ones((n, 1))
    pred = np.concatenate([xy, wh, obj[:, None], cls], axis=1).astype(np.float32)
    dets, valid = non_max_suppression(
        jnp.asarray(pred), conf_thres=0.2, iou_thres=0.5, max_det=32, max_cand=64
    )
    dets = np.asarray(dets)[np.asarray(valid)]
    # oracle
    half = wh / 2
    xyxy = np.concatenate([xy - half, xy + half], axis=1)
    mask = obj > 0.2
    keep = np_nms_oracle(xyxy[mask], obj[mask], 0.5)[:32]  # max_det cap
    want = xyxy[mask][keep]
    want_scores = obj[mask][keep]
    assert len(dets) == len(keep)
    assert np.allclose(dets[:, :4], want, atol=1e-3)
    assert np.allclose(dets[:, 4], want_scores, atol=1e-5)


def test_nms_class_aware():
    # Two identical boxes with different classes must BOTH survive.
    pred = np.array(
        [
            [100, 100, 50, 50, 0.9, 0.9, 0.05],
            [100, 100, 50, 50, 0.8, 0.05, 0.9],
        ],
        np.float32,
    )
    dets, valid = non_max_suppression(
        jnp.asarray(pred), conf_thres=0.25, iou_thres=0.5, max_det=8, max_cand=8,
        multi_label=False,
    )
    assert int(np.asarray(valid).sum()) == 2


def test_letterbox_geometry():
    img = np.ones((60, 120, 3), np.float32)
    out, meta = letterbox_batch([img], size=64)
    assert out.shape == (1, 64, 64, 3)
    r, dw, dh = meta[0]
    assert r == pytest.approx(64 / 120)
    assert dh == pytest.approx((64 - round(60 * r)) // 2)
    # padded rows are gray
    assert out[0, 0, 0, 0] == pytest.approx(114 / 255)


def test_weight_import_roundtrip(tiny_net):
    net, params, stats = tiny_net
    # Build a synthetic torch-style state_dict with the exact key layout and
    # OIHW shapes, then import and check a forward pass runs and matches a
    # direct construction.
    rng = np.random.default_rng(0)
    sd = {}

    def put_convbn(prefix, p):
        w = np.asarray(p["w"]).transpose(3, 2, 0, 1)
        sd[prefix + ".conv.weight"] = (0.05 * rng.normal(size=w.shape)).astype(np.float32)
        c = w.shape[0]
        sd[prefix + ".bn.weight"] = rng.normal(size=c).astype(np.float32)
        sd[prefix + ".bn.bias"] = rng.normal(size=c).astype(np.float32)
        sd[prefix + ".bn.running_mean"] = rng.normal(size=c).astype(np.float32)
        sd[prefix + ".bn.running_var"] = rng.uniform(0.5, 2, c).astype(np.float32)

    for idx, kind, _, kw in net.layers():
        pre = f"model.{idx}"
        if kind == "conv":
            put_convbn(pre, params[f"l{idx}"])
        elif kind == "c3":
            for cv in ("cv1", "cv2", "cv3"):
                put_convbn(f"{pre}.{cv}", params[f"l{idx}"][cv])
            for j, bp in enumerate(params[f"l{idx}"]["m"]):
                for cv in ("cv1", "cv2"):
                    put_convbn(f"{pre}.m.{j}.{cv}", bp[cv])
        elif kind == "sppf":
            put_convbn(f"{pre}.cv1", params[f"l{idx}"]["cv1"])
            put_convbn(f"{pre}.cv2", params[f"l{idx}"]["cv2"])
    for li, dp in enumerate(params["detect"]):
        w = np.asarray(dp["w"]).transpose(3, 2, 0, 1)
        sd[f"model.24.m.{li}.weight"] = rng.normal(size=w.shape).astype(np.float32)
        sd[f"model.24.m.{li}.bias"] = rng.normal(size=w.shape[0]).astype(np.float32)

    p2, s2 = net.params_from_torch_state_dict(sd)
    # spot-check OIHW -> HWIO mapping
    assert np.allclose(
        np.asarray(p2["l0"]["w"]),
        sd["model.0.conv.weight"].transpose(2, 3, 1, 0),
    )
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 128, 128, 3))
    heads, _, _ = net.apply(p2, s2, x)
    assert all(np.isfinite(np.asarray(h)).all() for h in heads)


def test_bn_fusion_equivalence(tiny_net):
    from edgeml_tpu.models.yolov5 import fuse_convbn

    net, params, stats = tiny_net
    # non-trivial BN statistics
    import jax as _jax

    x = _jax.random.normal(_jax.random.PRNGKey(5), (2, 128, 128, 3))
    _, stats2, _ = net.apply(params, stats, x, train=True)
    fused_p, fused_s = fuse_convbn(params, stats2)
    h1, _, _ = net.apply(params, stats2, x, train=False)
    h2, _, _ = net.apply(fused_p, fused_s, x, train=False)
    for a, b in zip(h1, h2):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_predict_split_matches_packed_decode():
    """The serving path (predict + nms_split) must reproduce the packed path
    (apply + decode + non_max_suppression): split head convs are the same
    weights with output channels regrouped, and the two-stage candidate
    selection is identical."""
    net = YoloV5(variant="n", num_classes=8, img_size=64)
    params, stats = net.init(jax.random.PRNGKey(3))
    x = jax.random.uniform(jax.random.PRNGKey(4), (2, 64, 64, 3))

    heads, _, _ = net.apply(params, stats, x, train=False)
    pred = net.decode(heads)
    obj, xywh, cls = net.predict(params, stats, x)

    # component parity vs the packed tensor
    np.testing.assert_allclose(np.asarray(pred[..., 4]), np.asarray(obj), atol=2e-6)
    np.testing.assert_allclose(np.asarray(pred[..., :4]), np.asarray(xywh), atol=2e-4)
    np.testing.assert_allclose(np.asarray(pred[..., 5:]), np.asarray(cls), atol=2e-6)

    from edgeml_tpu.ops.nms import nms_split

    for ml in (True, False):
        want_d, want_v = jax.vmap(
            lambda p: non_max_suppression(p, 1e-4, 0.5, multi_label=ml)
        )(pred)
        got_d, got_v = jax.vmap(
            lambda o, b, c: nms_split(o, b, c, 1e-4, 0.5, multi_label=ml)
        )(obj, xywh, cls)
        assert np.asarray(want_v).sum() > 0  # the comparison must be non-vacuous
        assert np.array_equal(np.asarray(want_v), np.asarray(got_v))
        np.testing.assert_allclose(
            np.asarray(want_d), np.asarray(got_d), atol=5e-4
        )


def test_dump_features_file_contract(tmp_path):
    """Feature-map dump: per-image directory of stage{S}_{Name}_features.npy
    in (C, H, W) layout (the reference's patched feature_visualization
    contract, yolov5_scripts.md:24-42), streamed from disk."""
    from edgeml_tpu.models.infer import dump_features
    from edgeml_tpu.data.io import V5_STAGE_NAMES

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        np.save(img_dir / f"im{i}.npy", rng.random((40, 56, 3)).astype(np.float32))

    net = YoloV5(variant="n", num_classes=8, img_size=64)
    params, stats = net.init(jax.random.PRNGKey(0))
    dump_features(net, params, stats, str(img_dir), str(tmp_path / "feat"),
                  img_size=64)
    for i in range(3):
        d = tmp_path / "feat" / f"im{i}"
        files = sorted(p.name for p in d.iterdir())
        assert files == sorted(
            f"stage{s}_{V5_STAGE_NAMES[s]}_features.npy" for s in (9, 17, 20, 23)
        )
        arr = np.load(d / files[0])
        assert arr.ndim == 3 and arr.shape[0] > arr.shape[1]  # (C, H, W)


def test_pipelined_serving_step_matches_direct():
    """_detect_pipe_step (trunk of batch i + tail of batch i-1 in one
    program) must reproduce _detect_batch exactly, shifted by one step."""
    from edgeml_tpu.models.infer import (
        _detect_batch, _detect_pipe_step, _zero_carry,
    )

    net = YoloV5(variant="n", num_classes=8, img_size=64)
    params, stats = net.init(jax.random.PRNGKey(5))
    b = 2
    imgs = [
        jax.random.uniform(jax.random.PRNGKey(10 + i), (b, 64, 64, 3))
        for i in range(2)
    ]
    meta = jnp.tile(jnp.asarray([[0.5, 2.0, 1.0]]), (b, 1))
    hw = jnp.tile(jnp.asarray([[120.0, 90.0]]), (b, 1))

    want = [
        _detect_batch(net, params, stats, im, meta, hw, 1e-4, 0.5)
        for im in imgs
    ]

    carry = _zero_carry(net, b, 64)
    carry, _, _, _ = _detect_pipe_step(
        net, params, stats, carry, imgs[0], meta, hw, 1e-4, 0.5
    )
    carry, d0, v0, ok0 = _detect_pipe_step(
        net, params, stats, carry, imgs[1], meta, hw, 1e-4, 0.5
    )
    zero = _zero_carry(net, b, 64)
    _, d1, v1, ok1 = _detect_pipe_step(
        net, params, stats, carry, jnp.zeros((b, 64, 64, 3)),
        zero[1], zero[2], 1e-4, 0.5
    )
    assert bool(ok0) and bool(ok1)  # certificate holds -> outputs exact

    for (wd, wv), (gd, gv) in zip(want, [(d0, v0), (d1, v1)]):
        assert np.asarray(wv).sum() > 0
        assert np.array_equal(np.asarray(wv), np.asarray(gv))
        np.testing.assert_array_equal(np.asarray(wd), np.asarray(gd))


def test_stem_s2d_equivalence():
    """conv2d_stem_s2d computes the same taps as the direct 6x6 s2 p2 conv
    (different contraction order only)."""
    from edgeml_tpu.models.common import conv2d, conv2d_stem_s2d

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 96, 3))
    w = jax.random.normal(jax.random.PRNGKey(1), (6, 6, 3, 16)) * 0.2
    direct = conv2d(x, w, 2, padding=((2, 2), (2, 2)))
    s2d = conv2d_stem_s2d(x, w)
    assert direct.shape == s2d.shape == (2, 32, 48, 16)
    np.testing.assert_allclose(
        np.asarray(direct), np.asarray(s2d), atol=1e-4, rtol=1e-4
    )


def test_s2d_k3s2_equivalence():
    """conv2d_s2d_k3s2 matches the direct 3x3 s2 p1 conv (zero-padded taps
    contribute exact zeros; only summation order differs)."""
    from edgeml_tpu.models.common import conv2d, conv2d_s2d_k3s2

    x = jax.random.normal(jax.random.PRNGKey(2), (2, 64, 96, 16))
    w = jax.random.normal(jax.random.PRNGKey(3), (3, 3, 16, 32)) * 0.2
    direct = conv2d(x, w, 2, padding=((1, 1), (1, 1)))
    s2d = conv2d_s2d_k3s2(x, w)
    assert direct.shape == s2d.shape == (2, 32, 48, 32)
    np.testing.assert_allclose(
        np.asarray(direct), np.asarray(s2d), atol=1e-4, rtol=1e-4
    )


def test_bf16_serving_path():
    """predict(dtype=bf16): obj/cls come out bfloat16, boxes float32; values
    track the f32 path within bf16 tolerance; and the pipelined carry keeps
    STABLE dtypes across steps (a mismatched zero carry silently recompiles
    the serving step every launch — the 25x collapse of round 2)."""
    from edgeml_tpu.models.infer import _detect_pipe_step, _zero_carry

    net = YoloV5(variant="n", num_classes=8, img_size=64)
    params, stats = net.init(jax.random.PRNGKey(1))
    x = jax.random.uniform(jax.random.PRNGKey(2), (2, 64, 64, 3))

    obj, xywh, cls = net.predict(params, stats, x)
    obj_h, xywh_h, cls_h = net.predict(params, stats, x, dtype=jnp.bfloat16)
    assert obj_h.dtype == cls_h.dtype == jnp.bfloat16
    assert xywh_h.dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(obj), np.asarray(obj_h, dtype=np.float32), atol=0.03
    )
    np.testing.assert_allclose(
        np.asarray(xywh), np.asarray(xywh_h), atol=2.0, rtol=0.05
    )

    b = 2
    meta = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]]), (b, 1))
    hw = jnp.tile(jnp.asarray([[64.0, 64.0]]), (b, 1))
    carry = _zero_carry(net, b, 64, dtype=jnp.bfloat16)
    dtypes0 = [a.dtype for a in jax.tree_util.tree_leaves(carry)]
    for seed in (3, 4):
        imgs = jax.random.uniform(jax.random.PRNGKey(seed), (b, 64, 64, 3))
        carry, dets, valid, _ok = _detect_pipe_step(
            net, params, stats, carry, imgs, meta, hw, 1e-4, 0.5,
            dtype=jnp.bfloat16,
        )
        assert [a.dtype for a in jax.tree_util.tree_leaves(carry)] == dtypes0
    assert np.asarray(valid).sum() > 0
    assert np.isfinite(np.asarray(dets)).all()


def test_calibrate_bn_pools_all_batches():
    """calibrate_bn pools the moments of EVERY calibration batch (the
    momentum-inverted train-mode passes are independent samples): the pooled
    mean is the exact average of the per-batch means, and a constant-offset
    second batch shifts the result — the old momentum-chained form kept only
    the last batch's statistics."""
    from edgeml_tpu.models.yolov5 import calibrate_bn

    net = YoloV5(variant="n", num_classes=4, img_size=64)
    params, stats = net.init(jax.random.PRNGKey(0))
    batches = [
        jax.random.uniform(jax.random.PRNGKey(9), (2, 64, 64, 3)),
        jax.random.uniform(jax.random.PRNGKey(10), (2, 64, 64, 3)) * 0.5 + 0.4,
    ]

    pooled = calibrate_bn(net, params, stats, lambda i: batches[i], iters=2)
    only_a = calibrate_bn(net, params, stats, lambda i: batches[0], iters=1)
    only_b = calibrate_bn(net, params, stats, lambda i: batches[1], iters=1)

    la = jax.tree_util.tree_leaves(only_a)
    lb = jax.tree_util.tree_leaves(only_b)
    lp = jax.tree_util.tree_leaves(pooled)
    assert len(la) == len(lp)
    # pooled differs from the last batch alone (the old behavior)...
    diffs = [
        float(jnp.max(jnp.abs(p - b))) for p, b in zip(lp, lb)
    ]
    assert max(diffs) > 1e-4
    # ...and every mean leaf is the exact average of the per-batch means.
    # Leaf order interleaves m/v; check the identity only where it holds
    # exactly (means): m_pool == (m_a + m_b) / 2 within float roundoff.
    def means(tree):
        from edgeml_tpu.models.yolov5 import _map_bn_nodes

        out = []
        _map_bn_nodes(tree, lambda s: (out.append(s["m"]), s)[1])
        return out

    for ma, mb, mp in zip(means(only_a), means(only_b), means(pooled)):
        np.testing.assert_allclose(
            np.asarray((ma + mb) / 2), np.asarray(mp), rtol=1e-5, atol=1e-6
        )
    # variances stay nonnegative
    def vars(tree):
        from edgeml_tpu.models.yolov5 import _map_bn_nodes

        out = []
        _map_bn_nodes(tree, lambda s: (out.append(s["v"]), s)[1])
        return out

    for v in vars(pooled):
        assert float(jnp.min(v)) >= 0.0


def test_predict_fuse_conf_matches_manual():
    """predict(fuse_conf=True) returns (best, xywh, conf) bit-equal to
    computing conf = obj * cls and its row max from the unfused outputs —
    in f32 and bf16 (the serving tail's conf_fused contract)."""
    net = YoloV5(variant="n", num_classes=8, img_size=64)
    params, stats = net.init(jax.random.PRNGKey(6))
    x = jax.random.uniform(jax.random.PRNGKey(7), (2, 64, 64, 3))
    for dt in (None, jnp.bfloat16):
        obj, xywh, cls = net.predict(params, stats, x, dtype=dt)
        best, xywh_f, conf = net.predict(
            params, stats, x, dtype=dt, fuse_conf=True
        )
        np.testing.assert_array_equal(np.asarray(xywh_f), np.asarray(xywh))
        want_conf = np.asarray(cls * obj[..., None])
        np.testing.assert_array_equal(np.asarray(conf), want_conf)
        np.testing.assert_array_equal(
            np.asarray(best), want_conf.max(axis=-1)
        )
        assert conf.dtype == cls.dtype and best.dtype == cls.dtype


def test_c3_fuse_cv12_bit_exact():
    """C3_FUSE_CV12 (one wide conv for each C3's cv1/cv2 pair) matches the
    unfused walk in BOTH modes to reduction-reorder tolerance: every conv
    output channel, BN channel statistic, and SiLU lane is independent, so
    only the conv contraction's summation order can differ (XLA retiles the
    wider output)."""
    import edgeml_tpu.models.yolov5 as y5

    net = YoloV5(variant="n", num_classes=12, img_size=64)
    params, stats = net.init(jax.random.PRNGKey(5))
    x = jax.random.uniform(jax.random.PRNGKey(6), (2, 64, 64, 3))

    def run(train):
        heads, new_stats, _ = net.apply(params, stats, x, train=train)
        return heads, new_stats

    try:
        y5.C3_FUSE_CV12 = False
        eval_ref, _ = jax.jit(lambda: run(False))()
        train_ref, stats_ref = jax.jit(lambda: run(True))()
        y5.C3_FUSE_CV12 = True
        eval_fused, _ = jax.jit(lambda: run(False))()
        train_fused, stats_fused = jax.jit(lambda: run(True))()
    finally:
        y5.C3_FUSE_CV12 = False
    tol = dict(atol=1e-6, rtol=1e-4)
    for a, b in zip(eval_ref, eval_fused):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), **tol)
    for a, b in zip(train_ref, train_fused):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), **tol)
    ra, rb = jax.tree_util.tree_leaves(stats_ref), jax.tree_util.tree_leaves(stats_fused)
    assert len(ra) == len(rb)
    for a, b in zip(ra, rb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), **tol)

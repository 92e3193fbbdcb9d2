"""nms_split_batch == vmap(nms_split): the fast per-row pair pool plus its
batch-level exact fallback must be bit-identical to the exact per-image
path — including adversarial inputs that defeat the fast pool's certificate
(one box holding many of the global top pairs)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from edgeml_tpu.ops.nms import PAIR_T, _select_pairs_fast, nms_split, nms_split_batch


def make_case(rng, b, n, nc, hot_boxes=0):
    obj = rng.random((b, n)).astype(np.float32)
    xywh = np.stack(
        [
            rng.uniform(50, 600, (b, n)),
            rng.uniform(50, 600, (b, n)),
            rng.uniform(5, 80, (b, n)),
            rng.uniform(5, 80, (b, n)),
        ],
        axis=-1,
    ).astype(np.float32)
    cls = (rng.random((b, n, nc)) ** 4).astype(np.float32)
    if hot_boxes:
        # adversarial vs the two-tier pool: `hot_boxes` one-hot BLOCKER rows
        # (one huge value each) fill tier 1 by best-pair rank, followed by
        # 10 FAT rows whose entire class row beats the pool threshold —
        # ranked into tier 2, each hides nc - PAIR_T qualifying pairs,
        # so the exact fallback must fire
        h = hot_boxes
        cls[:, :h, :] *= 1e-3
        cls[:, np.arange(h), rng.integers(0, nc, h)] = 0.99
        obj[:, :h] = 1.0
        cls[:, h : h + 10, :] = 0.9
        obj[:, h : h + 10] = 1.0
        cls[:, h + 10 :, :] *= 0.05
    return jnp.asarray(obj), jnp.asarray(xywh), jnp.asarray(cls)


def reference(obj, xywh, cls, **kw):
    return jax.vmap(
        lambda o, x, c: nms_split(o, x, c, **kw)
    )(obj, xywh, cls)


@pytest.mark.parametrize(
    "b,n,nc,max_cand,hot",
    [
        (3, 500, 80, 128, 0),
        (2, 2000, 80, 256, 0),
        (2, 500, 80, 64, 1),    # single hot box: tier 1 absorbs it
        (2, 600, 80, 256, 200),  # 200 hot boxes: fallback path
        (2, 300, 6, 64, 0),     # nc <= PAIR_T: pool is full, always exact
        (1, 50, 3, 32, 0),      # tiny n, pool smaller than k (padding path)
    ],
)
def test_batch_matches_vmap_exact(b, n, nc, max_cand, hot):
    rng = np.random.default_rng(b * 1000 + n + nc)
    obj, xywh, cls = make_case(rng, b, n, nc, hot_boxes=hot)
    kw = dict(conf_thres=1e-4, iou_thres=0.6, max_det=64, max_cand=max_cand)
    d_ref, v_ref = reference(obj, xywh, cls, **kw)
    d_got, v_got = nms_split_batch(obj, xywh, cls, **kw)
    np.testing.assert_array_equal(np.asarray(v_got), np.asarray(v_ref))
    np.testing.assert_array_equal(np.asarray(d_got), np.asarray(d_ref))


def test_certificate_fires_on_many_hot_boxes():
    """More dominant boxes than the tier-1 width must trip the certificate
    (otherwise the fallback case above proves nothing)."""
    rng = np.random.default_rng(0)
    obj, xywh, cls = make_case(rng, 2, 600, 80, hot_boxes=200)
    kb = min(256, 600)
    k = min(256, kb * 80)
    _, _, _, _, _, ok = jax.vmap(
        lambda o, x, c: _select_pairs_fast(o, x, c, 1e-4, 256, PAIR_T, k)
    )(obj, xywh, cls)
    assert not bool(jnp.all(ok))


def test_certificate_holds_on_concentrated_scores():
    """A handful of dominant boxes (the measured random-weight regime —
    top pairs in ~14 boxes) sits inside tier 1: no fallback."""
    rng = np.random.default_rng(1)
    obj, xywh, cls = make_case(rng, 2, 2000, 80, hot_boxes=14)
    kb = min(1024, 2000)
    k = min(1024, kb * 80)
    _, _, _, _, _, ok = jax.vmap(
        lambda o, x, c: _select_pairs_fast(o, x, c, 1e-4, 1024, PAIR_T, k)
    )(obj, xywh, cls)
    assert bool(jnp.all(ok))


def test_single_label_path():
    rng = np.random.default_rng(2)
    obj, xywh, cls = make_case(rng, 2, 400, 20)
    kw = dict(conf_thres=1e-3, iou_thres=0.5, max_det=32, max_cand=64,
              multi_label=False)
    d_ref, v_ref = reference(obj, xywh, cls, **kw)
    d_got, v_got = nms_split_batch(obj, xywh, cls, **kw)
    np.testing.assert_array_equal(np.asarray(v_got), np.asarray(v_ref))
    np.testing.assert_array_equal(np.asarray(d_got), np.asarray(d_ref))


def test_bf16_batch_matches_vmap():
    rng = np.random.default_rng(4)
    obj, xywh, cls = make_case(rng, 2, 800, 80)
    obj16, cls16 = obj.astype(jnp.bfloat16), cls.astype(jnp.bfloat16)
    kw = dict(conf_thres=1e-4, iou_thres=0.6, max_det=64, max_cand=128)
    d_ref, v_ref = reference(obj16, xywh, cls16, **kw)
    d_got, v_got = nms_split_batch(obj16, xywh, cls16, **kw)
    np.testing.assert_array_equal(np.asarray(v_got), np.asarray(v_ref))
    np.testing.assert_array_equal(np.asarray(d_got), np.asarray(d_ref))


def test_packed_predict_layout_bit_exact():
    """predict(pack_cls=True): unpacking the packed cls reproduces the bf16
    cls bit-for-bit, best_cls is the per-box max, and the packed serving
    pipeline (_detect_batch) returns identical detections."""
    from edgeml_tpu.models.infer import _detect_batch
    from edgeml_tpu.models.yolov5 import YoloV5
    from edgeml_tpu.ops.nms import _unpack_cls_rows

    net = YoloV5(variant="n", num_classes=8, img_size=64)
    params, stats = net.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3))
    o1, w1, c1 = net.predict(params, stats, x, dtype=jnp.bfloat16)
    o2, w2, cp, best = net.predict(
        params, stats, x, dtype=jnp.bfloat16, pack_cls=True
    )
    np.testing.assert_array_equal(np.asarray(o1, np.float32),
                                  np.asarray(o2, np.float32))
    np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))
    unpacked = jax.vmap(_unpack_cls_rows)(cp)
    np.testing.assert_array_equal(np.asarray(c1, np.float32),
                                  np.asarray(unpacked, np.float32))
    np.testing.assert_array_equal(
        np.asarray(jnp.max(c1, axis=-1), np.float32),
        np.asarray(best, np.float32),
    )

    # packed vs unpacked full pipeline: identical detections
    meta = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]]), (2, 1))
    hw = jnp.tile(jnp.asarray([[64.0, 64.0]]), (2, 1))
    d_pack, v_pack = _detect_batch(
        net, params, stats, x, meta, hw, 1e-4, 0.6, dtype=jnp.bfloat16
    )
    from edgeml_tpu.models.infer import _nms_unmap

    d_ref, v_ref = _nms_unmap(
        (o1, w1, c1), meta, hw, 1e-4, 0.6, 300, True
    )
    np.testing.assert_array_equal(np.asarray(v_pack), np.asarray(v_ref))
    np.testing.assert_array_equal(np.asarray(d_pack), np.asarray(d_ref))


def test_pack_cls_rejects_bad_config():
    from edgeml_tpu.models.yolov5 import YoloV5

    net = YoloV5(variant="n", num_classes=8, img_size=64)
    params, stats = net.init(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 64, 64, 3))
    with pytest.raises(ValueError):
        net.predict(params, stats, x, pack_cls=True)  # f32
    odd = YoloV5(variant="n", num_classes=7, img_size=64)
    p2, s2 = odd.init(jax.random.PRNGKey(0))
    with pytest.raises(ValueError):
        odd.predict(p2, s2, x, dtype=jnp.bfloat16, pack_cls=True)

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
    """In the TWO-TIER regime (b1 < g; the production default is the full
    pool, but the tier machinery is kept for smaller-B1 configs): more
    dominant boxes than the tier-1 width must trip the in-pool certificate
    (otherwise the tier-2 fallback case above proves nothing)."""
    from edgeml_tpu.ops import nms as nms_mod

    rng = np.random.default_rng(0)
    obj, xywh, cls = make_case(rng, 2, 600, 80, hot_boxes=200)
    kb = min(256, 600)
    k = min(256, kb * 80)
    saved = nms_mod.PAIR_B1
    nms_mod.PAIR_B1 = 128  # two-tier: tier-2 rows contribute top-T only
    try:
        *_, ok = jax.vmap(
            lambda o, x, c: _select_pairs_fast(
                o, x, c, 1e-4, 256, PAIR_T, k, False)
        )(obj, xywh, cls)
    finally:
        nms_mod.PAIR_B1 = saved
    assert not bool(jnp.all(ok))


def test_certificate_holds_on_concentrated_scores():
    """A handful of dominant boxes (the measured random-weight regime —
    top pairs in ~14 boxes) sits inside tier 1: no fallback."""
    rng = np.random.default_rng(1)
    obj, xywh, cls = make_case(rng, 2, 2000, 80, hot_boxes=14)
    kb = min(1024, 2000)
    k = min(1024, kb * 80)
    *_, ok = jax.vmap(
        lambda o, x, c: _select_pairs_fast(o, x, c, 1e-4, 512, PAIR_T, k, False)
    )(obj, xywh, cls)
    assert bool(jnp.all(ok))


def make_spread_case(rng, b, n, nc, contributors):
    """`contributors` boxes each hold one dominant pair plus small-but-
    qualifying pairs spread over the other classes; the rest of the boxes
    sit below the confidence gate. With contributors > PAIR_G the top-k
    pairs draw from more rows than the fast path gathers."""
    obj = np.full((b, n), 1e-5, np.float32)
    cls = np.full((b, n, nc), 1e-5, np.float32)
    obj[:, :contributors] = 1.0
    cls[:, :contributors, :] = rng.uniform(
        0.001, 0.003, (b, contributors, nc)
    ).astype(np.float32)
    hot = rng.integers(0, nc, (b, contributors))
    for bi in range(b):
        cls[bi, np.arange(contributors), hot[bi]] = (
            0.9 - np.arange(contributors) * 1e-4
        ).astype(np.float32)
    xywh = np.stack(
        [
            rng.uniform(50, 600, (b, n)),
            rng.uniform(50, 600, (b, n)),
            rng.uniform(5, 80, (b, n)),
            rng.uniform(5, 80, (b, n)),
        ],
        axis=-1,
    ).astype(np.float32)
    return jnp.asarray(obj), jnp.asarray(xywh), jnp.asarray(cls)


def test_hidden_row_certificate_fires_beyond_gather_width():
    """More contributing boxes than the PAIR_G gather width: the top-1024
    pairs draw from rows the fast path never gathers, so the hidden-row
    certificate (best_top[g] < t_k) must fail and the exact fallback must
    restore bit-identical results."""
    from edgeml_tpu.ops.nms import PAIR_G

    rng = np.random.default_rng(7)
    obj, xywh, cls = make_spread_case(rng, 2, 2048, 80, PAIR_G + 200)
    kw = dict(conf_thres=1e-4, iou_thres=0.6, max_det=64, max_cand=1024)
    _, _, ok = nms_split_batch(obj, xywh, cls, fallback="flag", **kw)
    assert not bool(ok)
    d_got, v_got = nms_split_batch(obj, xywh, cls, **kw)  # cond fallback
    d_ref, v_ref = reference(obj, xywh, cls, **kw)
    np.testing.assert_array_equal(np.asarray(v_got), np.asarray(v_ref))
    np.testing.assert_array_equal(np.asarray(d_got), np.asarray(d_ref))


def test_hidden_row_certificate_holds_below_gather_width():
    """Contributors comfortably inside the gather width: certificate holds
    and the fast path is bit-identical to the exact reference."""
    rng = np.random.default_rng(8)
    obj, xywh, cls = make_spread_case(rng, 2, 2048, 80, 300)
    kw = dict(conf_thres=1e-4, iou_thres=0.6, max_det=64, max_cand=1024)
    d, v, ok = nms_split_batch(obj, xywh, cls, fallback="flag", **kw)
    assert bool(ok)
    d_ref, v_ref = reference(obj, xywh, cls, **kw)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(v_ref))
    np.testing.assert_array_equal(np.asarray(d), np.asarray(d_ref))


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


def test_bf16_tie_clusters_hold_certificate_and_match_exact():
    """bfloat16 quantization produces large tie clusters at the k-th score
    (measured 60+ on the calibrated workload), which the value-ranked
    certificate cannot clear. The bf16 path ranks packed (score, -index)
    integer keys instead: ties are impossible, the certificate holds, and
    the selection is bit-identical to the exact reference tie order."""
    rng = np.random.default_rng(9)
    b, n, nc = 2, 2000, 80
    obj = np.ones((b, n), np.float32)
    # coarse score grid: every value collides with ~n*nc/12 others
    cls = rng.choice(
        [0.05, 0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 0.95, 0.99],
        (b, n, nc),
    ).astype(np.float32)
    xywh = np.stack(
        [
            rng.uniform(50, 600, (b, n)),
            rng.uniform(50, 600, (b, n)),
            rng.uniform(5, 80, (b, n)),
            rng.uniform(5, 80, (b, n)),
        ],
        axis=-1,
    ).astype(np.float32)
    obj16 = jnp.asarray(obj, jnp.bfloat16)
    cls16 = jnp.asarray(cls, jnp.bfloat16)
    xywh = jnp.asarray(xywh)
    kw = dict(conf_thres=1e-4, iou_thres=0.6, max_det=64, max_cand=1024)
    d, v, ok = nms_split_batch(obj16, xywh, cls16, fallback="flag", **kw)
    assert bool(ok), "key-ranked pool must certify through tie clusters"
    d_ref, v_ref = reference(obj16, xywh, cls16, **kw)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(v_ref))
    np.testing.assert_array_equal(np.asarray(d), np.asarray(d_ref))


def test_onehot_cls_gather_matches_narrow():
    """The one-hot MXU cls+obj row gather (_GATHER_ONEHOT, the production
    bf16 default since round 4) is bit-identical to the narrow dynamic
    gathers — the payloads are already bf16, so DEFAULT-precision operand
    rounding is lossless — through the full batched entry point (fast pool,
    certificate, emit)."""
    from edgeml_tpu.ops import nms as nms_mod

    rng = np.random.default_rng(11)
    obj, xywh, cls = make_case(rng, 2, 800, 80)
    obj16, cls16 = obj.astype(jnp.bfloat16), cls.astype(jnp.bfloat16)
    kw = dict(conf_thres=1e-4, iou_thres=0.6, max_det=64, max_cand=128)
    assert nms_mod._GATHER_ONEHOT  # production default: one-hot ON
    d, v, ok = nms_split_batch(obj16, xywh, cls16, fallback="flag", **kw)
    nms_mod._GATHER_ONEHOT = False
    nms_split_batch.clear_cache()  # the flag is read at trace time
    try:
        d_ref, v_ref, ok_ref = nms_split_batch(
            obj16, xywh, cls16, fallback="flag", **kw
        )
    finally:
        nms_mod._GATHER_ONEHOT = True
        nms_split_batch.clear_cache()  # don't leak the narrow trace
    assert bool(ok) == bool(ok_ref)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(v_ref))
    np.testing.assert_array_equal(np.asarray(d), np.asarray(d_ref))


def test_flag_mode_matches_cond_when_certificate_holds():
    """fallback="flag" returns (dets, valid, ok): with ok True the results
    equal the exact cond path bit-for-bit; with ok False the caller's exact
    redo (fallback="cond") restores exactness — the host-side protocol of
    models/infer.py run_detection."""
    rng = np.random.default_rng(5)
    kw = dict(conf_thres=1e-4, iou_thres=0.6, max_det=64, max_cand=256)

    obj, xywh, cls = make_case(rng, 2, 600, 80)  # spread: certificate holds
    d, v, ok = nms_split_batch(obj, xywh, cls, fallback="flag", **kw)
    assert bool(ok)
    d_ref, v_ref = nms_split_batch(obj, xywh, cls, **kw)
    np.testing.assert_array_equal(np.asarray(d), np.asarray(d_ref))
    np.testing.assert_array_equal(np.asarray(v), np.asarray(v_ref))

    # A failing certificate needs the TWO-TIER regime (the full-pool
    # default absorbs the tier-2-hidden construction — correctly: the fast
    # path is exact there); pin b1 < g to exercise the redo protocol.
    from edgeml_tpu.ops import nms as nms_mod

    obj, xywh, cls = make_case(rng, 2, 600, 80, hot_boxes=200)  # fails
    saved = nms_mod.PAIR_B1
    nms_mod.PAIR_B1 = 128
    nms_split_batch.clear_cache()
    try:
        _, _, ok = nms_split_batch(obj, xywh, cls, fallback="flag", **kw)
        assert not bool(ok)
        d2, v2 = nms_split_batch(obj, xywh, cls, **kw)  # the host redo
    finally:
        nms_mod.PAIR_B1 = saved
        nms_split_batch.clear_cache()
    d_ref, v_ref = reference(obj, xywh, cls, **kw)
    np.testing.assert_array_equal(np.asarray(d2), np.asarray(d_ref))
    np.testing.assert_array_equal(np.asarray(v2), np.asarray(v_ref))


def test_run_detection_pipeline_files_exact(tmp_path):
    """End-to-end run_detection (pipelined loop + host fallback protocol):
    per-image files equal the unpipelined exact path."""
    import jax as _jax
    from edgeml_tpu.models.infer import _detect_batch, run_detection
    from edgeml_tpu.models.yolov5 import YoloV5
    from edgeml_tpu.models.common import letterbox_batch

    net = YoloV5(variant="n", num_classes=8, img_size=64)
    params, stats = net.init(_jax.random.PRNGKey(0))
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    raw = []
    for i in range(5):
        im = rng.random((50, 70, 3)).astype(np.float32)
        raw.append(im)
        np.save(img_dir / f"im{i}.npy", im)
    out_dir = tmp_path / "out"
    run_detection(net, params, stats, str(img_dir), str(out_dir),
                  batch_size=2, conf_thres=1e-3, iou_thres=0.5, img_size=64)

    for i, im in enumerate(raw):
        lb, meta = letterbox_batch([im, im], 64)
        hw = np.array([im.shape[:2]] * 2, np.float32)
        dets, valid = _detect_batch(
            net, params, stats, jnp.asarray(lb), jnp.asarray(meta),
            jnp.asarray(hw), 1e-3, 0.5,
        )
        want = np.asarray(dets[0])[np.asarray(valid[0])]
        got = np.load(out_dir / f"im{i}.npy")
        np.testing.assert_array_equal(got, want)


def test_run_detection_bf16_onehot_gather_files_equal(tmp_path):
    """Full bf16 serving pipeline (run_detection) at the production default
    (one-hot MXU cls+obj gather): per-image files bit-equal the narrow-gather
    run (the gathered values are identical, so every downstream rank/NMS/
    unmap stage sees the same inputs)."""
    import jax as _jax
    from edgeml_tpu.models import infer as infer_mod
    from edgeml_tpu.models.infer import run_detection
    from edgeml_tpu.models.yolov5 import YoloV5
    from edgeml_tpu.ops import nms as nms_mod

    net = YoloV5(variant="n", num_classes=8, img_size=64)
    params, stats = net.init(_jax.random.PRNGKey(0))
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(3)
    for i in range(4):
        np.save(img_dir / f"im{i}.npy",
                rng.random((50, 70, 3)).astype(np.float32))

    def clear():
        from edgeml_tpu.ops.nms_raw import nms_split_batch_raw

        nms_split_batch.clear_cache()
        nms_split_batch_raw.clear_cache()  # bf16 serving rides the raw tail
        infer_mod._detect_pipe_step.clear_cache()
        infer_mod._detect_batch.clear_cache()

    out_b = tmp_path / "onehot"
    assert nms_mod._GATHER_ONEHOT  # production default: one-hot ON
    run_detection(net, params, stats, str(img_dir), str(out_b),
                  batch_size=2, conf_thres=1e-3, iou_thres=0.5,
                  img_size=64, dtype=jnp.bfloat16)
    nms_mod._GATHER_ONEHOT = False
    clear()  # the flag is read at trace time
    try:
        out_a = tmp_path / "narrow"
        run_detection(net, params, stats, str(img_dir), str(out_a),
                      batch_size=2, conf_thres=1e-3, iou_thres=0.5,
                      img_size=64, dtype=jnp.bfloat16)
    finally:
        nms_mod._GATHER_ONEHOT = True
        clear()
    for i in range(4):
        a = np.load(out_a / f"im{i}.npy")
        b = np.load(out_b / f"im{i}.npy")
        np.testing.assert_array_equal(b, a)


def _fused_inputs(obj, xywh, cls):
    """The predict(fuse_conf=True) contract from raw components: conf =
    obj * cls, best = row max of conf (same op order as the trunk epilogue,
    yolov5.decode_level_split)."""
    conf = cls * obj[..., None]
    return jnp.max(conf, axis=-1), xywh, conf


@pytest.mark.parametrize("hot", [0, 200])
def test_conf_fused_matches_unfused(hot):
    """conf_fused inputs (precomputed best + confidence matrix) give
    bit-identical detections to the raw (obj, cls) path — on the fast pool
    (hot=0) AND through the exact fallback (hot=200). The obj > conf_thres
    gate the fused path drops is implied by conf <= obj."""
    rng = np.random.default_rng(21 + hot)
    obj, xywh, cls = make_case(rng, 2, 600, 80, hot_boxes=hot)
    kw = dict(conf_thres=1e-4, iou_thres=0.6, max_det=64, max_cand=256)
    d_ref, v_ref = nms_split_batch(obj, xywh, cls, **kw)
    best, xywh_f, conf = _fused_inputs(obj, xywh, cls)
    d, v = nms_split_batch(best, xywh_f, conf, conf_fused=True, **kw)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(v_ref))
    np.testing.assert_array_equal(np.asarray(d), np.asarray(d_ref))


def test_conf_fused_bf16_flag_mode():
    """bf16 keyed ranking under conf_fused: certificate verdict and results
    match the unfused flag-mode run bit-for-bit (bf16 products round the
    same whether multiplied trunk-side or tail-side)."""
    rng = np.random.default_rng(23)
    obj, xywh, cls = make_case(rng, 2, 2000, 80)
    obj16 = jnp.asarray(obj, jnp.bfloat16)
    cls16 = jnp.asarray(cls, jnp.bfloat16)
    kw = dict(conf_thres=1e-4, iou_thres=0.6, max_det=64, max_cand=1024)
    d_ref, v_ref, ok_ref = nms_split_batch(
        obj16, xywh, cls16, fallback="flag", **kw
    )
    best, xywh_f, conf = _fused_inputs(obj16, xywh, cls16)
    d, v, ok = nms_split_batch(
        best, xywh_f, conf, fallback="flag", conf_fused=True, **kw
    )
    assert bool(ok) == bool(ok_ref)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(v_ref))
    np.testing.assert_array_equal(np.asarray(d), np.asarray(d_ref))


def test_conf_fused_single_label():
    rng = np.random.default_rng(24)
    obj, xywh, cls = make_case(rng, 2, 400, 20)
    kw = dict(conf_thres=1e-3, iou_thres=0.5, max_det=32, max_cand=64,
              multi_label=False)
    d_ref, v_ref = nms_split_batch(obj, xywh, cls, **kw)
    best, xywh_f, conf = _fused_inputs(obj, xywh, cls)
    d, v = nms_split_batch(best, xywh_f, conf, conf_fused=True, **kw)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(v_ref))
    np.testing.assert_array_equal(np.asarray(d), np.asarray(d_ref))


def test_pool_topk_chunked_matches_default():
    """POOL_TOPK_CHUNK routes the pool ranking through the exact chunked
    topk1d — results must be identical to the lax.top_k path (keyed bf16
    ranking is tie-proof, so even tie order is pinned)."""
    from edgeml_tpu.ops import nms as nms_mod

    rng = np.random.default_rng(23)
    obj, xywh, cls = make_case(rng, 3, 900, 80)
    obj16, cls16 = obj.astype(jnp.bfloat16), cls.astype(jnp.bfloat16)
    kw = dict(conf_thres=1e-4, iou_thres=0.6, max_det=64, max_cand=256)
    assert nms_mod.POOL_TOPK_CHUNK is None
    d_ref, v_ref, ok_ref = nms_split_batch(
        obj16, xywh, cls16, fallback="flag", **kw
    )
    nms_mod.POOL_TOPK_CHUNK = 1024
    nms_split_batch.clear_cache()  # trace-time flag
    try:
        d, v, ok = nms_split_batch(obj16, xywh, cls16, fallback="flag", **kw)
    finally:
        nms_mod.POOL_TOPK_CHUNK = None
        nms_split_batch.clear_cache()
    assert bool(ok) == bool(ok_ref)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(v_ref))
    np.testing.assert_array_equal(np.asarray(d), np.asarray(d_ref))


@pytest.mark.parametrize("mode", ["threshold", "scatter"])
def test_pool_select_threshold_matches_topk_unit(mode):
    """_topk_keys_threshold is bit-identical to lax.top_k on _pack17 keys
    (unique by construction): same keys, same order, and the embedded
    index round-trips. Covers real/masked mixes and the all-masked pool."""
    from edgeml_tpu.ops import nms as nms_mod

    rng = np.random.default_rng(7)
    for n, k, frac_real in [(30720, 1024, 0.5), (30720, 1024, 0.001),
                            (14336, 1024, 0.0), (4096, 4096 - 1, 1.0),
                            (517, 96, 0.3)]:
        vals = rng.random(n).astype(np.float32)
        vals[rng.random(n) >= frac_real] = -1.0  # masked entries
        keys = nms_mod._pack17(jnp.asarray(vals, jnp.bfloat16))
        want_v, want_i = jax.lax.top_k(keys, k)
        got_v = nms_mod._topk_keys_threshold(keys, k, mode)
        np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))
        got_i = np.asarray((-got_v) & ((1 << 17) - 1))
        np.testing.assert_array_equal(got_i, np.asarray(want_i))


@pytest.mark.parametrize("mode", ["threshold", "scatter"])
@pytest.mark.parametrize("hot", [4, 400])
def test_pool_select_threshold_pipeline_exact(mode, hot):
    """POOL_SELECT routes the keyed pool ranking through the threshold
    partial select — end-to-end results must be bit-identical to the
    lax.top_k path in both the full-pool and tiered-pool configurations."""
    from edgeml_tpu.ops import nms as nms_mod

    rng = np.random.default_rng(29 + hot)
    obj, xywh, cls = make_case(rng, 3, 900, 80, hot_boxes=hot)
    obj16, cls16 = obj.astype(jnp.bfloat16), cls.astype(jnp.bfloat16)
    kw = dict(conf_thres=1e-4, iou_thres=0.6, max_det=64, max_cand=256)
    assert nms_mod.POOL_SELECT == "topk"
    d_ref, v_ref, ok_ref = nms_split_batch(
        obj16, xywh, cls16, fallback="flag", **kw
    )
    old_b1 = nms_mod.PAIR_B1
    nms_mod.POOL_SELECT = mode
    nms_split_batch.clear_cache()  # trace-time flag
    try:
        d, v, ok = nms_split_batch(obj16, xywh, cls16, fallback="flag", **kw)
        # the tiered pool exercises the tier-2 key-index recovery
        nms_mod.PAIR_B1 = 32
        nms_mod.POOL_SELECT = "topk"
        nms_split_batch.clear_cache()
        d_ref2, v_ref2, ok2_ref = nms_split_batch(
            obj16, xywh, cls16, fallback="flag", **kw)
        nms_mod.POOL_SELECT = mode
        nms_split_batch.clear_cache()
        d2, v2, ok2 = nms_split_batch(
            obj16, xywh, cls16, fallback="flag", **kw)
    finally:
        nms_mod.POOL_SELECT = "topk"
        nms_mod.PAIR_B1 = old_b1
        nms_split_batch.clear_cache()
    assert bool(ok) == bool(ok_ref)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(v_ref))
    np.testing.assert_array_equal(np.asarray(d), np.asarray(d_ref))
    assert bool(ok2) == bool(ok2_ref)
    np.testing.assert_array_equal(np.asarray(v2), np.asarray(v_ref2))
    np.testing.assert_array_equal(np.asarray(d2), np.asarray(d_ref2))

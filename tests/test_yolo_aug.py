"""YOLOv5 training-recipe augmentation (mosaic / affine / HSV / flip —
edgeml_tpu/data/yolo_aug.py; the ultralytics recipe of
/root/reference/yolov5_scripts.md:9).

Core property: boxes TRACK the warp — wherever the pipeline moves a
rectangle's pixels, its box follows."""

import os
import sys
import types

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tpu_models"))

from edgeml_tpu.data.yolo_aug import (
    box_candidates,
    hsv_jitter,
    mosaic4,
    scale_translate,
    yolo_augment_batch,
)


def rect_example(size, x, y, w, h, intensity=1.0):
    """Black image with one bright rectangle and its (cls, xyxy norm) label."""
    img = np.zeros((size, size, 3), np.float32)
    x1, y1 = int(x * size), int(y * size)
    x2, y2 = int((x + w) * size), int((y + h) * size)
    img[y1:y2, x1:x2] = intensity
    return img, (np.array([0.0]), np.array([[x, y, x + w, y + h]], np.float32))


def test_hsv_zero_gains_identity_and_range():
    rng = np.random.default_rng(0)
    img = rng.random((16, 16, 3)).astype(np.float32)
    out = hsv_jitter(img, np.random.default_rng(1), hgain=0, sgain=0, vgain=0)
    np.testing.assert_allclose(out, img)
    out = hsv_jitter(img, np.random.default_rng(2))
    assert out.shape == img.shape
    assert out.min() >= 0.0 and out.max() <= 1.0
    assert not np.allclose(out, img)  # gains actually applied


def test_hsv_native_matches_numpy_oracle():
    """The fused native kernel (native/aug.cpp) evaluates the exact NumPy
    expression; parity at float-rounding tolerance incl. the grey/black/
    saturated edge pixels and mod-wrapping extreme gains."""
    from edgeml_tpu.data.fastaug import native_hsv_jitter
    from edgeml_tpu.data.yolo_aug import _hsv_jitter_numpy, hsv_gains

    rng = np.random.default_rng(7)
    img = rng.random((64, 64, 3), dtype=np.float32)
    img[0] = 0.5  # grey: diff == 0
    img[1] = 0.0  # black: mx == 0
    img[2, :, :] = [1, 0, 0]
    img[3, :, :] = [0, 1, 0]
    img[4, :, :] = [0, 0, 1]
    out = native_hsv_jitter(img, 1.01, 1.2, 0.9)
    if out is None:
        pytest.skip("native aug kernel unavailable")
    cases = [tuple(hsv_gains(np.random.default_rng(t))) for t in range(6)]
    cases += [(3.7, 0.2, 1.4), (-0.8, 1.9, 0.1), (0.0, 1.0, 1.0)]
    for gains in cases:
        ref = _hsv_jitter_numpy(img, *gains)
        got = native_hsv_jitter(img, *gains)
        np.testing.assert_allclose(got, ref, atol=2e-6)


def test_hsv_device_matches_numpy_oracle():
    """ops/color.hsv_jitter (the on-device jitter) matches the host NumPy
    expression per image at float32 tolerance."""
    from edgeml_tpu.ops.color import hsv_jitter as hsv_dev
    from edgeml_tpu.data.yolo_aug import _hsv_jitter_numpy, hsv_gains

    rng = np.random.default_rng(11)
    imgs = rng.random((3, 32, 32, 3)).astype(np.float32)
    imgs[0, 0] = 0.5
    imgs[1, 0] = 0.0
    gains = np.stack([hsv_gains(np.random.default_rng(t)) for t in range(3)])
    got = np.asarray(hsv_dev(imgs, gains.astype(np.float32)))
    for k in range(3):
        ref = _hsv_jitter_numpy(imgs[k], *gains[k])
        np.testing.assert_allclose(got[k], ref, atol=3e-6)


def test_yolo_augment_batch_device_mode_geometry_and_gains():
    """hsv='device' leaves pixels un-jittered but draws gains from the SAME
    rng stream: applying the returned gains on the host reproduces the
    hsv=True output exactly (geometry incl. the flip decisions match)."""
    from edgeml_tpu.data.yolo_aug import _hsv_jitter_numpy

    size = 64
    rng = np.random.default_rng(5)
    exs = []
    for _ in range(4):
        img = rng.random((size, size, 3)).astype(np.float32)
        exs.append((img, (np.array([0.0]),
                          np.array([[0.2, 0.2, 0.7, 0.7]], np.float32))))
    host_imgs, host_rows = yolo_augment_batch(exs, size, [3, 1, 0], hsv=True)
    dev_imgs, dev_rows, gains = yolo_augment_batch(
        exs, size, [3, 1, 0], hsv="device"
    )
    assert gains.shape == (4, 3) and gains.dtype == np.float32
    for ra, rb in zip(host_rows, dev_rows):
        np.testing.assert_array_equal(ra, rb)
    for k in range(4):
        np.testing.assert_allclose(
            _hsv_jitter_numpy(dev_imgs[k], *gains[k].astype(np.float64)),
            host_imgs[k], atol=3e-6,
        )


def test_hsv_roundtrip_identity():
    """rgb -> hsv -> rgb is the identity (validates the color math)."""
    from edgeml_tpu.data.yolo_aug import _hsv_to_rgb, _rgb_to_hsv

    rng = np.random.default_rng(3)
    img = rng.random((32, 32, 3)).astype(np.float64)
    h, s, v = _rgb_to_hsv(img)
    back = _hsv_to_rgb(h, s, v)
    np.testing.assert_allclose(back, img, atol=1e-6)


def test_mosaic4_boxes_cover_content():
    """4 bright-rectangle images -> every surviving mosaic box contains
    bright pixels and little else around it."""
    size = 64
    exs = [rect_example(size, 0.25, 0.25, 0.4, 0.4) for _ in range(4)]
    canvas, cls, boxes = mosaic4(
        [e[0] for e in exs], [e[1] for e in exs], size, np.random.default_rng(0)
    )
    assert canvas.shape == (2 * size, 2 * size, 3)
    assert len(cls) >= 1
    for b in boxes:
        x1, y1, x2, y2 = (int(round(v)) for v in b)
        if x2 - x1 < 3 or y2 - y1 < 3:
            continue
        inside = canvas[y1 + 1 : y2 - 1, x1 + 1 : x2 - 1].mean()
        assert inside > 0.5, (b, inside)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_pipeline_boxes_track_warp(seed):
    """Full batch recipe on rectangle images: for every emitted box, the mean
    intensity INSIDE the box greatly exceeds the mean OUTSIDE it."""
    size = 96
    rng = np.random.default_rng(seed)
    exs = []
    for _ in range(4):
        x, y = rng.uniform(0.1, 0.5, 2)
        w, h = rng.uniform(0.25, 0.4, 2)
        exs.append(rect_example(size, x, y, min(w, 0.95 - x), min(h, 0.95 - y)))
    imgs, rows = yolo_augment_batch(exs, size, [seed, 0, 0], hsv=False)
    assert imgs.shape == (4, size, size, 3)
    checked = 0
    for img, rr in zip(imgs, rows):
        gray = img.mean(-1)
        for r in rr:
            _, cx, cy, w, h = r
            x1, y1 = int((cx - w / 2) * size), int((cy - h / 2) * size)
            x2, y2 = int((cx + w / 2) * size), int((cy + h / 2) * size)
            if x2 - x1 < 6 or y2 - y1 < 6:
                continue
            inner = gray[y1 + 2 : y2 - 2, x1 + 2 : x2 - 2]
            mask = np.zeros_like(gray, bool)
            mask[y1:y2, x1:x2] = True
            outer = gray[~mask]
            # the gray mosaic FILL (114/255) can sit inside a clipped box;
            # content must still dominate clearly
            assert inner.mean() > 0.5, (r, inner.mean())
            assert inner.mean() > outer.mean() + 0.2
            checked += 1
    assert checked >= 2  # the property was actually exercised


def test_determinism():
    size = 64
    exs = [rect_example(size, 0.2, 0.2, 0.5, 0.5) for _ in range(4)]
    a_imgs, a_rows = yolo_augment_batch(exs, size, [7, 1, 3])
    b_imgs, b_rows = yolo_augment_batch(exs, size, [7, 1, 3])
    np.testing.assert_array_equal(a_imgs, b_imgs)
    for ra, rb in zip(a_rows, b_rows):
        np.testing.assert_array_equal(ra, rb)
    c_imgs, _ = yolo_augment_batch(exs, size, [7, 2, 3])
    assert not np.array_equal(a_imgs, c_imgs)


def test_box_candidates_filters_degenerate():
    before = np.array([[0, 0, 40, 40], [0, 0, 40, 40], [0, 0, 300, 2.5]])
    after = np.array(
        [[0, 0, 40, 40],   # intact -> keep
         [0, 0, 1.5, 40],  # squeezed below wh_thr -> drop
         [0, 0, 300, 2.5]]  # aspect ratio 120 > 100 -> drop
    )
    keep = box_candidates(before, after)
    assert keep.tolist() == [True, False, False]


def test_scale_translate_identity_window():
    """With scale=translate=0 the window is the canvas center crop at gain 1:
    output pixels equal the canvas center region and boxes shift exactly."""
    size = 64
    img, (cls, xyxy) = rect_example(2 * size, 0.4, 0.4, 0.2, 0.2)
    boxes_px = xyxy * 2 * size
    rng = np.random.default_rng(0)
    out, cls2, bx = scale_translate(img, cls, boxes_px.copy(), size, rng,
                                    scale=0.0, translate=0.0)
    assert out.shape == (size, size, 3)
    # window origin = (0 - 0.5*size)/1 + size = size/2 -> center crop
    np.testing.assert_allclose(
        out, img[size // 2 : size // 2 + size, size // 2 : size // 2 + size],
        atol=1e-4,
    )
    np.testing.assert_allclose(bx, boxes_px - size / 2, atol=1e-4)


@pytest.mark.parametrize("seed", range(12))
def test_scale_translate_pixel_box_alignment(seed):
    """The rectangle's pixel centroid lands within ~1 px of its mapped box
    center for arbitrary gains/translations — catches any axis-asymmetric
    scale (the crop pad is usually NON-square, so sizing the resize from one
    dim would misalign the other axis by several px at |g - 1| ~ 0.5)."""
    size = 96
    cs = 2 * size
    # integer-aligned rectangle: its continuous center of mass is exactly
    # the box center (no rasterization half-pixel ambiguity)
    img = np.zeros((cs, cs, 3), np.float32)
    x1, y1, x2, y2 = 80, 72, 120, 118
    img[y1:y2, x1:x2] = 1.0
    cls = np.array([0.0])
    boxes_px = np.array([[x1, y1, x2, y2]], np.float32)
    rng = np.random.default_rng(seed)
    out, cls2, bx = scale_translate(img, cls, boxes_px.copy(), size, rng,
                                    scale=0.5, translate=0.1)
    if not len(cls2):  # warped out of the window entirely
        return
    # skip cases where the box is clipped by the window edge: the visible
    # mass centroid and the clipped box center then diverge legitimately
    if (bx[0] <= 0.5).any() or (bx[0] >= size - 0.5).any():
        return
    mass = out[..., 0]
    total = mass.sum()
    assert total > 1.0  # some of the rectangle is visible
    ys, xs = np.mgrid[0:size, 0:size]
    cx = float(((xs + 0.5) * mass).sum() / total)  # continuous pixel centers
    cy = float(((ys + 0.5) * mass).sum() / total)
    bcx, bcy = (bx[0, 0] + bx[0, 2]) / 2, (bx[0, 1] + bx[0, 3]) / 2
    # budget: resize half-pixel convention + integer offset/target rounding
    # measures <= 0.46 px over these seeds; the pre-fix y-scale skew (resize
    # target sized from the pad WIDTH for both axes) reached 0.85 px at the
    # box center and grows linearly toward the window edge
    assert abs(cx - bcx) < 0.6, (cx, bcx)
    assert abs(cy - bcy) < 0.6, (cy, bcy)


def test_train_cli_yolo_augment_bf16_smoke(tmp_path):
    """End-to-end: the trainer runs with --augment yolo and --bf16, loss
    finite, checkpoints written (the reference's recipe entry point,
    yolov5_scripts.md:9 + engine.py:27-43 AMP)."""
    import train as train_cli

    img_dir = tmp_path / "images"
    lab_dir = tmp_path / "labels"
    img_dir.mkdir()
    lab_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(8):
        np.save(img_dir / f"im{i}.npy", rng.random((48, 64, 3)).astype(np.float32))
        (lab_dir / f"im{i}.txt").write_text("1 0.5 0.5 0.4 0.4\n")
    ns = types.SimpleNamespace(
        img_dir=str(img_dir), save_dir=str(tmp_path / "ckpt"),
        label_dir=lab_dir.as_posix(), model="yolov5n", dataset="voc",
        batch_size=4, epochs=1, opt="sgd", lr=0.01, momentum=0.9,
        weight_decay=1e-4, lr_scheduler="multisteplr", lr_steps=[16, 22],
        lr_gamma=0.1, resume="", start_epoch=0, img_size=64, max_targets=8,
        print_freq=1, seed=0, augment="yolo", bf16=True,
    )
    train_cli.main(ns)
    assert (tmp_path / "ckpt" / "checkpoint.pth").exists()

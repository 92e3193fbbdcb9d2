"""Detection transforms: geometry preservation and box bookkeeping."""

import numpy as np
import pytest

from edgeml_tpu.data.transforms import (
    Compose, RandomHorizontalFlip, RandomIoUCrop, RandomZoomOut,
    RandomPhotometricDistort, ScaleJitter, FixedSizeCrop, RandomShortestSize,
    SimpleCopyPaste,
)


def sample(h=60, w=80):
    rng = np.random.default_rng(0)
    img = rng.random((h, w, 3)).astype(np.float32)
    boxes = np.array([[10, 10, 30, 40], [50, 20, 70, 50]], np.float32)
    labels = np.array([1, 2])
    return img, {"boxes": boxes, "labels": labels}


def test_hflip_geometry():
    img, tgt = sample()
    rng = np.random.default_rng(1)
    out, t2 = RandomHorizontalFlip(p=1.0)(img, tgt, rng)
    assert np.allclose(t2["boxes"][0], [80 - 30, 10, 80 - 10, 40])
    assert np.allclose(out[:, ::-1], img)
    # widths preserved
    w0 = tgt["boxes"][:, 2] - tgt["boxes"][:, 0]
    w1 = t2["boxes"][:, 2] - t2["boxes"][:, 0]
    assert np.allclose(w0, w1)


def test_zoom_out_keeps_boxes_on_image():
    img, tgt = sample()
    rng = np.random.default_rng(2)
    out, t2 = RandomZoomOut(p=1.0)(img, tgt, rng)
    assert out.shape[0] >= img.shape[0] and out.shape[1] >= img.shape[1]
    b = t2["boxes"]
    assert (b[:, 2] <= out.shape[1]).all() and (b[:, 3] <= out.shape[0]).all()
    # box sizes unchanged
    assert np.allclose(
        b[:, 2] - b[:, 0], tgt["boxes"][:, 2] - tgt["boxes"][:, 0]
    )


def test_iou_crop_keeps_valid_targets():
    img, tgt = sample()
    rng = np.random.default_rng(3)
    out, t2 = RandomIoUCrop()(img, tgt, rng)
    assert len(t2["boxes"]) == len(t2["labels"])
    if len(t2["boxes"]):
        b = t2["boxes"]
        assert (b[:, 2] > b[:, 0]).all() and (b[:, 3] > b[:, 1]).all()
        assert (b <= max(out.shape[:2])).all()


def test_photometric_shapes_and_range():
    img, tgt = sample()
    rng = np.random.default_rng(4)
    out, t2 = RandomPhotometricDistort(p=1.0)(img, tgt, rng)
    assert out.shape == img.shape
    assert out.min() >= 0.0 and out.max() <= 1.0
    assert np.array_equal(t2["boxes"], tgt["boxes"])


def test_scale_jitter_scales_boxes():
    img, tgt = sample()
    rng = np.random.default_rng(5)
    out, t2 = ScaleJitter(target_size=(120, 160), scale_range=(0.5, 0.5))(
        img, tgt, rng
    )
    r = out.shape[0] / img.shape[0]
    assert np.allclose(t2["boxes"], tgt["boxes"] * r, atol=1e-4)


def test_fixed_size_crop_exact_output():
    img, tgt = sample()
    rng = np.random.default_rng(6)
    out, t2 = FixedSizeCrop(size=(32, 32))(img, tgt, rng)
    assert out.shape == (32, 32, 3)
    if len(t2["boxes"]):
        assert (t2["boxes"] <= 32).all()


def test_random_shortest_size():
    img, tgt = sample()
    rng = np.random.default_rng(7)
    out, t2 = RandomShortestSize(min_size=(48,), max_size=100)(img, tgt, rng)
    assert min(out.shape[:2]) == 48 or max(out.shape[:2]) == 100


def test_copy_paste_adds_objects():
    a = sample()
    b = sample()
    rng = np.random.default_rng(8)
    out, t2 = SimpleCopyPaste(p=1.0)(a, b, rng)
    assert len(t2["boxes"]) >= len(a[1]["boxes"])
    assert len(t2["boxes"]) == len(t2["labels"])


def test_compose_pipeline():
    img, tgt = sample()
    rng = np.random.default_rng(9)
    pipe = Compose(
        [
            RandomPhotometricDistort(),
            RandomZoomOut(),
            RandomIoUCrop(),
            RandomHorizontalFlip(),
        ]
    )
    out, t2 = pipe(img, tgt, rng)
    assert out.ndim == 3 and out.shape[2] == 3
    assert len(t2["boxes"]) == len(t2["labels"])


def test_hflip_masks_and_keypoints():
    """The flip mirrors masks and COCO person keypoints like the reference
    (references/transforms.py:10-45): left/right joints swap, x reflects,
    and invisible joints stay pinned at zero."""
    from edgeml_tpu.data.transforms import flip_coco_person_keypoints

    img, tgt = sample()
    h, w = img.shape[:2]
    masks = np.zeros((2, h, w), np.uint8)
    masks[0, :, :10] = 1
    kps = np.zeros((1, 17, 3), np.float32)
    kps[0, 1] = (12.0, 7.0, 2.0)   # left_eye -> index 2 after the swap
    kps[0, 2] = (20.0, 8.0, 1.0)   # right_eye -> index 1
    kps[0, 3] = (0.0, 0.0, 0.0)    # invisible: must stay (0, 0, 0)
    tgt = {**tgt, "masks": masks, "keypoints": kps}
    rng = np.random.default_rng(3)
    _, t2 = RandomHorizontalFlip(p=1.0)(img, tgt, rng)
    assert t2["masks"][0, :, -10:].all() and not t2["masks"][0, :, :-10].any()
    np.testing.assert_allclose(t2["keypoints"][0, 2], [w - 12.0, 7.0, 2.0])
    np.testing.assert_allclose(t2["keypoints"][0, 1], [w - 20.0, 8.0, 1.0])
    # index 4 (left-ear slot) took old index 3's invisible joint -> zeroed
    np.testing.assert_allclose(t2["keypoints"][0, 4], [0.0, 0.0, 0.0])
    # round trip is identity
    back = flip_coco_person_keypoints(t2["keypoints"], w)
    np.testing.assert_allclose(back, kps)


def test_conversion_shims_match_torchvision_semantics():
    """PILToTensor / ConvertImageDtype equivalents
    (references/transforms.py:48-65): byte representation round-trips
    through the uint8->float division-by-255 contract, targets untouched."""
    from edgeml_tpu.data.transforms import ConvertImageDtype, PILToTensor

    img, tgt = sample()
    rng = np.random.default_rng(0)
    u8, t1 = PILToTensor()(img, tgt, rng)
    assert u8.dtype == np.uint8 and t1 is tgt
    np.testing.assert_array_equal(
        u8, np.round(np.clip(img, 0, 1) * 255).astype(np.uint8))
    # uint8 input passes through unchanged
    again, _ = PILToTensor()(u8, tgt, rng)
    np.testing.assert_array_equal(again, u8)

    f32, t2 = ConvertImageDtype(np.float32)(u8, tgt, rng)
    assert f32.dtype == np.float32 and t2 is tgt
    np.testing.assert_allclose(f32, u8.astype(np.float32) / 255.0)
    assert f32.max() <= 1.0
    # float -> float is a plain cast (no rescale)
    f16, _ = ConvertImageDtype(np.float16)(f32, tgt, rng)
    np.testing.assert_allclose(f16, f32.astype(np.float16))

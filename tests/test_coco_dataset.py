"""COCO dataset utilities: rasterization, RLE codec, target conversion,
builder (the C26 surface, reference references/coco_utils.py)."""

import json

import numpy as np
import pytest

from edgeml_tpu.dataprep.coco_dataset import (
    CocoDetectionDataset, convert_polys_target, dataset_to_coco_index,
    filter_remap_categories, get_coco, polygons_to_mask,
    remove_images_without_annotations, rle_area, rle_decode, rle_encode,
    segmentation_to_mask,
)


def test_polygon_square():
    # axis-aligned square [2, 2] -> [6, 6): pixel centers 2.5..5.5 inside
    m = polygons_to_mask([[2, 2, 6, 2, 6, 6, 2, 6]], 8, 8)
    want = np.zeros((8, 8), bool)
    want[2:6, 2:6] = True
    assert np.array_equal(m, want)


def test_polygon_triangle_and_union():
    tri = [0, 0, 8, 0, 0, 8]
    m = polygons_to_mask([tri], 8, 8)
    # right triangle with hypotenuse x + y = 8; centers at +0.5:
    # inside iff (x + .5) + (y + .5) < 8
    assert m[0, 0] and m[0, 6] and m[6, 0] and m[3, 3]
    assert not m[7, 7] and not m[4, 4]  # 4.5 + 4.5 = 9 > 8
    # union of two squares
    two = polygons_to_mask(
        [[0, 0, 2, 0, 2, 2, 0, 2], [5, 5, 7, 5, 7, 7, 5, 7]], 8, 8
    )
    assert two[:2, :2].all() and two[5:7, 5:7].all()
    assert two.sum() == 8


def test_rle_roundtrip_and_area():
    rng = np.random.default_rng(0)
    m = rng.random((13, 7)) < 0.4
    rle = rle_encode(m)
    assert np.array_equal(rle_decode(rle), m)
    assert rle_area(rle) == int(m.sum())
    # leading-foreground edge case
    m2 = np.ones((3, 3), bool)
    assert np.array_equal(rle_decode(rle_encode(m2)), m2)


def test_compressed_rle_string():
    # published LEB128-base32 format: delta coding starts at the 4th run
    # (pycocotools rleFrString: `if (m > 2) x += cnts[m-2]`), so
    # "1232" decodes to runs [1, 2, 3, 2 + cnts[1]] = [1, 2, 3, 4]
    from edgeml_tpu.dataprep.coco_dataset import _rle_unstring

    assert _rle_unstring("1232") == [1, 2, 3, 4]
    flat = np.zeros(10, bool)
    flat[1:3] = True   # runs: 1 bg, 2 fg, 3 bg, 4 fg
    flat[6:10] = True
    m = flat.reshape(5, 2).T  # column-major (2, 5)
    assert np.array_equal(
        rle_decode({"counts": "1232", "size": [2, 5]}), m
    )


def test_convert_polys_target():
    anns = [
        {  # normal box + square mask
            "bbox": [2, 2, 4, 4], "category_id": 3, "area": 16.0,
            "iscrowd": 0, "segmentation": [[2, 2, 6, 2, 6, 6, 2, 6]],
        },
        {  # crowd: dropped
            "bbox": [0, 0, 8, 8], "category_id": 1, "area": 64.0,
            "iscrowd": 1, "segmentation": {"counts": [64], "size": [8, 8]},
        },
        {  # degenerate (zero w): filtered by the keep mask
            "bbox": [1, 1, 0, 3], "category_id": 2, "area": 0.0,
            "iscrowd": 0, "segmentation": [[1, 1, 1, 4, 1, 1]],
        },
        {  # box spilling past the image: clamped
            "bbox": [6, 6, 5, 5], "category_id": 3, "area": 25.0,
            "iscrowd": 0, "segmentation": [[6, 6, 8, 6, 8, 8, 6, 8]],
        },
    ]
    t = convert_polys_target(anns, 8, 8, image_id=42)
    assert t["image_id"] == 42
    assert t["labels"].tolist() == [3, 3]
    np.testing.assert_allclose(t["boxes"][0], [2, 2, 6, 6])
    np.testing.assert_allclose(t["boxes"][1], [6, 6, 8, 8])  # clamped
    assert t["masks"].shape == (2, 8, 8)
    assert t["masks"][0].sum() == 16


def test_filter_remap():
    anns = [{"category_id": c} for c in (5, 9, 5, 2)]
    out = filter_remap_categories(anns, [5, 2])
    assert [a["category_id"] for a in out] == [0, 0, 1]
    out = filter_remap_categories(anns, [5, 2], remap=False)
    assert [a["category_id"] for a in out] == [5, 5, 2]


@pytest.fixture()
def coco_tree(tmp_path):
    rng = np.random.default_rng(0)
    (tmp_path / "train2017").mkdir()
    (tmp_path / "annotations").mkdir()
    images, annotations = [], []
    ann_id = 1
    for i in range(4):
        h, w = 16, 20
        np.save(tmp_path / "train2017" / f"im{i}.npy",
                rng.random((h, w, 3)).astype(np.float32))
        images.append(
            {"id": 100 + i, "file_name": f"im{i}.npy", "height": h, "width": w}
        )
        if i == 2:
            continue  # image 102: no annotations -> dropped from train
        annotations.append({
            "id": ann_id, "image_id": 100 + i, "category_id": 7,
            "bbox": [2, 2, 6, 6], "area": 36.0, "iscrowd": 0,
            "segmentation": [[2, 2, 8, 2, 8, 8, 2, 8]],
        })
        ann_id += 1
    with open(tmp_path / "annotations" / "instances_train2017.json", "w") as f:
        json.dump({"images": images, "annotations": annotations,
                   "categories": [{"id": 7, "name": "thing"}]}, f)
    return tmp_path


def test_get_coco_builder_and_roundtrip(coco_tree):
    ds, idx = get_coco(str(coco_tree), "train")
    assert len(ds) == 4
    assert idx == [0, 1, 3]  # unannotated image dropped for train
    img, t = ds[0]
    assert img.shape == (16, 20, 3)
    assert t["labels"].tolist() == [7]
    np.testing.assert_allclose(t["boxes"][0], [2, 2, 8, 8])
    assert t["masks"][0].sum() == 36

    # dataset -> COCO index roundtrip (convert_to_coco_api semantics)
    index = dataset_to_coco_index(ds, idx)
    assert sorted(index.imgs) == [100, 101, 103]
    assert min(index.anns) == 1  # ids start at 1
    ann = index.load_anns(index.get_ann_ids(100))[0]
    np.testing.assert_allclose(ann["bbox"], [2, 2, 6, 6])
    assert rle_area(ann["segmentation"]) == 36
    assert [c["id"] for c in index.dataset["categories"]] == [7]

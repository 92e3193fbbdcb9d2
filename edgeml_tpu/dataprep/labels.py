"""Annotation converters: COCO JSON / VOC XML -> YOLO-format label .txt files.

Format parity with /root/reference/data_processing/label.py:9-88 — one
"{cls} {x} {y} {w} {h}" line per object, normalized xywh-center coordinates.
Differences from the reference implementation:
  * COCO JSON is parsed with the stdlib `json` module instead of the
    pycocotools C extension (SURVEY.md native-code ledger item 3);
  * both converters accept explicit (year, image_set) pairs so they are
    usable for single splits, with the reference's defaults preserved.
"""

from __future__ import annotations

import json
import os
import xml.etree.ElementTree as ET
from pathlib import Path

VOC_CLASS_NAMES = [
    "aeroplane", "bicycle", "bird", "boat", "bottle", "bus", "car", "cat",
    "chair", "cow", "diningtable", "dog", "horse", "motorbike", "person",
    "pottedplant", "sheep", "sofa", "train", "tvmonitor",
]

COCO_SPLITS = (("2017", "train"), ("2017", "val"))
VOC_SPLITS = (
    ("2012", "train"), ("2012", "val"),
    ("2007", "train"), ("2007", "val"), ("2007", "test"),
)


def coco_label(data_dir: str, save_dir: str, splits=COCO_SPLITS) -> None:
    """Convert COCO instance annotations to per-image YOLO label files.

    Class ids are compacted to the 0..79 range by their index in the sorted
    category-id list, matching the reference's `cls_ids.index(...)` behavior
    (label.py:25-41, where pycocotools' getCatIds returns sorted ids).
    Bounding boxes are (x_topleft, y_topleft, w, h) in COCO, converted to
    normalized center-xywh.
    """
    for year, image_set in splits:
        lbs_path = os.path.join(save_dir, f"{image_set}{year}")
        Path(lbs_path).mkdir(parents=True, exist_ok=True)
        anno_path = os.path.join(
            data_dir, "annotations", f"instances_{image_set}{year}.json"
        )
        with open(anno_path) as f:
            anno = json.load(f)
        cat_ids = sorted(c["id"] for c in anno["categories"])
        cat_index = {cid: i for i, cid in enumerate(cat_ids)}
        per_image: dict[int, list] = {img["id"]: [] for img in anno["images"]}
        for obj in anno.get("annotations", []):
            per_image.setdefault(obj["image_id"], []).append(obj)
        for img in anno["images"]:
            name = img["file_name"].split(".")[0]
            w, h = img["width"], img["height"]
            lines = []
            for obj in per_image.get(img["id"], []):
                bx, by, bw, bh = obj["bbox"]
                row = (
                    cat_index[obj["category_id"]],
                    (bx + bw / 2) / w,
                    (by + bh / 2) / h,
                    bw / w,
                    bh / h,
                )
                lines.append(" ".join(str(a) for a in row))
            with open(os.path.join(lbs_path, f"{name}.txt"), "w") as out:
                out.write("\n".join(lines) + ("\n" if lines else ""))


def voc_label(data_dir: str, save_dir: str, splits=VOC_SPLITS) -> None:
    """Convert Pascal VOC XML annotations to per-image YOLO label files.

    Skips objects marked difficult and classes outside the 20-class list;
    applies the reference's center convention ((xmin+xmax)/2 - 1 before
    normalization, label.py:58-62).
    """
    devkit = os.path.join(data_dir, "VOCdevkit")
    for year, image_set in splits:
        lbs_path = os.path.join(save_dir, f"{image_set}{year}")
        Path(lbs_path).mkdir(parents=True, exist_ok=True)
        ids_file = os.path.join(
            devkit, f"VOC{year}/ImageSets/Main/{image_set}.txt"
        )
        with open(ids_file) as f:
            img_ids = f.read().strip().split()
        for img_id in img_ids:
            rows = parse_voc_xml(
                os.path.join(devkit, f"VOC{year}/Annotations/{img_id}.xml")
            )
            lines = [" ".join(str(a) for a in row) for row in rows]
            with open(os.path.join(lbs_path, f"{img_id}.txt"), "w") as out:
                out.write("\n".join(lines) + ("\n" if lines else ""))


def parse_voc_xml(xml_path: str) -> list:
    """One VOC annotation XML -> YOLO-normalized rows
    (cls, x, y, w, h), difficult objects and non-VOC classes skipped,
    with the reference's center convention ((xmin+xmax)/2 - 1, label.py:58-62)."""
    root = ET.parse(xml_path).getroot()
    size = root.find("size")
    w = int(size.find("width").text)
    h = int(size.find("height").text)
    rows = []
    for obj in root.iter("object"):
        cls = obj.find("name").text
        difficult = int(obj.find("difficult").text)
        if cls not in VOC_CLASS_NAMES or difficult == 1:
            continue
        bb = obj.find("bndbox")
        xmin, xmax, ymin, ymax = (
            float(bb.find(k).text) for k in ("xmin", "xmax", "ymin", "ymax")
        )
        rows.append(
            (
                VOC_CLASS_NAMES.index(cls),
                ((xmin + xmax) / 2.0 - 1) / w,
                ((ymin + ymax) / 2.0 - 1) / h,
                (xmax - xmin) / w,
                (ymax - ymin) / h,
            )
        )
    return rows


def voc_examples(voc_root: str, splits=VOC_SPLITS):
    """(image_paths, labels) straight from a VOCdevkit tree — the reference
    trainer's raw VOCDetection consumption (torch_models/train.py:70-76)
    without the label-conversion stage. labels are (cls (n,), xyxy (n, 4))
    pairs in normalized coordinates (the load_data convention)."""
    import numpy as np

    devkit = (
        voc_root
        if os.path.basename(os.path.normpath(voc_root)) == "VOCdevkit"
        else os.path.join(voc_root, "VOCdevkit")
    )
    paths, labels = [], []
    for year, image_set in splits:
        ids_file = os.path.join(devkit, f"VOC{year}/ImageSets/Main/{image_set}.txt")
        with open(ids_file) as f:
            img_ids = f.read().strip().split()
        for img_id in img_ids:
            rows = np.asarray(
                parse_voc_xml(
                    os.path.join(devkit, f"VOC{year}/Annotations/{img_id}.xml")
                ),
                np.float32,
            ).reshape(-1, 5)
            cls = rows[:, 0]
            x, y, bw, bh = rows[:, 1], rows[:, 2], rows[:, 3], rows[:, 4]
            xyxy = np.stack(
                [x - bw / 2, y - bh / 2, x + bw / 2, y + bh / 2], axis=1
            )
            paths.append(
                os.path.join(devkit, f"VOC{year}/JPEGImages/{img_id}.jpg")
            )
            labels.append((cls, xyxy))
    return paths, labels

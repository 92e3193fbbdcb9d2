"""Label converters: COCO json and VOC xml -> YOLO txt round trips."""

import json
import os

import numpy as np

from edgeml_tpu.dataprep import coco_label, voc_label


def test_coco_label_conversion(tmp_path):
    data = tmp_path / "coco"
    (data / "annotations").mkdir(parents=True)
    anno = {
        "images": [
            {"id": 7, "file_name": "000001.jpg", "width": 200, "height": 100},
            {"id": 9, "file_name": "000002.jpg", "width": 100, "height": 100},
        ],
        "categories": [{"id": 5, "name": "b"}, {"id": 2, "name": "a"}],
        "annotations": [
            {"image_id": 7, "category_id": 5, "bbox": [20, 10, 40, 30]},
            {"image_id": 7, "category_id": 2, "bbox": [0, 0, 10, 10]},
        ],
    }
    with open(data / "annotations" / "instances_val2017.json", "w") as f:
        json.dump(anno, f)
    out = tmp_path / "labels"
    coco_label(str(data), str(out), splits=(("2017", "val"),))
    rows = (out / "val2017" / "000001.txt").read_text().strip().splitlines()
    assert len(rows) == 2
    c, x, y, w, h = rows[0].split()
    # category 5 is index 1 in the sorted id list [2, 5]
    assert c == "1"
    assert float(x) == (20 + 40 / 2) / 200
    assert float(y) == (10 + 30 / 2) / 100
    assert float(w) == 40 / 200 and float(h) == 30 / 100
    # image with no annotations still gets an (empty) file
    assert (out / "val2017" / "000002.txt").read_text() == ""


def test_voc_label_conversion(tmp_path):
    devkit = tmp_path / "voc" / "VOCdevkit" / "VOC2007"
    (devkit / "ImageSets" / "Main").mkdir(parents=True)
    (devkit / "Annotations").mkdir(parents=True)
    (devkit / "ImageSets" / "Main" / "val.txt").write_text("000042\n")
    (devkit / "Annotations" / "000042.xml").write_text(
        """<annotation>
  <size><width>200</width><height>100</height><depth>3</depth></size>
  <object><name>dog</name><difficult>0</difficult>
    <bndbox><xmin>20</xmin><xmax>60</xmax><ymin>10</ymin><ymax>40</ymax></bndbox>
  </object>
  <object><name>cat</name><difficult>1</difficult>
    <bndbox><xmin>0</xmin><xmax>10</xmax><ymin>0</ymin><ymax>10</ymax></bndbox>
  </object>
  <object><name>unicorn</name><difficult>0</difficult>
    <bndbox><xmin>0</xmin><xmax>10</xmax><ymin>0</ymin><ymax>10</ymax></bndbox>
  </object>
</annotation>"""
    )
    out = tmp_path / "labels"
    voc_label(str(tmp_path / "voc"), str(out), splits=(("2007", "val"),))
    rows = (out / "val2007" / "000042.txt").read_text().strip().splitlines()
    # difficult and unknown-class objects are skipped
    assert len(rows) == 1
    c, x, y, w, h = rows[0].split()
    assert c == "11"  # 'dog' index in the VOC class list
    # reference center convention: ((xmin+xmax)/2 - 1) / W
    assert float(x) == ((20 + 60) / 2 - 1) / 200
    assert float(y) == ((10 + 40) / 2 - 1) / 100
    assert float(w) == 40 / 200 and float(h) == 30 / 100

"""Dump (key, shape) manifests of real torch detector checkpoints to JSON.

Run this in an environment WITH torchvision / ultralytics installed (neither
exists in the CI image — docs/DIVERGENCES.md item 9) and commit the outputs to
tests/fixtures/manifests/. tests/test_torch_import.py then validates that
every importer consumes the REAL checkpoint layout slot-for-slot, shape-for-
shape, without needing the weights themselves.

Usage:
    python tools/dump_torch_manifest.py OUT_DIR [family ...]

Families: ssd, retinanet, faster_rcnn, yolov5n (default: all four).
"""

import json
import os
import sys


def dump(family: str, out_dir: str):
    if family == "yolov5n":
        import torch

        model = torch.hub.load("ultralytics/yolov5", "yolov5n", autoshape=False)
        sd = model.state_dict()
    else:
        import torchvision

        ctor = {
            "ssd": torchvision.models.detection.ssdlite320_mobilenet_v3_large,
            "retinanet": torchvision.models.detection.retinanet_resnet50_fpn_v2,
            "faster_rcnn": torchvision.models.detection.fasterrcnn_resnet50_fpn_v2,
        }[family]
        sd = ctor(weights="DEFAULT").state_dict()
    manifest = [[k, list(v.shape)] for k, v in sd.items()]
    path = os.path.join(out_dir, f"{family}.json")
    with open(path, "w") as f:
        json.dump(manifest, f, indent=0)
    print(f"{family}: {len(manifest)} tensors -> {path}")


if __name__ == "__main__":
    out = sys.argv[1]
    os.makedirs(out, exist_ok=True)
    for fam in sys.argv[2:] or ["ssd", "retinanet", "faster_rcnn", "yolov5n"]:
        dump(fam, out)

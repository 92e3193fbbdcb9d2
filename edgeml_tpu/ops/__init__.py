from .metrics import xywh2xyxy, box_iou, box_correct, pad_rows
from .map_kernel import DetectionPool, map_from_masks, ap_interp101

__all__ = [
    "xywh2xyxy",
    "box_iou",
    "box_correct",
    "pad_rows",
    "DetectionPool",
    "map_from_masks",
    "ap_interp101",
]

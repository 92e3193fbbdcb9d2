from .split import split_dataset
from .labels import coco_label, voc_label, VOC_CLASS_NAMES

__all__ = ["split_dataset", "coco_label", "voc_label", "VOC_CLASS_NAMES"]

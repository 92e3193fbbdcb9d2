from .yolov5 import YoloV5, YOLOV5_VARIANTS
from . import common

__all__ = ["YoloV5", "YOLOV5_VARIANTS", "common"]

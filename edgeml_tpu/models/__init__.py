from .yolov5 import YoloV5, YOLOV5_VARIANTS
from . import common

__all__ = ["YoloV5", "YOLOV5_VARIANTS", "common"]


def __getattr__(name):
    # Lazy family imports keep `import edgeml_tpu.models` light.
    if name == "SSDLite":
        from .ssdlite import SSDLite

        return SSDLite
    if name == "RetinaNet":
        from .retinanet import RetinaNet

        return RetinaNet
    if name == "FasterRCNN":
        from .faster_rcnn import FasterRCNN

        return FasterRCNN
    raise AttributeError(name)

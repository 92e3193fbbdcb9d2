"""Detection evaluator: COCO-style AP summary on the batched mAP kernel.

Functional counterpart of the reference's vendored CocoEvaluator
(/root/reference/torch_models/references/coco_eval.py:13-192 +
engine.py:75-115), rebuilt without the pycocotools C extension: per-image
detections and ground truth accumulate on host; `summarize()` runs ONE
vmapped evaluation of the detection pool at the 10 COCO IoU thresholds and
reports AP@[.5:.95], AP@.5 and AP@.75.

Cross-process behavior mirrors coco_eval.py:157-176: `synchronize_between_
processes` all-gathers every process's accumulated images before summarizing.

Two scoring styles:

  * style="greedy" (default, throughput path): greedy highest-IoU matching —
    the yolov5 convention used across this framework — scored in ONE call of
    the batched mAP kernel. No crowd handling or area/maxDets breakdowns.
  * style="coco" (exactness path): full COCOeval bbox semantics — score-
    sorted per-category matching, iscrowd ignores, area ranges, maxDets
    1/10/100 — via edgeml_tpu.coco_matching on host. Use this when numbers
    must be comparable to published torchvision/COCO results.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .data.io import _batched_correct
from .ops.map_kernel import build_pool, map_per_threshold

COCO_IOUV = np.round(np.linspace(0.5, 0.95, 10), 2)


class DetectionEvaluator:
    """Accumulate (detections, ground truth) per image; summarize dataset AP."""

    def __init__(self, iouv=None, style: str = "greedy", iou_type: str = "bbox"):
        assert style in ("greedy", "coco"), style
        assert iou_type in ("bbox", "segm", "keypoints"), iou_type
        if iou_type != "bbox" and style != "coco":
            raise ValueError(
                f"{iou_type} evaluation runs through the COCOeval-parity "
                "path; construct with style='coco'"
            )
        self.iouv = np.asarray(iouv if iouv is not None else COCO_IOUV)
        self.style = style
        self.iou_type = iou_type
        self.dets = []  # per image: (cls (n,), xyxy (n, 4), conf (n,)[, masks])
        self.gts = []  # per image: (cls (m,), xyxy (m, 4)[, iscrowd][, masks])

    def update(self, detections, ground_truths):
        """Add a batch. detections: iterable of (cls, boxes xyxy, conf);
        ground_truths: iterable of (cls, boxes xyxy) or (cls, boxes xyxy,
        iscrowd) — the crowd flag participates only in style="coco".
        With iou_type="segm", detections carry a 4th element and ground
        truths a 4th element after iscrowd: per-instance masks as an
        (n, H, W) bool array or a list of COCO RLE dicts. With
        iou_type="keypoints" (the reference CocoEvaluator's third dispatch,
        coco_eval.py:63-64), the 4th elements are (n, K, 3) keypoint arrays
        and ground truths may append (m,) object areas.
        Coordinates must share one frame; style="coco" area ranges assume
        pixels."""

        def store(t, n_std):
            t = tuple(t)
            # masks may be RLE dict lists — keep payloads past the standard
            # array fields untouched
            return tuple(np.asarray(x) for x in t[:n_std]) + t[n_std:]

        for d, g in zip(detections, ground_truths):
            self.dets.append(store(d, 3))
            self.gts.append(store(g, 3))

    def synchronize_between_processes(self):
        """All-gather every process's accumulated images (ordered by process
        index) before summarizing — the reference's coco_eval.py:157-176 merge,
        as a pickle-based uint8 allgather (the payloads are ragged)."""
        if jax.process_count() == 1:
            return
        from .parallel.mesh import allgather_object

        gathered = allgather_object((self.dets, self.gts))
        self.dets = [d for dets, _ in gathered for d in dets]
        self.gts = [g for _, gts in gathered for g in gts]

    def summarize(self, verbose: bool = True) -> dict:
        """Returns {'map': AP@[.5:.95], 'map50': AP@.5, 'map75': AP@.75, ...};
        style="coco" adds area-range and maxDets stats (COCOeval's 12)."""
        if self.style == "coco":
            return self._summarize_coco(verbose)
        det_list = [
            (c.astype(int), b.reshape(-1, 4), s) if len(c) else ()
            for c, b, s in self.dets
        ]
        gt_list = [
            (g[0].astype(int), g[1].reshape(-1, 4)) if len(g[0]) else ()
            for g in self.gts  # g may carry an iscrowd flag (coco style only)
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
        # ONE kernel call: the (C, T) AP matrix is reduced per threshold
        aps = np.asarray(map_per_threshold(pool, ones, zeros, ones))
        result = {
            "map": float(np.nanmean(aps)),
            "map50": float(aps[0]),
            "map75": float(aps[5]) if len(aps) > 5 else float("nan"),
            "per_iou": aps,
        }
        if verbose:
            self._print_summary(result)
        return result

    def _summarize_coco(self, verbose: bool) -> dict:
        from .coco_matching import evaluate_coco

        result = evaluate_coco(
            self.dets, self.gts, iouv=self.iouv, iou_type=self.iou_type
        )
        if verbose:
            self._print_summary(result)
            lines = [
                f"Average Precision (AP) @[ area={name:>6s} ] = {result[k]:.3f}"
                for name in ("small", "medium", "large")
                if (k := f"map_{name}") in result
            ] + [
                f"Average Recall    (AR) @[ maxDets={k.split('_')[1]:>3s} ] "
                f"= {result[k]:.3f}"
                for k in result
                if k.startswith("mar_") and k.split("_")[1].isdigit()
            ]
            print("\n".join(lines))
        return result

    @staticmethod
    def _print_summary(result):
        print(
            f"Average Precision (AP) @[ IoU=0.50:0.95 ] = {result['map']:.3f}\n"
            f"Average Precision (AP) @[ IoU=0.50      ] = {result['map50']:.3f}\n"
            f"Average Precision (AP) @[ IoU=0.75      ] = {result['map75']:.3f}"
        )

"""Independent NumPy oracle for detection metrics, written from the math spec.

This is a straight-line, loop-heavy implementation of the behavior documented
in SURVEY.md sections 2/C1 and C5 (greedy IoU matching, per-class PR curves,
101-point COCO interpolation, ensemble-mAP rewards). It exists only to verify
the JAX kernels; it is deliberately slow and structured differently from both
the production code and the reference.
"""

from __future__ import annotations

import numpy as np

EPS = 1e-16


def iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """IoU between (m, 4) and (n, 4) xyxy boxes, elementwise loops."""
    m, n = len(a), len(b)
    out = np.zeros((m, n))
    for i in range(m):
        for j in range(n):
            ix1 = max(a[i, 0], b[j, 0])
            iy1 = max(a[i, 1], b[j, 1])
            ix2 = min(a[i, 2], b[j, 2])
            iy2 = min(a[i, 3], b[j, 3])
            inter = max(ix2 - ix1, 0.0) * max(iy2 - iy1, 0.0)
            area_a = (a[i, 2] - a[i, 0]) * (a[i, 3] - a[i, 1])
            area_b = (b[j, 2] - b[j, 0]) * (b[j, 3] - b[j, 1])
            out[i, j] = inter / (area_a + area_b - inter)
    return out


def greedy_match(det_boxes, det_cls, lab_boxes, lab_cls, iou_thresholds):
    """True-positive matrix via the documented greedy matching rule.

    Per threshold: take all class-matching pairs with IoU >= t; give every
    detection its highest-IoU label; then give every label, among the
    detections that chose it, the one with the smallest detection index.
    """
    n, t = len(det_cls), len(iou_thresholds)
    tp = np.zeros((n, t), bool)
    if n == 0 or len(lab_cls) == 0:
        return tp
    iou = iou_matrix(np.asarray(lab_boxes, float), np.asarray(det_boxes, float))
    for ti, thr in enumerate(iou_thresholds):
        pairs = []  # (iou, label, det)
        for i in range(len(lab_cls)):
            for j in range(n):
                if lab_cls[i] == det_cls[j] and iou[i, j] >= thr:
                    pairs.append((iou[i, j], i, j))
        # each detection keeps its best pair
        best_for_det = {}
        for v, i, j in pairs:
            if j not in best_for_det or v > best_for_det[j][0]:
                best_for_det[j] = (v, i)
        # each label keeps the smallest-index detection that chose it
        chosen_det = {}
        for j in sorted(best_for_det):
            _, i = best_for_det[j]
            if i not in chosen_det:
                chosen_det[i] = j
        for j in chosen_det.values():
            tp[j, ti] = True
    return tp


def average_precision(recall_pts, precision_pts) -> float:
    """101-point interpolated AP with sentinel points and precision envelope."""
    xs = np.concatenate(([0.0], recall_pts, [1.0]))
    ys = np.concatenate(([1.0], precision_pts, [0.0]))
    # envelope: running max from the right
    for k in range(len(ys) - 2, -1, -1):
        ys[k] = max(ys[k], ys[k + 1])
    grid = np.linspace(0, 1, 101)
    return float(np.trapezoid(np.interp(grid, xs, ys), grid))


def map_of_detections(tp, conf, pred_cls, target_cls) -> np.ndarray:
    """Per-(class, threshold) AP table over classes present in target_cls.

    tp: (n, t) bool; conf: (n,); pred_cls: (n,); target_cls: (m,).
    """
    order = np.argsort(-np.asarray(conf, float), kind="stable")
    tp = np.asarray(tp, bool)[order]
    pred_cls = np.asarray(pred_cls)[order]
    classes, counts = np.unique(np.asarray(target_cls), return_counts=True)
    t = tp.shape[1] if tp.ndim == 2 else 1
    ap = np.zeros((len(classes), t))
    for ci, c in enumerate(classes):
        sel = pred_cls == c
        if not sel.any():
            continue
        for ti in range(t):
            flags = tp[sel, ti].astype(float)
            tpc = np.cumsum(flags)
            fpc = np.cumsum(1.0 - flags)
            rec = tpc / (counts[ci] + EPS)
            prec = tpc / (tpc + fpc)
            ap[ci, ti] = average_precision(rec, prec)
    return ap


def masked_map(weak, strong, labels, weak_sel, strong_sel, label_sel) -> float:
    """Dataset mAP of a masked pool — the oracle twin of map_from_masks.

    weak/strong: per-image (tp, conf, cls) triples; labels: per-image class
    vectors. Returns np.nan when no selected image has labels.
    """
    tp_l, conf_l, cls_l, tgt = [], [], [], []
    for i in range(len(labels)):
        if weak_sel[i] and len(weak[i][2]) > 0:
            tp_l.append(weak[i][0])
            conf_l.append(weak[i][1])
            cls_l.append(weak[i][2])
        if strong_sel[i] and len(strong[i][2]) > 0:
            tp_l.append(strong[i][0])
            conf_l.append(strong[i][1])
            cls_l.append(strong[i][2])
        if label_sel[i]:
            tgt.append(np.asarray(labels[i]).reshape(-1))
    tgt = np.concatenate(tgt) if tgt else np.zeros(0)
    if len(tgt) == 0:
        return float("nan")
    if not tp_l:
        return 0.0
    ap = map_of_detections(
        np.concatenate(tp_l),
        np.concatenate(conf_l),
        np.concatenate(cls_l),
        tgt,
    )
    return float(np.mean(ap))


def make_random_dataset(rng, n_img=12, n_cls=5, max_det=6, max_lab=5, t=1):
    """Random weak/strong/labels triples in set_data's output format.

    TP flags are consistent with greedy matching: per image, per class, per
    IoU threshold, at most as many TPs as ground-truth labels of that class
    (recall can never exceed 1 — real matchers guarantee this).
    """
    weak, strong, labels = [], [], []
    for _ in range(n_img):
        m = rng.integers(0, max_lab + 1)
        lab = rng.integers(0, n_cls, size=m)
        labels.append(lab)
        for out in (weak, strong):
            n = rng.integers(0, max_det + 1)
            cls = rng.integers(0, n_cls, size=n)
            tp = np.zeros((n, t), bool)
            if m > 0 and n > 0:
                tp = rng.random((n, t)) < 0.45
                for c in range(n_cls):
                    cap = int(np.sum(lab == c))
                    rows = np.nonzero(cls == c)[0]
                    for ti in range(t):
                        hot = rows[tp[rows, ti]]
                        if len(hot) > cap:
                            tp[rng.permutation(hot)[cap:], ti] = False
            out.append((tp, np.round(rng.random(n), 6), cls))
    return weak, strong, labels

"""DetectionEvaluator: COCO-style AP summary vs the NumPy oracle."""

import numpy as np
import pytest

from edgeml_tpu.eval_coco import DetectionEvaluator, COCO_IOUV
from oracle import greedy_match, map_of_detections


def make_scene(rng, n_img=6, n_cls=3):
    dets, gts = [], []
    for _ in range(n_img):
        m = rng.integers(1, 4)
        g_cls = rng.integers(0, n_cls, m)
        g_xy = rng.uniform(0.1, 0.6, (m, 2))
        g_wh = rng.uniform(0.1, 0.3, (m, 2))
        g_boxes = np.concatenate([g_xy, g_xy + g_wh], 1)
        gts.append((g_cls, g_boxes))
        n = rng.integers(1, 5)
        # half the detections roughly track a GT box
        d_boxes, d_cls = [], []
        for j in range(n):
            if j < m and rng.random() < 0.7:
                jitter = rng.normal(0, 0.02, 4)
                d_boxes.append(g_boxes[j] + jitter)
                d_cls.append(g_cls[j])
            else:
                xy = rng.uniform(0.1, 0.6, 2)
                wh = rng.uniform(0.1, 0.3, 2)
                d_boxes.append(np.concatenate([xy, xy + wh]))
                d_cls.append(rng.integers(0, n_cls))
        dets.append(
            (np.array(d_cls), np.array(d_boxes), rng.uniform(0.2, 1.0, n))
        )
    return dets, gts


def test_evaluator_matches_oracle():
    rng = np.random.default_rng(0)
    dets, gts = make_scene(rng)
    ev = DetectionEvaluator()
    ev.update(dets, gts)
    res = ev.summarize(verbose=False)

    # Oracle: per threshold, concatenate everything and run ap_per_class.
    aps = []
    for thr in COCO_IOUV:
        tp_l, conf_l, cls_l, tgt = [], [], [], []
        for (dc, db, ds), (gc, gb) in zip(dets, gts):
            tp = greedy_match(db, dc, gb, gc, np.array([thr]))
            tp_l.append(tp)
            conf_l.append(ds)
            cls_l.append(dc)
            tgt.append(gc)
        table = map_of_detections(
            np.concatenate(tp_l), np.concatenate(conf_l),
            np.concatenate(cls_l), np.concatenate(tgt),
        )
        aps.append(float(np.mean(table)))
    assert res["map50"] == pytest.approx(aps[0], abs=3e-5)
    assert res["map75"] == pytest.approx(aps[5], abs=3e-5)
    assert res["map"] == pytest.approx(np.mean(aps), abs=3e-5)
    assert 0 < res["map"] <= res["map50"] <= 1

"""COCOeval-parity scorer: hand-computed cases transcribed from the COCOeval
bbox semantics (/root/reference/torch_models/references/coco_eval.py wraps
pycocotools; the C extension is absent here, so expectations are derived by
hand from the published algorithm)."""

import numpy as np
import pytest

from edgeml_tpu.coco_matching import evaluate_coco, iou_xyxy, match_image
from edgeml_tpu.eval_coco import DetectionEvaluator


def box(x, y, w, h):
    return [x, y, x + w, y + h]


def test_perfect_detections_ap1():
    gts = [(np.array([0, 1]), np.array([box(0, 0, 10, 10), box(20, 20, 5, 5)]))]
    dets = [(
        np.array([0, 1]),
        np.array([box(0, 0, 10, 10), box(20, 20, 5, 5)]),
        np.array([0.9, 0.8]),
    )]
    r = evaluate_coco(dets, gts)
    assert r["map"] == pytest.approx(1.0)
    assert r["mar_100"] == pytest.approx(1.0)


def test_single_fp_then_tp_pr_curve():
    """One gt; a higher-scored miss then an exact match. At every IoU
    threshold: visiting in score order, the FP comes first, so the precision
    envelope is [.., 0.5 ..] at all recalls -> AP = 0.5 (101-pt)."""
    gts = [(np.array([0]), np.array([box(0, 0, 10, 10)]))]
    dets = [(
        np.array([0, 0]),
        np.array([box(50, 50, 10, 10), box(0, 0, 10, 10)]),
        np.array([0.9, 0.3]),
    )]
    r = evaluate_coco(dets, gts)
    assert r["map50"] == pytest.approx(0.5)
    assert r["map"] == pytest.approx(0.5)


def test_score_order_beats_iou_order():
    """COCOeval matches in SCORE order: the higher-scored detection takes the
    gt even when a lower-scored one overlaps more. The greedy style (ours)
    would give the gt to the better-IoU detection. This case separates them."""
    gt_box = box(0, 0, 10, 10)
    # det A: score .9, IoU ~ .6; det B: score .5, IoU ~ .9
    det_a = box(0, 0, 10, 6.0)
    det_b = box(0, 0, 10, 9.0)
    gts = [(np.array([0]), np.array([gt_box]))]
    dets = [(np.array([0, 0]), np.array([det_a, det_b]), np.array([0.9, 0.5]))]
    r = evaluate_coco(dets, gts, iouv=np.array([0.5]))
    # A matches (IoU .6 >= .5), B is an FP: PR pairs (1.0, tp) then fp ->
    # precision envelope 1.0 up to recall 1.0 => AP = 1.0
    assert r["map"] == pytest.approx(1.0)
    # at IoU .75 only B clears the bar; A stays unmatched FP ranked first
    r75 = evaluate_coco(dets, gts, iouv=np.array([0.75]))
    assert r75["map"] == pytest.approx(0.5)


def test_crowd_absorbs_without_counting():
    """A crowd gt is ignored: it does not add recall mass, and detections
    matching it are neither TP nor FP. One real gt + one crowd region;
    two dets each covering one -> AP = 1 (the crowd det vanishes)."""
    gts = [(
        np.array([0, 0]),
        np.array([box(0, 0, 10, 10), box(100, 100, 50, 50)]),
        np.array([0, 1]),
    )]
    dets = [(
        np.array([0, 0]),
        np.array([box(100, 110, 20, 20), box(0, 0, 10, 10)]),  # inside crowd; exact
        np.array([0.95, 0.9]),
    )]
    r = evaluate_coco(dets, gts)
    assert r["map"] == pytest.approx(1.0)
    # crowd IoU denominates by detection area: fully inside => 1.0
    m = iou_xyxy(
        np.array([box(100, 110, 20, 20)]),
        np.array([box(100, 100, 50, 50)]),
        np.array([True]),
    )
    assert m[0, 0] == pytest.approx(1.0)


def test_area_range_ignores():
    """A small gt (16 px^2) is ignored in the 'large' range; its matched
    detection must not become an FP there."""
    gts = [(
        np.array([0, 0]),
        np.array([box(0, 0, 4, 4), box(50, 50, 200, 200)]),
    )]
    dets = [(
        np.array([0, 0]),
        np.array([box(0, 0, 4, 4), box(50, 50, 200, 200)]),
        np.array([0.9, 0.8]),
    )]
    r = evaluate_coco(dets, gts)
    assert r["map"] == pytest.approx(1.0)
    assert r["map_large"] == pytest.approx(1.0)  # small det ignored, not FP
    assert r["map_small"] == pytest.approx(1.0)


def test_maxdets_caps_per_image():
    """maxDets=1 keeps only the top-scored detection per (image, category):
    with the top one an FP, recall@1 is 0; with maxDets>=2 the gt is found."""
    gts = [(np.array([0]), np.array([box(0, 0, 10, 10)]))]
    dets = [(
        np.array([0, 0]),
        np.array([box(50, 50, 10, 10), box(0, 0, 10, 10)]),
        np.array([0.9, 0.3]),
    )]
    r = evaluate_coco(dets, gts)
    assert r["mar_1"] == pytest.approx(0.0)
    assert r["mar_10"] == pytest.approx(1.0)


def test_absent_category_excluded_not_zero():
    """Categories with no gt anywhere are excluded from the mean (COCOeval's
    -1 convention), not scored as 0."""
    gts = [(np.array([0]), np.array([box(0, 0, 10, 10)]))]
    dets = [(
        np.array([0, 7]),  # class 7 has no gt: pure FP, excluded category
        np.array([box(0, 0, 10, 10), box(30, 30, 5, 5)]),
        np.array([0.9, 0.8]),
    )]
    r = evaluate_coco(dets, gts)
    assert r["map"] == pytest.approx(1.0)


def test_match_image_prefers_unignored():
    """A detection overlapping both an ignored and an unignored gt must take
    the unignored one, even at lower IoU, before considering ignored gts."""
    dt = np.array([box(0, 0, 10, 10)])
    gtb = np.array([box(0, 0, 10, 12), box(0, 0, 10, 10)])  # [unignored, crowd]
    crowd = np.array([False, True])
    matched, ignored, gt_ig = match_image(
        dt, gtb, crowd, np.array([0.5]), (0.0, 1e10)
    )
    assert matched[0, 0] and not ignored[0, 0]  # matched the real gt


def test_evaluator_style_dispatch():
    gts = [(np.array([0]), np.array([box(0, 0, 10, 10)]))]
    dets = [(
        np.array([0]), np.array([box(0, 0, 10, 10)]), np.array([0.9])
    )]
    # coco style: perfect detection scores exactly 1.0; greedy style follows
    # the reference's trapezoid-interp compute_ap (metrics.py:127-148), which
    # yields ~0.995 for a single perfect detection — a real style difference.
    ev = DetectionEvaluator(style="coco")
    ev.update(dets, gts)
    assert ev.summarize(verbose=False)["map"] == pytest.approx(1.0)
    ev = DetectionEvaluator(style="greedy")
    ev.update(dets, gts)
    greedy_map = ev.summarize(verbose=False)["map"]
    assert greedy_map == pytest.approx(0.995, abs=2e-3)
    # crowd-flagged gt tuples must not break the greedy path
    ev = DetectionEvaluator(style="greedy")
    ev.update(dets, [gts[0] + (np.array([0]),)])
    assert ev.summarize(verbose=False)["map"] == pytest.approx(greedy_map)

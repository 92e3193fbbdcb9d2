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


# ---------------------------------------------------------------------------
# segm IoU type (the reference CocoEvaluator's segm dispatch, coco_eval.py:31-42)
# ---------------------------------------------------------------------------


def rect_mask(h, w, x, y, bw, bh):
    m = np.zeros((h, w), bool)
    m[y : y + bh, x : x + bw] = True
    return m


def test_segm_equals_bbox_for_full_box_masks():
    """Masks that exactly fill integer-aligned boxes: mask IoU == box IoU and
    mask area == box area, so the full segm evaluation must reproduce bbox."""
    H = W = 64
    gb = [box(4, 4, 10, 10), box(30, 30, 8, 8)]
    db = [box(4, 4, 10, 10), box(31, 31, 8, 8), box(50, 2, 6, 6)]
    gts_m = np.stack([rect_mask(H, W, 4, 4, 10, 10), rect_mask(H, W, 30, 30, 8, 8)])
    dts_m = np.stack(
        [rect_mask(H, W, 4, 4, 10, 10), rect_mask(H, W, 31, 31, 8, 8),
         rect_mask(H, W, 50, 2, 6, 6)]
    )
    cls_g = np.array([0, 1])
    cls_d = np.array([0, 1, 1])
    sc = np.array([0.9, 0.8, 0.7])
    crowd = np.zeros(2, bool)

    r_box = evaluate_coco(
        [(cls_d, np.array(db), sc)], [(cls_g, np.array(gb), crowd)]
    )
    r_seg = evaluate_coco(
        [(cls_d, np.array(db), sc, dts_m)],
        [(cls_g, np.array(gb), crowd, gts_m)],
        iou_type="segm",
    )
    for k in ("map", "map50", "map75", "mar_100", "map_small"):
        assert r_seg[k] == pytest.approx(r_box[k], abs=1e-9), k


def test_segm_mask_overrides_box():
    """Same boxes, disjoint masks: bbox scores a TP, segm must score a FP."""
    H = W = 32
    b = box(0, 0, 16, 16)
    gt_m = rect_mask(H, W, 0, 0, 16, 8)      # top half
    dt_m = rect_mask(H, W, 0, 8, 16, 8)      # bottom half -> mask IoU 0
    r = evaluate_coco(
        [(np.array([0]), np.array([b]), np.array([0.9]), dt_m[None])],
        [(np.array([0]), np.array([b]), np.zeros(1, bool), gt_m[None])],
        iou_type="segm",
    )
    assert r["map50"] == pytest.approx(0.0)
    r_box = evaluate_coco(
        [(np.array([0]), np.array([b]), np.array([0.9]))],
        [(np.array([0]), np.array([b]))],
    )
    assert r_box["map50"] == pytest.approx(1.0)


def test_segm_area_ranges_use_mask_area():
    """A gt whose BOX is large but whose MASK is small must count in the
    'small' range under segm (area = pixel count, not box area)."""
    H = W = 96
    b = box(0, 0, 90, 90)  # box area 8100 -> 'large' by box
    gt_m = rect_mask(H, W, 0, 0, 10, 10)  # 100 px -> 'small' by mask
    dt_m = gt_m.copy()
    r = evaluate_coco(
        [(np.array([0]), np.array([b]), np.array([0.9]), dt_m[None])],
        [(np.array([0]), np.array([b]), np.zeros(1, bool), gt_m[None])],
        iou_type="segm",
    )
    assert r["map_small"] == pytest.approx(1.0)
    assert np.isnan(r["map_large"])  # no large-mask ground truth


def test_mask_iou_crowd_denominator():
    from edgeml_tpu.coco_matching import mask_iou

    dt = rect_mask(8, 8, 0, 0, 4, 4)[None]        # 16 px
    gt = rect_mask(8, 8, 0, 0, 8, 8)[None]        # 64 px, contains dt
    plain = mask_iou(dt, gt, np.zeros(1, bool))[0, 0]
    crowd = mask_iou(dt, gt, np.ones(1, bool))[0, 0]
    assert plain == pytest.approx(16 / 64)
    assert crowd == pytest.approx(1.0)  # intersection / dt area


def test_segm_accepts_rle_dicts_and_evaluator_wiring():
    from edgeml_tpu.dataprep.coco_dataset import rle_encode

    H = W = 24
    gt_m = rect_mask(H, W, 2, 2, 10, 10)
    dt_m = rect_mask(H, W, 2, 2, 10, 10)
    ev = DetectionEvaluator(style="coco", iou_type="segm")
    ev.update(
        [(np.array([0]), np.array([box(2, 2, 10, 10)]), np.array([0.9]),
          [rle_encode(dt_m)])],
        [(np.array([0]), np.array([box(2, 2, 10, 10)]), np.zeros(1, bool),
          [rle_encode(gt_m)])],
    )
    r = ev.summarize(verbose=False)
    assert r["map"] == pytest.approx(1.0)


def test_segm_requires_coco_style():
    with pytest.raises(ValueError):
        DetectionEvaluator(style="greedy", iou_type="segm")

# ---------------------------------------------------------------------------
# keypoints IoU type (the reference CocoEvaluator's keypoints dispatch,
# coco_eval.py:63-64 + prepare_for_coco_keypoint :125-148)
# ---------------------------------------------------------------------------


def kp(xy_v):
    """(K, 3) keypoint array from [(x, y, v), ...]."""
    return np.array(xy_v, float)


def test_oks_matrix_hand_value():
    """One labeled keypoint, sigma=.5 (var=1), gt area 100:
    OKS = exp(-d^2 / (2 * area)) averaged over LABELED keypoints only."""
    from edgeml_tpu.coco_matching import oks_matrix

    gt_k = kp([(0, 0, 2), (3, 4, 0)])[None]          # second kpt unlabeled
    dt_k = kp([(1, 0, 0), (9, 9, 0)])[None]          # dx=1 on the labeled one
    m = oks_matrix(
        dt_k, gt_k, np.array([100.0]), np.array([box(0, 0, 10, 10)]),
        sigmas=np.array([0.5, 0.5]),
    )
    assert m[0, 0] == pytest.approx(np.exp(-1.0 / 200.0), rel=1e-6)


def test_oks_unlabeled_gt_uses_expanded_box_extent():
    """A gt with no labeled keypoint penalizes detections by distance OUTSIDE
    the gt box expanded by its own size on each side: inside => OKS 1."""
    from edgeml_tpu.coco_matching import oks_matrix

    gt_k = kp([(0, 0, 0), (0, 0, 0)])[None]
    inside = kp([(15, 15, 0), (-5, -5, 0)])[None]    # within [-10, 20]
    outside = kp([(120, 0, 0), (0, 120, 0)])[None]
    gb = np.array([box(0, 0, 10, 10)])
    area = np.array([100.0])
    sig = np.array([0.5, 0.5])
    assert oks_matrix(inside, gt_k, area, gb, sigmas=sig)[0, 0] == pytest.approx(1.0)
    assert oks_matrix(outside, gt_k, area, gb, sigmas=sig)[0, 0] < 0.01


def test_keypoints_perfect_prediction_ap1():
    K = 17
    gk = np.stack([np.arange(K) * 3.0, np.arange(K) * 2.0,
                   np.full(K, 2.0)], axis=1)
    gts = [(np.array([0]), np.array([box(0, 0, 48, 32)]),
            np.zeros(1, bool), gk[None])]
    dets = [(np.array([0]), np.array([box(0, 0, 48, 32)]),
             np.array([0.9]), gk[None])]
    r = evaluate_coco(dets, gts, iou_type="keypoints")
    assert r["map"] == pytest.approx(1.0)
    assert r["mar_20"] == pytest.approx(1.0)
    # keypoint params: no 'small' range, maxDets capped at 20
    assert "map_small" not in r and "mar_100" not in r


def test_keypoints_far_prediction_fp():
    """All keypoints displaced by 20 px on a 100 px^2 gt with sigma .5:
    OKS = exp(-400/200) ~= .135 < .5 -> FP at every threshold."""
    gk = kp([(0, 0, 2), (5, 5, 2)])
    dk = gk.copy()
    dk[:, 0] += 20.0
    gts = [(np.array([0]), np.array([box(0, 0, 10, 10)]),
            np.zeros(1, bool), gk[None], np.array([100.0]))]
    dets = [(np.array([0]), np.array([box(0, 0, 10, 10)]),
             np.array([0.9]), dk[None])]
    r = evaluate_coco(dets, gts, iou_type="keypoints",
                      kpt_sigmas=np.array([0.5, 0.5]))
    assert r["map"] == pytest.approx(0.0)


def test_keypoints_unlabeled_gt_ignored():
    """A gt with zero labeled keypoints is ignored (COCOeval sets ignore when
    num_keypoints == 0): its matching detection is neither TP nor FP, and with
    no countable gt the category is excluded -> map is NaN."""
    gk = kp([(0, 0, 0), (5, 5, 0)])
    dk = kp([(1, 1, 0), (5, 5, 0)])                   # inside expanded box
    gts = [(np.array([0]), np.array([box(0, 0, 10, 10)]),
            np.zeros(1, bool), gk[None])]
    dets = [(np.array([0]), np.array([box(0, 0, 10, 10)]),
             np.array([0.9]), dk[None])]
    r = evaluate_coco(dets, gts, iou_type="keypoints",
                      kpt_sigmas=np.array([0.5, 0.5]))
    assert np.isnan(r["map"])


def test_keypoints_area_ranges_use_gt_area_payload():
    """The optional (m,) gt area element drives the range split (COCO gt
    'area' is the segmentation area, not the box area)."""
    gk = kp([(10, 10, 2), (30, 30, 2)])
    gts = [(np.array([0]), np.array([box(0, 0, 200, 200)]),  # large BOX
            np.zeros(1, bool), gk[None], np.array([50.0**2]))]  # medium AREA
    dets = [(np.array([0]), np.array([box(0, 0, 200, 200)]),
             np.array([0.9]), gk[None])]
    r = evaluate_coco(dets, gts, iou_type="keypoints",
                      kpt_sigmas=np.array([0.5, 0.5]))
    assert r["map_medium"] == pytest.approx(1.0)
    assert np.isnan(r["map_large"])


def test_keypoints_evaluator_wiring():
    K = 17
    gk = np.stack([np.arange(K) * 1.0, np.arange(K) * 1.0,
                   np.full(K, 2.0)], axis=1)
    ev = DetectionEvaluator(style="coco", iou_type="keypoints")
    ev.update(
        [(np.array([0]), np.array([box(0, 0, 16, 16)]), np.array([0.9]),
          gk[None])],
        [(np.array([0]), np.array([box(0, 0, 16, 16)]), np.zeros(1, bool),
          gk[None])],
    )
    assert ev.summarize(verbose=False)["map"] == pytest.approx(1.0)
    with pytest.raises(ValueError):
        DetectionEvaluator(style="greedy", iou_type="keypoints")

"""Unit tests for edgeml_tpu.ops.metrics against the independent oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from edgeml_tpu.ops.metrics import (
    xywh2xyxy,
    xyxy2xywh,
    box_iou,
    box_iou_safe,
    box_correct,
    pad_rows,
)
from oracle import iou_matrix, greedy_match


def random_boxes(rng, n):
    xy = rng.random((n, 2)) * 0.8 + 0.1
    wh = rng.random((n, 2)) * 0.3 + 0.02
    return np.concatenate([xy, wh], axis=1)


def test_xywh_roundtrip():
    rng = np.random.default_rng(0)
    x = random_boxes(rng, 17)
    y = np.asarray(xywh2xyxy(jnp.asarray(x)))
    # manual check
    assert np.allclose(y[:, 0], x[:, 0] - x[:, 2] / 2)
    assert np.allclose(y[:, 3], x[:, 1] + x[:, 3] / 2)
    back = np.asarray(xyxy2xywh(jnp.asarray(y)))
    assert np.allclose(back, x, atol=1e-6)


def test_box_iou_matches_oracle():
    rng = np.random.default_rng(1)
    a = np.asarray(xywh2xyxy(jnp.asarray(random_boxes(rng, 9))))
    b = np.asarray(xywh2xyxy(jnp.asarray(random_boxes(rng, 13))))
    got = np.asarray(box_iou(jnp.asarray(a), jnp.asarray(b)))
    want = iou_matrix(a, b)
    assert np.allclose(got, want, atol=1e-6)


def test_box_iou_identity():
    rng = np.random.default_rng(2)
    a = np.asarray(xywh2xyxy(jnp.asarray(random_boxes(rng, 5))))
    got = np.asarray(box_iou(jnp.asarray(a), jnp.asarray(a)))
    assert np.allclose(np.diag(got), 1.0, atol=1e-6)


def test_box_iou_safe_degenerate():
    z = jnp.zeros((1, 4))
    assert float(box_iou_safe(z, z)[0, 0]) == 0.0


@pytest.mark.parametrize("seed", range(25))
def test_box_correct_fuzz_vs_oracle(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(0, 9))
    m = int(rng.integers(0, 7))
    nc = int(rng.integers(1, 4))
    det = np.asarray(xywh2xyxy(jnp.asarray(random_boxes(rng, max(n, 1)))))[:n]
    lab = np.asarray(xywh2xyxy(jnp.asarray(random_boxes(rng, max(m, 1)))))[:m]
    det_cls = rng.integers(0, nc, size=n)
    lab_cls = rng.integers(0, nc, size=m)
    iouv = np.array([0.1, 0.25, 0.5])

    want = greedy_match(det, det_cls, lab, lab_cls, iouv)

    # padded invocation
    maxn, maxm = 12, 10
    db, dv = pad_rows(det, maxn)
    lb, lv = pad_rows(lab, maxm)
    dc, _ = pad_rows(det_cls, maxn, fill=-1)
    lc, _ = pad_rows(lab_cls, maxm, fill=-2)
    got = np.asarray(
        box_correct(
            jnp.asarray(db, jnp.float32),
            jnp.asarray(dc),
            jnp.asarray(dv),
            jnp.asarray(lb, jnp.float32),
            jnp.asarray(lc),
            jnp.asarray(lv),
            jnp.asarray(iouv, jnp.float32),
        )
    )
    assert got[n:].sum() == 0  # padding rows never TP
    assert np.array_equal(got[:n], want)


def test_box_correct_one_label_two_dets():
    # Two detections hitting the same label: only the higher-IoU one wins its
    # per-detection champion slot... both champion the same label, so the
    # smaller det index among candidates is correct.
    lab = jnp.asarray([[0.0, 0.0, 1.0, 1.0]])
    det = jnp.asarray([[0.0, 0.0, 1.0, 0.9], [0.0, 0.0, 1.0, 0.5]])
    got = np.asarray(
        box_correct(
            det,
            jnp.asarray([0, 0]),
            jnp.asarray([True, True]),
            lab,
            jnp.asarray([0]),
            jnp.asarray([True]),
            jnp.asarray([0.4]),
        )
    )
    assert got[0, 0] and not got[1, 0]


def test_box_correct_class_mismatch():
    lab = jnp.asarray([[0.0, 0.0, 1.0, 1.0]])
    det = jnp.asarray([[0.0, 0.0, 1.0, 1.0]])
    got = np.asarray(
        box_correct(
            det,
            jnp.asarray([1]),
            jnp.asarray([True]),
            lab,
            jnp.asarray([0]),
            jnp.asarray([True]),
            jnp.asarray([0.5]),
        )
    )
    assert not got.any()

"""Pallas fused NMS vs the XLA reference implementation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from edgeml_tpu.ops.nms import nms_rows
from edgeml_tpu.ops.nms_pallas import nms_pallas


@pytest.mark.parametrize("seed", range(4))
def test_pallas_nms_matches_xla(seed):
    rng = np.random.default_rng(seed)
    k = 128
    xy = rng.uniform(50, 500, (k, 2)).astype(np.float32)
    wh = rng.uniform(20, 120, (k, 2)).astype(np.float32)
    boxes = np.concatenate([xy, xy + wh], 1)
    scores = rng.uniform(0.0, 1.0, k).astype(np.float32)
    scores[rng.random(k) < 0.3] = 0.0  # gated-out rows
    cls = rng.integers(0, 3, k).astype(np.float32)

    want, want_v = nms_rows(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(cls),
        iou_thres=0.5, max_det=32, max_cand=k,
    )
    got, got_v = nms_pallas(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(cls),
        iou_thres=0.5, max_det=32,
    )
    want, got = np.asarray(want), np.asarray(got)
    assert np.array_equal(np.asarray(want_v), np.asarray(got_v))
    sel = np.asarray(want_v)
    assert np.allclose(got[sel, :4], want[sel, :4], atol=1e-2)
    assert np.allclose(got[sel, 4], want[sel, 4], atol=1e-6)
    assert np.array_equal(got[sel, 5], want[sel, 5])


def _greedy_numpy(boxes, scores, thres, max_det):
    """Independent sequential greedy NMS oracle (original index order ties)."""
    alive = scores > 0
    picks = []
    for _ in range(max_det):
        if not alive.any():
            break
        s = np.where(alive, scores, -np.inf)
        j = int(np.argmax(s))
        if s[j] <= 0:
            break
        picks.append(j)
        lo = np.maximum(boxes[j, :2], boxes[:, :2])
        hi = np.minimum(boxes[j, 2:], boxes[:, 2:])
        inter = np.prod(np.maximum(hi - lo, 0.0), -1)
        a = np.prod(np.maximum(boxes[j, 2:] - boxes[j, :2], 0.0))
        b = np.prod(np.maximum(boxes[:, 2:] - boxes[:, :2], 0.0), -1)
        iou = inter / np.maximum(a + b - inter, 1e-12)
        alive &= iou <= thres
    return picks


def test_fixpoint_suppression_chain():
    """A ladder of half-overlapping boxes in descending score order forces the
    longest possible suppression chain (kept/suppressed alternate); the
    fixpoint iteration must still converge to the exact greedy result."""
    k = 64
    boxes = np.stack(
        [
            np.arange(k, dtype=np.float32) * 6.0,
            np.zeros(k, np.float32),
            np.arange(k, dtype=np.float32) * 6.0 + 10.0,
            np.full(k, 10.0, np.float32),
        ],
        axis=1,
    )  # each box overlaps its neighbour with IoU ~ 0.25
    scores = np.linspace(1.0, 0.1, k).astype(np.float32)
    cls = np.zeros(k, np.float32)
    got, got_v = nms_rows(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(cls),
        iou_thres=0.2, max_det=k, max_cand=k,
    )
    picks = _greedy_numpy(boxes, scores, 0.2, k)
    got = np.asarray(got)[np.asarray(got_v)]
    assert len(picks) == len(got)
    assert np.allclose(got[:, :4], boxes[picks], atol=1e-6)
    assert np.allclose(got[:, 4], scores[picks], atol=1e-7)


@pytest.mark.parametrize("seed", range(4))
def test_blocked_greedy_matches_global_fixpoint(seed):
    """The blocked-greedy formulation (ops/nms.py NMS_BLOCK) must be
    bit-identical to the global fixpoint for every block size, including
    non-dividing ones (padding path) and long suppression chains (dense
    overlapping boxes)."""
    from edgeml_tpu.ops.nms import greedy_keep_mask

    rng = np.random.default_rng(200 + seed)
    k = [64, 100, 256, 1000][seed]
    c = rng.uniform(0, 100, (k, 2)).astype(np.float32)
    wh = rng.uniform(5, 80, (k, 2)).astype(np.float32)
    boxes = np.concatenate([c - wh / 2, c + wh / 2], 1)
    scores = rng.uniform(0.0, 1.0, k).astype(np.float32)
    scores[rng.random(k) < 0.1] = 0.0
    order = np.argsort(-scores, kind="stable")
    boxes, scores = jnp.asarray(boxes[order]), jnp.asarray(scores[order])
    want = np.asarray(greedy_keep_mask(boxes, scores, 0.5))
    for block in (32, 128, 256, 512):
        got = np.asarray(greedy_keep_mask(boxes, scores, 0.5, block=block))
        assert np.array_equal(want, got), block


@pytest.mark.parametrize("seed", range(3))
def test_suppress_mask_matches_pallas_oracle(seed):
    from edgeml_tpu.ops.nms import suppress_mask
    from edgeml_tpu.ops.nms_pallas import suppress_mask as pallas_mask

    rng = np.random.default_rng(100 + seed)
    k = 96
    xy = rng.uniform(0, 300, (k, 2)).astype(np.float32)
    wh = rng.uniform(10, 150, (k, 2)).astype(np.float32)
    boxes = jnp.asarray(np.concatenate([xy, xy + wh], 1))
    scores = rng.uniform(0.0, 1.0, k).astype(np.float32)
    scores[rng.random(k) < 0.25] = 0.0
    scores = jnp.asarray(scores)
    for max_keep in (8, k):
        want = np.asarray(pallas_mask(boxes, scores, 0.5, max_keep))
        got = np.asarray(suppress_mask(boxes, scores, 0.5, max_keep))
        assert np.array_equal(want, got)


@pytest.mark.parametrize("seed", range(6))
def test_topk1d_matches_lax_topk(seed):
    """Chunked exact top_k: bit-identical values AND indices (tie order)."""
    from edgeml_tpu.ops.nms import topk1d

    rng = np.random.default_rng(200 + seed)
    n = int(rng.integers(1000, 90001))
    k = int(rng.integers(1, min(n, 2000)))
    kind = seed % 3
    if kind == 0:
        x = rng.standard_normal(n).astype(np.float32)
    elif kind == 1:  # heavy ties incl. the gated -1 sentinel
        x = rng.choice([-1.0, -1.0, 0.25, 0.5, 0.5], n).astype(np.float32)
    else:  # nearly empty candidate set
        x = np.full(n, -1.0, np.float32)
        x[rng.choice(n, 7, replace=False)] = rng.random(7).astype(np.float32)
    xv = jnp.asarray(x)
    wv, wi = jax.lax.top_k(xv, k)
    gv, gi = topk1d(xv, k, chunk=4096)
    assert np.array_equal(np.asarray(wv), np.asarray(gv))
    assert np.array_equal(np.asarray(wi), np.asarray(gi))


def test_nms_split_keeps_best_pair_from_low_obj_box():
    """Adversarial pre-filter case: 2000 boxes with high objectness but tiny
    class scores, plus ONE box whose pair confidence dominates everything.
    Exact pair selection must surface that detection even though its box is
    far outside the top-max_cand by objectness."""
    from edgeml_tpu.ops.nms import nms_split

    n, nc = 2049, 4
    rng = np.random.default_rng(0)
    obj = np.full(n, 0.9, np.float32)
    cls = np.full((n, nc), 0.002, np.float32)
    xy = rng.uniform(100, 5000, (n, 2)).astype(np.float32)
    xywh = np.concatenate([xy, np.full((n, 2), 8.0, np.float32)], 1)
    # the needle: low obj, huge cls -> the single best pair (conf 0.45)
    obj[1234] = 0.5
    cls[1234, 2] = 0.9
    dets, valid = nms_split(
        jnp.asarray(obj), jnp.asarray(xywh), jnp.asarray(cls),
        conf_thres=0.001, iou_thres=0.5, max_det=300, max_cand=1024,
    )
    dets = np.asarray(dets)
    assert np.asarray(valid)[0]
    assert dets[0, 4] == np.float32(0.5 * 0.9)  # top detection IS the needle
    assert dets[0, 5] == 2.0


def test_topk1d_k_at_least_chunk():
    """k >= chunk must not recurse forever (keep ratio forced below 1/2)."""
    from edgeml_tpu.ops.nms import topk1d

    x = jnp.asarray(np.random.default_rng(0).random(30720).astype(np.float32))
    for k in (4096, 10240):
        wv, wi = jax.lax.top_k(x, k)
        gv, gi = topk1d(x, k, chunk=4096)
        assert np.array_equal(np.asarray(wv), np.asarray(gv))
        assert np.array_equal(np.asarray(wi), np.asarray(gi))

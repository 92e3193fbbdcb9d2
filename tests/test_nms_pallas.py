"""Pallas fused NMS vs the XLA reference implementation."""

import numpy as np
import pytest

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

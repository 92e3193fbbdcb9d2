"""Faster R-CNN training loss: finiteness and descent under SGD."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from edgeml_tpu.models.faster_rcnn import FasterRCNN, rpn_anchors
from edgeml_tpu.models.rcnn_loss import faster_rcnn_loss, _sample_balanced


def test_sample_balanced_widths():
    key = jax.random.PRNGKey(0)
    pos = jnp.asarray([True] * 3 + [False] * 97)
    neg = jnp.asarray([False] * 3 + [True] * 97)
    idx, w, pos_w = _sample_balanced(key, pos, neg, 64, 0.25)
    assert idx.shape == (64,)  # 16 positive slots + 48 negative slots
    # only 3 positives exist -> 3 weighted positive slots
    assert float(jnp.sum(pos_w)) == 3.0
    assert float(jnp.sum(w)) <= 64


@pytest.mark.slow
def test_faster_rcnn_loss_descends():
    net = FasterRCNN(num_classes=6, image_size=256, rpn_post_nms=64,
                     detections_per_img=16)
    params = net.init(jax.random.PRNGKey(0))
    anchors = [jnp.asarray(a) for a in rpn_anchors(256)]
    images = jax.random.uniform(jax.random.PRNGKey(1), (1, 256, 256, 3))
    gt_boxes = jnp.asarray([[[40, 40, 120, 120], [0, 0, 0, 0]]], jnp.float32)
    gt_cls = jnp.asarray([[2, 0]])
    gt_valid = jnp.asarray([[True, False]])

    opt = optax.sgd(1e-3, momentum=0.9)
    state = opt.init(params)

    @jax.jit
    def step(params, state, key):
        def lf(p):
            return faster_rcnn_loss(
                net, key, p, images, anchors, gt_boxes, gt_cls, gt_valid
            )

        (loss, parts), g = jax.value_and_grad(lf, has_aux=True)(params)
        u, state = opt.update(g, state)
        return optax.apply_updates(params, u), state, loss

    # One fixed sampling key: the anchor/ROI subsets stay constant across
    # steps, so the optimized objective is stationary and must descend.
    sub = jax.random.PRNGKey(7)
    losses = []
    for _ in range(6):
        params, state, loss = step(params, state, sub)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]

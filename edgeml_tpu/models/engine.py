"""Family-generic training/evaluation engine.

Counterpart of the reference's vendored engine
(/root/reference/torch_models/references/engine.py:12-115): one jitted
train-step builder per detector family, a train_one_epoch driver with the
MetricLogger, and an evaluate() that feeds the DetectionEvaluator — all
family-dispatched so the train CLI supports ssd / faster_rcnn / retinanet
(the reference's model zoo, train.py:16-18) plus yolov5*.

Target protocol: every family consumes the padded (B, MAXT, 5) normalized
[cls, x, y, w, h] rows + validity produced by `pad_targets`; families that
train on pixel xyxy with 1-based labels convert inside the jitted step.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..parallel.meters import MetricLogger
from .train import TrainConfig, make_optimizer
from .loss import yolo_loss


def make_detector(name: str, num_classes: int, img_size: int):
    """Build (net, params, stats_or_None) for a family name."""
    key = jax.random.PRNGKey(0)
    if name.startswith("yolov5"):
        from .yolov5 import YoloV5

        net = YoloV5(variant=name.replace("yolov5", "") or "n",
                     num_classes=num_classes, img_size=img_size)
        params, stats = net.init(key)
        return net, params, stats
    if name == "ssd":
        from .ssdlite import SSDLite

        net = SSDLite(num_classes=num_classes + 1, image_size=min(img_size, 320))
        params, stats = net.init(key)
        return net, params, stats
    if name == "retinanet":
        from .retinanet import RetinaNet

        net = RetinaNet(num_classes=num_classes + 1, image_size=img_size)
        return net, net.init(key), None
    if name == "faster_rcnn":
        from .faster_rcnn import FasterRCNN

        net = FasterRCNN(num_classes=num_classes + 1, image_size=img_size)
        return net, net.init(key), None
    raise RuntimeError(f"unknown detector family '{name}'")


def _to_xyxy_px(targets, size):
    """(B, T, 5) normalized [cls, x, y, w, h] -> (boxes_xyxy_px, cls_1based)."""
    cls = targets[..., 0].astype(jnp.int32) + 1
    cx, cy, w, h = (targets[..., i] * size for i in (1, 2, 3, 4))
    boxes = jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)
    return boxes, cls


def make_family_train_step(net, cfg: TrainConfig, dtype=None):
    """(params, stats, opt_state, images, targets, valid, lr, key) ->
    (params, stats, opt_state, loss, parts). stats is None for frozen-BN
    families and passed through untouched.

    dtype: optional AMP compute dtype (jnp.bfloat16) for the forward/backward
    — the engine.py:27-43 autocast equivalent (see models/train.py amp_cast).
    Supported for all four families; Faster R-CNN casts only its compute
    stages (backbone/RPN head/RoIAlign/box head) and keeps every decision
    stage f32, mirroring its serving knob (rcnn_loss.faster_rcnn_loss)."""
    opt = make_optimizer(cfg)
    kind = type(net).__name__

    if kind == "YoloV5":
        from .train import make_train_step

        _, base = make_train_step(net, cfg, dtype=dtype)

        def step(params, stats, opt_state, images, targets, valid, lr, key):
            del key
            return base(params, stats, opt_state, images, targets, valid, lr)

        return opt, step

    from .train import amp_cast

    if kind == "SSDLite":
        from .ssd_loss import ssd_loss
        from .ssdlite import default_boxes

        anchors = jnp.asarray(default_boxes(net.image_size, net.feature_sizes))

        @jax.jit
        def step(params, stats, opt_state, images, targets, valid, lr, key):
            del key
            boxes, cls = _to_xyxy_px(targets, net.image_size)

            def lf(p):
                p_c = amp_cast(p, dtype)
                x = images if dtype is None else images.astype(dtype)
                (cl, rg), ns = net.apply(p_c, stats, x, train=True)
                cl, rg = cl.astype(jnp.float32), rg.astype(jnp.float32)
                total, parts = ssd_loss(net, cl, rg, anchors, boxes, cls, valid)
                return total, (ns, parts)

            (loss, (ns, parts)), g = jax.value_and_grad(lf, has_aux=True)(params)
            u, opt_state = opt.update(g, opt_state, params)
            u = jax.tree_util.tree_map(lambda x: x * lr, u)
            return optax.apply_updates(params, u), ns, opt_state, loss, parts

        return opt, step

    if kind == "RetinaNet":
        from .retinanet import retina_anchors, retina_loss

        anchors = jnp.asarray(retina_anchors(net.image_size))

        @jax.jit
        def step(params, stats, opt_state, images, targets, valid, lr, key):
            del key
            boxes, cls = _to_xyxy_px(targets, net.image_size)

            def lf(p):
                p_c = amp_cast(p, dtype)
                x = images if dtype is None else images.astype(dtype)
                cl, rg = net.apply(p_c, x)
                cl, rg = cl.astype(jnp.float32), rg.astype(jnp.float32)
                return retina_loss(net, cl, rg, anchors, boxes, cls, valid)

            (loss, parts), g = jax.value_and_grad(lf, has_aux=True)(params)
            u, opt_state = opt.update(g, opt_state, params)
            u = jax.tree_util.tree_map(lambda x: x * lr, u)
            return optax.apply_updates(params, u), stats, opt_state, loss, parts

        return opt, step

    if kind == "FasterRCNN":
        from .faster_rcnn import rpn_anchors
        from .rcnn_loss import faster_rcnn_loss

        anchors = [jnp.asarray(a) for a in rpn_anchors(net.image_size)]

        @jax.jit
        def step(params, stats, opt_state, images, targets, valid, lr, key):
            boxes, cls = _to_xyxy_px(targets, net.image_size)

            def lf(p):
                return faster_rcnn_loss(
                    net, key, p, images, anchors, boxes, cls, valid,
                    dtype=dtype,
                )

            (loss, parts), g = jax.value_and_grad(lf, has_aux=True)(params)
            u, opt_state = opt.update(g, opt_state, params)
            u = jax.tree_util.tree_map(lambda x: x * lr, u)
            return optax.apply_updates(params, u), stats, opt_state, loss, parts

        return opt, step

    raise RuntimeError(f"no train step for {kind}")


def evaluate(net, params, stats, images, gt_rows, batch_size: int = 8,
             conf_thres: float = 0.05, iou_thres: float = 0.5,
             dtype=None, q8=None):
    """Run detection over in-memory images and score against GT rows
    (normalized [cls, x, y, w, h] per image). Returns the AP summary dict —
    the engine.py:75-115 evaluate() equivalent, on-device end to end.

    dtype / q8 are the serving knobs of models/infer.py (_detect_batch):
    bfloat16 compute and the int8 post-training-quantized trunk — so the
    PTQ accuracy delta is measurable as a dataset mAP difference
    (q8: Q8Yolo.tree for YOLO, Q8SSD.tree for SSDLite — like --int8
    serving)."""
    from ..eval_coco import DetectionEvaluator
    from .infer import _detect_batch, _detect_generic
    from .common import letterbox_batch

    ev = DetectionEvaluator()
    is_yolo = type(net).__name__ == "YoloV5"
    if q8 is not None and not (is_yolo or type(net).__name__ == "SSDLite"):
        raise ValueError(
            "int8 (q8) evaluation is implemented for YOLO and SSDLite only")
    for s in range(0, len(images), batch_size):
        chunk = images[s : s + batch_size]
        pad = batch_size - len(chunk)
        chunk_p = chunk + [chunk[-1]] * pad
        hw = np.array([im.shape[:2] for im in chunk_p], np.float32)
        if is_yolo:
            lb, meta = letterbox_batch(chunk_p, net.img_size)
            dets, valid = _detect_batch(
                net, params, stats, jnp.asarray(lb), jnp.asarray(meta),
                jnp.asarray(hw), conf_thres, iou_thres,
                dtype=dtype, q8=q8,
            )
        else:
            size = net.image_size
            rs = np.stack(
                [
                    np.asarray(
                        jax.image.resize(
                            jnp.asarray(im, jnp.float32), (size, size, 3),
                            "bilinear",
                        )
                    )
                    for im in chunk_p
                ]
            )
            mean = np.array([0.485, 0.456, 0.406], np.float32)
            std = np.array([0.229, 0.224, 0.225], np.float32)
            dets, valid = _detect_generic(
                net, params, stats, jnp.asarray((rs - mean) / std),
                conf_thres, iou_thres, dtype=dtype, q8=q8,
            )
        dets, valid = np.asarray(dets), np.asarray(valid)
        det_batch, gt_batch = [], []
        for bi in range(len(chunk)):
            rows = dets[bi][valid[bi]]
            # rows: (cls, x, y, w, h, conf) normalized
            xy = rows[:, 1:3]
            wh = rows[:, 3:5]
            det_batch.append(
                (rows[:, 0], np.concatenate([xy - wh / 2, xy + wh / 2], 1),
                 rows[:, 5])
            )
            g = np.asarray(gt_rows[s + bi], np.float32).reshape(-1, 5)
            gxy, gwh = g[:, 1:3], g[:, 3:5]
            gt_batch.append(
                (g[:, 0], np.concatenate([gxy - gwh / 2, gxy + gwh / 2], 1))
            )
        ev.update(det_batch, gt_batch)
    ev.synchronize_between_processes()
    return ev.summarize()


def train_one_epoch(net, cfg, step, state, batches, epoch, lr_fn, key,
                    print_freq: int = 100):
    """Generic epoch loop with MetricLogger (engine.py:12-60 equivalent).
    `state` = (params, stats, opt_state); `batches` yields (images, targets,
    valid); `lr_fn(it)` gives the warmup-aware learning rate."""
    params, stats, opt_state = state
    logger = MetricLogger()
    for it, (images, targets, valid) in enumerate(
        logger.log_every(batches, print_freq, f"Epoch: [{epoch}]")
    ):
        key, sub = jax.random.split(key)
        lr = lr_fn(it)
        t0 = time.time()
        params, stats, opt_state, loss, parts = step(
            params, stats, opt_state, images, targets, valid, lr, sub
        )
        loss = float(loss)
        if not np.isfinite(loss):
            raise FloatingPointError(f"Loss is {loss}, stopping training")
        logger.update(loss=loss, lr=lr, step_time=time.time() - t0)
    return (params, stats, opt_state), logger

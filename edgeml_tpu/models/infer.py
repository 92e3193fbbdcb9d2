"""End-to-end detector inference: images -> per-image detection files.

The TPU rebuild of the reference's two detection dumpers:
  * torch_models/detect.py:62-105 (torchvision models, bs=1 CPU/CUDA loop,
    normalized-xywh .npy rows with COCO->YOLO class remap);
  * yolov5 val.py --save-txt --save-conf (yolov5_scripts.md:15-21).

Here the whole batch pipeline — letterbox, backbone, anchor decode, NMS,
coordinate unmapping — is one jitted function vmapped over a fixed batch;
only JPEG decode and file IO stay on host.
"""

from __future__ import annotations

import os
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.nms import nms_split_batch
from .common import letterbox_batch
from .yolov5 import STRIDES, YoloV5


FUSE_CONF = False
"""Serving-tail mode, read at trace time. True routes predict through the
conf_fused epilogue (trunk emits obj*cls + row max; the NMS tail drops its
obj gather and full-matrix pass). Detections are bit-identical either way
(tests/test_nms_split_batch.py::test_conf_fused_matches_unfused). Default
OFF: measured v5e round 4 (tools/exp_confused.py, B=128, 16 chained iters):
unfused 23.69 ms vs fused 24.25 bf16; 32.84 vs 33.97 f32 — the trunk-side
full-matrix epilogue costs slightly more than the tail saves, both dtypes."""

RAW_TAIL = "bf16"
"""Serving-tail mode, read at trace time (flip + clear_cache of
_detect_batch/_detect_pipe_step). Routes YOLO serving through the
raw-logit tail: predict_raw (no full-matrix sigmoid, no full f32 box
decode) + ops/nms_raw.nms_split_batch_raw (sigmoid/decode applied per
gathered row; in bf16 the whole row gather is one lossless one-hot MXU
matmul). f32 detections are bit-identical either way; bf16 detections keep
exact selection/scores/classes while box coordinates may drift at the
~1e-6 (normalized) level — XLA's bf16 conv output rounding is CONSUMER-
dependent (conv->astype(f32) vs conv consumed as bf16 can lower with
different accumulation rounding), which is within the bf16 serving mode's
documented no-exactness contract (tests/test_nms_raw.py pins both).
Never applies to int8 serving (q8 keeps the decoded path).

Values: "bf16" (default) — raw tail for the bf16 serving mode only;
True — all dtypes (measurement tools); False — decoded tail everywhere.
Measured v5e round 4 (tools/exp_rawserve.py, B=128 x16 production step):
bf16 23.06 ms raw vs 25.57 decoded (+10.9%, 0 redos); f32 32.87 vs 32.46
— a slight loss (the f32 path has no one-hot gather to feed, and the
per-row decode overhead outweighs the saved transcendentals), so f32
keeps the decoded tail."""


def _use_raw(dtype, q8) -> bool:
    """Trace-time raw-tail decision for a serving call (see RAW_TAIL)."""
    if q8 is not None or not RAW_TAIL:
        return False
    if RAW_TAIL == "bf16":
        return dtype is not None and jnp.dtype(dtype) == jnp.bfloat16
    return True


def _nms_unmap(pred, meta, orig_hw, conf_thres, iou_thres,
               max_det, multi_label, fallback="cond"):
    """Batched NMS + letterbox unmap over split trunk outputs (the serial
    VPU tail of the serving pipeline). The NMS runs through nms_split_batch;
    fallback="cond" is exact in-program, fallback="flag" returns an extra
    `ok` scalar and leaves the rare exact re-run to the host (see
    run_detection) — an in-program lax.cond costs ~8 ms/128-batch even when
    the fast branch is taken.

    pred: predict(fuse_conf=FUSE_CONF) components — (obj, xywh, cls)
    by default, (best, xywh, conf) under the conf_fused knob, or the
    6-tuple raw-tail carry (score, obj, xy_raw, wh_raw, cls_raw, geo)
    under RAW_TAIL (ops/nms_raw.py; geo rides in the carry so the host
    redo path needs no params)."""
    if len(pred) == 6:
        from ..ops.nms_raw import nms_split_batch_raw

        nms_out = nms_split_batch_raw(
            *pred, conf_thres, iou_thres,
            max_det=max_det, multi_label=multi_label, fallback=fallback,
        )
    else:
        obj, xywh, cls = pred
        nms_out = nms_split_batch(
            obj, xywh, cls, conf_thres, iou_thres,
            max_det=max_det, multi_label=multi_label, fallback=fallback,
            conf_fused=FUSE_CONF,
        )
    dets, valid = nms_out[:2]
    out_extra = nms_out[2:]  # (ok,) in flag mode
    r = meta[:, 0:1]
    dw = meta[:, 1:2]
    dh = meta[:, 2:3]
    h, w = orig_hw[:, 0:1], orig_hw[:, 1:2]
    x1 = jnp.clip((dets[:, :, 0] - dw) / r, 0, w)
    y1 = jnp.clip((dets[:, :, 1] - dh) / r, 0, h)
    x2 = jnp.clip((dets[:, :, 2] - dw) / r, 0, w)
    y2 = jnp.clip((dets[:, :, 3] - dh) / r, 0, h)
    out = jnp.stack(
        [
            dets[:, :, 5],
            (x1 + x2) / 2.0 / w,
            (y1 + y2) / 2.0 / h,
            (x2 - x1) / w,
            (y2 - y1) / h,
            dets[:, :, 4],
        ],
        axis=2,
    )
    if fallback == "flag":
        return out, valid, out_extra[0]
    return out, valid


@partial(
    jax.jit,
    static_argnames=("net", "max_det", "multi_label", "iou_thres", "dtype"),
)
def _detect_batch(
    net: YoloV5,
    params,
    stats,
    images,  # (B, S, S, 3)
    meta,  # (B, 3) letterbox (ratio, dw, dh)
    orig_hw,  # (B, 2) original (h, w)
    conf_thres: float,
    iou_thres: float,
    max_det: int = 300,
    multi_label: bool = True,
    dtype=None,
    q8=None,
):
    """Forward + decode + NMS + unmap for one letterboxed batch.

    Uses the split serving path (YoloV5.predict + ops.nms.nms_split): the
    packed (B, N, 85) decode tensor never exists, so no strided minor-dim
    slices reach the TPU. dtype optionally runs the trunk in bfloat16;
    q8 (a Q8Yolo.tree pytree) runs it int8-quantized instead (models/quant.py).

    Returns (dets (B, max_det, 6) rows [cls, x, y, w, h, conf] normalized to
    the ORIGINAL image size, valid (B, max_det)).
    """
    if images.dtype == jnp.uint8:
        # Deployment input interface: uint8 pixels, normalized on device.
        # The reference stack letterboxes in uint8 (cv2) and converts to
        # float /255 at the model boundary; accepting u8 here quarters the
        # input traffic (157 MB vs 629 MB per 128x640^2 batch) and the
        # /255 + serving-dtype cast fuse into the stem's s2d read. Values
        # are bit-identical to feeding the host-normalized f32 batch.
        images = images.astype(jnp.float32) / 255.0
    if q8 is not None:
        from .quant import q8_predict

        pred = q8_predict(net, q8, images, score_dtype=dtype,
                          fuse_conf=FUSE_CONF)
    elif _use_raw(dtype, q8):
        pred = net.predict_raw(params, stats, images, dtype=dtype) \
            + (net.raw_geometry(params, dtype),)
    else:
        pred = net.predict(params, stats, images, dtype=dtype,
                           fuse_conf=FUSE_CONF)
    return _nms_unmap(pred, meta, orig_hw, conf_thres, iou_thres,
                      max_det, multi_label)


@partial(
    jax.jit,
    static_argnames=("net", "max_det", "multi_label", "iou_thres", "dtype"),
)
def _detect_pipe_step(
    net: YoloV5,
    params,
    stats,
    prev,  # ((best, xywh, conf), meta, orig_hw) of the PREVIOUS batch
    images,  # (B, S, S, 3) THIS batch
    meta,
    orig_hw,
    conf_thres: float,
    iou_thres: float,
    max_det: int = 300,
    multi_label: bool = True,
    dtype=None,
    q8=None,
):
    """One software-pipelined serving step: the trunk of THIS batch and the
    NMS tail of the PREVIOUS batch run in the same XLA program, so the
    scheduler can interleave the MXU-bound trunk with the serial VPU tail
    (gathers/top-k run at ~1 element/cycle on TPU; measured ~7% end-to-end
    win at B=128, tools/exp_pipeline.py).

    Returns (carry for the next step, dets of the previous batch, valid,
    ok) — ok is the exactness-certificate flag of the previous batch's fast
    pair selection (ops/nms.py nms_split_batch fallback="flag"): on the
    rare False, redo that batch with exact_redo (host-side, off the hot
    path). Feed a zero carry first and one flush step last; results come
    out shifted by one batch.
    """
    ppred, pmeta, phw = prev
    if images.dtype == jnp.uint8:
        images = images.astype(jnp.float32) / 255.0  # see _detect_batch
    if q8 is not None:
        from .quant import q8_predict

        new = q8_predict(net, q8, images, score_dtype=dtype,
                         fuse_conf=FUSE_CONF)
    elif _use_raw(dtype, q8):
        new = net.predict_raw(params, stats, images, dtype=dtype) \
            + (net.raw_geometry(params, dtype),)
    else:
        new = net.predict(params, stats, images, dtype=dtype,
                          fuse_conf=FUSE_CONF)
    dets, valid, ok = _nms_unmap(ppred, pmeta, phw, conf_thres,
                                 iou_thres, max_det, multi_label,
                                 fallback="flag")
    return (new, meta, orig_hw), dets, valid, ok


def exact_redo(prev, conf_thres, iou_thres, max_det=300, multi_label=True):
    """Host-side exact re-run for a batch whose fast-selection certificate
    failed: the same NMS tail with the in-program exact fallback. prev =
    (pred, meta, orig_hw) as carried by _detect_pipe_step."""
    ppred, pmeta, phw = prev
    return _nms_unmap(ppred, pmeta, phw, conf_thres, iou_thres,
                      max_det, multi_label, fallback="cond")


def _zero_carry(net: YoloV5, batch: int, size: int, dtype=None, raw=None):
    """A zero previous-batch carry for priming _detect_pipe_step.

    The carry holds predict()'s three components (same shapes fused or
    unfused) — or, under the raw tail, predict_raw's five plus a zero-bias
    geometry (raw=None reads the module RAW_TAIL flag; pass raw=False
    explicitly when serving q8, which keeps the decoded path). Zeros are a
    consistent instance (score 0 -> no candidates). dtype must match the
    serving dtype passed to the step: predict emits scores in that dtype
    (and the raw tail its xy/wh too; decoded boxes stay f32), and a
    mismatched zero carry would recompile the step on its second
    invocation — mid-loop, if the caller timed only one warmup step.
    """
    if raw is None:
        raw = _use_raw(dtype, None)
    n = sum((size // s) ** 2 * net.na for s in STRIDES)
    sdt = jnp.float32 if dtype is None else dtype
    if raw:
        pred = (
            jnp.zeros((batch, n), sdt),
            jnp.zeros((batch, n), sdt),
            jnp.zeros((batch, n, 2), sdt),
            jnp.zeros((batch, n, 2), sdt),
            jnp.zeros((batch, n, net.num_classes), sdt),
            net.raw_geometry(None),
        )
    else:
        pred = (
            jnp.zeros((batch, n), sdt),
            jnp.zeros((batch, n, 4), jnp.float32),
            jnp.zeros((batch, n, net.num_classes), sdt),
        )
    return (
        pred,
        jnp.zeros((batch, 3), jnp.float32).at[:, 0].set(1.0),
        jnp.ones((batch, 2), jnp.float32),
    )


def _detect_generic(net, params, stats, images, conf_thres, iou_thres,
                    dtype=None, q8=None):
    """Anchor-family dispatch (SSDLite / RetinaNet / Faster R-CNN): forward +
    family postprocess, boxes returned as normalized (cls, xywh, conf) rows.

    Plain square resize means normalized coordinates are scale-invariant:
    x/S in model space equals x_orig/w in image space.

    dtype: optional compute dtype for the backbone+heads of all three
    families (e.g. jnp.bfloat16 — the same serving knob as YoloV5.predict).
    Head outputs are cast back to f32 before decode/postprocess; Faster
    R-CNN keeps every decision stage (proposal decode/NMS, score softmax,
    box decode) in f32.

    q8: optional Q8SSD.tree pytree (SSDLite only) — serves the int8
    post-training-quantized trunk (models/quant_ssd.py); logits come out
    f32 and ride the identical postprocess.
    """

    def cast(t):
        return jax.tree_util.tree_map(
            lambda a: a.astype(dtype)
            if getattr(a, "dtype", None) == jnp.float32 else a, t)

    kind = type(net).__name__
    if q8 is not None and kind != "SSDLite":
        raise ValueError("int8 (q8) serving: YOLO and SSDLite only")
    if kind == "SSDLite":
        from .ssd_loss import ssd_postprocess
        from .ssdlite import default_boxes

        if q8 is not None:
            from .quant_ssd import q8_ssd_apply

            cls_logits, reg = q8_ssd_apply(net, q8, images)
        elif dtype is not None:
            (cls_logits, reg), _ = net.apply(
                cast(params), cast(stats), images.astype(dtype), train=False
            )
            cls_logits = cls_logits.astype(jnp.float32)
            reg = reg.astype(jnp.float32)
        else:
            (cls_logits, reg), _ = net.apply(params, stats, images, train=False)
        anchors = jnp.asarray(default_boxes(net.image_size, net.feature_sizes))
        dets, valid = ssd_postprocess(
            net, cls_logits, reg, anchors,
            score_thresh=conf_thres, nms_thresh=iou_thres,
        )
    elif kind == "RetinaNet":
        from .retinanet import retina_anchors, retina_postprocess

        if dtype is not None:
            # no full-matrix f32 cast: retina_postprocess's raw tail casts
            # only its 2048 gathered rows (bit-identical detections)
            cls_logits, reg = net.apply(cast(params), images.astype(dtype))
        else:
            cls_logits, reg = net.apply(params, images)
        anchors = jnp.asarray(retina_anchors(net.image_size))
        dets, valid = retina_postprocess(
            net, cls_logits, reg, anchors,
            score_thresh=conf_thres, nms_thresh=iou_thres,
        )
    elif kind == "FasterRCNN":
        from .faster_rcnn import rpn_anchors

        anchors = [jnp.asarray(a) for a in rpn_anchors(net.image_size)]
        dets, valid = net.detect(
            params, images, anchors,
            score_thresh=conf_thres, nms_thresh=iou_thres, dtype=dtype,
        )
    else:
        raise TypeError(f"unknown detector family {kind}")

    s = net.image_size
    x1, y1, x2, y2 = (dets[..., i] / s for i in range(4))
    out = jnp.stack(
        [dets[..., 5], (x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1, dets[..., 4]],
        axis=-1,
    )
    return out, valid


def run_detection(
    net,
    params,
    stats,
    img_dir: str,
    save_dir: str,
    batch_size: int = 16,
    conf_thres: float = 0.001,
    iou_thres: float = 0.6,
    img_size: int = 640,
    fmt: str = "npy",
    class_map=None,
    mesh=None,
    dtype=None,
):
    """Detect every image in img_dir; save per-image detection files.

    dtype: optional serving compute dtype (e.g. jnp.bfloat16) — the speed/
    accuracy knob of YoloV5.predict and _detect_generic; None (default)
    keeps the bit-exact f32 path. The string "int8" (YOLO only) serves the
    post-training-quantized trunk (models/quant.py), calibrated on the
    first batch of img_dir itself.

    mesh: optional jax.sharding.Mesh — weights are replicated and the batch
    axis of every device input is sharded over the mesh's first axis, so the
    jitted serving step runs data-parallel with XLA-inserted collectives
    (SURVEY.md section 5.7's scaling recipe applied to serving; batch_size
    must be a multiple of the mesh size).

    Output format parity with the on-disk contract (SURVEY.md section 2.9):
    rows (cls, x, y, w, h, conf), normalized xywh-center, one file per image
    named after the image stem (.npy or .txt).
    """
    from ..data.loader import iter_batches, list_images, resize_bilinear

    is_yolo = isinstance(net, YoloV5)
    names = list_images(img_dir)
    Path(save_dir).mkdir(parents=True, exist_ok=True)
    size = img_size if is_yolo else net.image_size

    q8 = None
    if isinstance(dtype, str) and dtype.startswith("int8"):
        is_ssd = type(net).__name__ == "SSDLite"
        if not (is_yolo or is_ssd):
            raise ValueError(
                "int8 serving is implemented for YOLO and SSDLite only")
        from ..data.loader import decode_image

        # calibrate on the serving distribution: the first batch of img_dir
        calib = [
            decode_image(os.path.join(img_dir, n))
            for n in names[: min(batch_size, len(names), 16)]
        ]
        if is_yolo:
            from .quant import prepare_int8

            # "int8" keeps f32 scores; "int8-bf16" casts the dequantized
            # obj/cls logits to bfloat16, enabling the keyed bf16 NMS tail
            # (the fastest tail) behind the int8 trunk.
            score_dt = jnp.bfloat16 if dtype == "int8-bf16" else None
            calib_arr, _ = letterbox_batch(calib, size)
            q8 = prepare_int8(
                net, params, stats, lambda i: jnp.asarray(calib_arr), iters=1
            ).tree
            dtype = score_dt  # the carry/score dtype on the quantized path
        else:
            from ..data.loader import resize_bilinear
            from .quant_ssd import prepare_int8_ssd

            # calibration must see the SERVING preprocessing (square resize
            # + torchvision normalize — make_batch below)
            mean = np.array([0.485, 0.456, 0.406], np.float32)
            std = np.array([0.229, 0.224, 0.225], np.float32)
            calib_arr = (np.stack(
                [resize_bilinear(im, size, size) for im in calib]
            ) - mean) / std
            q8 = prepare_int8_ssd(
                net, params, stats, lambda i: jnp.asarray(calib_arr), iters=1
            ).tree
            dtype = None

    if mesh is not None:
        from ..parallel.mesh import replicate, shard_along

        n_dev = int(np.prod(mesh.devices.shape))
        if batch_size % n_dev:
            raise ValueError(
                f"batch_size {batch_size} not divisible by mesh size {n_dev}"
            )
        params = replicate(params, mesh)
        stats = replicate(stats, mesh)
        if q8 is not None:
            q8 = replicate(q8, mesh)
        place = lambda a: shard_along(jnp.asarray(a), mesh, mesh.axis_names[0])
    else:
        place = jnp.asarray

    def make_batch(items):
        """Decode thread: letterbox/resize + normalize; pad the tail batch to
        keep device shapes static."""
        chunk_names = [n for n, _ in items]
        imgs = [im for _, im in items]
        pad = batch_size - len(imgs)
        imgs_p = imgs + [imgs[-1]] * pad
        hw = np.array([im.shape[:2] for im in imgs_p], np.float32)
        if is_yolo:
            lb, meta = letterbox_batch(imgs_p, size)
            return chunk_names, lb, meta, hw
        rs = np.stack([resize_bilinear(im, size, size) for im in imgs_p])
        # torchvision's GeneralizedRCNNTransform normalization. Deliberate
        # divergence: a fixed square resize instead of the RCNN models'
        # aspect-preserving min/max-size resize (static shapes on TPU).
        mean = np.array([0.485, 0.456, 0.406], np.float32)
        std = np.array([0.229, 0.224, 0.225], np.float32)
        return chunk_names, (rs - mean) / std, None, hw

    def save_batch(chunk_names, dets, valid):
        dets = np.asarray(dets)
        valid = np.asarray(valid)
        for bi, name in enumerate(chunk_names):
            rows = dets[bi][valid[bi]]
            if class_map is not None:
                cls = np.array([class_map.get(int(c), -1) for c in rows[:, 0]])
                keep = cls != -1
                rows = rows[keep]
                rows[:, 0] = cls[keep]
            stem = ".".join(name.split(".")[:-1]) or name
            if fmt == "npy":
                np.save(os.path.join(save_dir, stem + ".npy"), rows)
            else:
                with open(os.path.join(save_dir, stem + ".txt"), "w") as f:
                    for r in rows:
                        f.write(
                            f"{int(r[0])} {r[1]:.6f} {r[2]:.6f} {r[3]:.6f} "
                            f"{r[4]:.6f} {r[5]:.6f}\n"
                        )

    if is_yolo:
        # Software-pipelined serving loop: each step runs this batch's trunk
        # and the previous batch's NMS tail in one program (_detect_pipe_step);
        # results stream out shifted by one batch, with a zero-image flush
        # step at the end. File outputs are identical to the unpipelined path:
        # the step's NMS uses the fast pair-selection pool and returns its
        # exactness-certificate flag; on the rare False the batch is redone
        # with the exact program host-side (the in-program lax.cond fallback
        # costs ~8 ms/batch even when never taken — tools/exp_tail4.py).
        carry = jax.tree_util.tree_map(
            place,
            _zero_carry(net, batch_size, size, dtype,
                        raw=_use_raw(dtype, q8)),
        )
        pending = None  # chunk whose detections are still on device

        def save_exact(chunk_names, dets, valid, ok, held):
            if not bool(ok):  # certificate failed: exact host-side redo
                dets, valid = exact_redo(held, conf_thres, iou_thres)
            save_batch(chunk_names, dets, valid)

        for chunk_names, arr, meta, hw in iter_batches(
            img_dir, names, batch_size, make_batch
        ):
            next_carry, dets, valid, ok = _detect_pipe_step(
                net, params, stats, carry, place(arr),
                place(meta), place(hw), conf_thres, iou_thres, dtype=dtype,
                q8=q8,
            )
            if pending is not None:
                save_exact(pending, dets, valid, ok, carry)
            pending = chunk_names
            carry = next_carry
        if pending is not None:
            zero = _zero_carry(net, batch_size, size)
            _, dets, valid, ok = _detect_pipe_step(
                net, params, stats, carry,
                place(jnp.zeros((batch_size, size, size, 3), jnp.float32)),
                place(zero[1]), place(zero[2]), conf_thres, iou_thres,
                dtype=dtype, q8=q8,
            )
            save_exact(pending, dets, valid, ok, carry)
    else:
        for chunk_names, arr, _meta, hw in iter_batches(
            img_dir, names, batch_size, make_batch
        ):
            dets, valid = _detect_generic(
                net, params, stats, place(arr), conf_thres, iou_thres,
                dtype=dtype, q8=q8,
            )
            save_batch(chunk_names, dets, valid)


def dump_features(
    net: YoloV5,
    params,
    stats,
    img_dir: str,
    save_dir: str,
    stages=(9, 17, 20, 23),
    img_size: int = 640,
):
    """Save hidden-stage feature maps per image, file-format-compatible with
    the reference's patched feature_visualization (yolov5_scripts.md:24-42):
    {img}/stage{S}_{Name}_features.npy with (C, H, W) layout."""
    from ..data.io import V5_STAGE_NAMES
    from ..data.loader import iter_batches, list_images

    names = list_images(img_dir)

    @partial(jax.jit, static_argnames=())
    def fwd(im):
        _, _, taps = net.apply(params, stats, im[None], train=False, taps=tuple(stages))
        return {k: v[0] for k, v in taps.items()}

    def make_batch(items):
        (name, img), = items
        lb, _ = letterbox_batch([img], img_size)
        return name, lb[0]

    for name, lb0 in iter_batches(img_dir, names, 1, make_batch):
        taps = fwd(jnp.asarray(lb0))
        stem = ".".join(name.split(".")[:-1]) or name
        out = Path(save_dir) / stem
        out.mkdir(parents=True, exist_ok=True)
        for s_idx, act in taps.items():
            arr = np.asarray(act).transpose(2, 0, 1)  # NHWC slice -> (C, H, W)
            np.save(
                out / f"stage{s_idx}_{V5_STAGE_NAMES[s_idx]}_features.npy", arr
            )

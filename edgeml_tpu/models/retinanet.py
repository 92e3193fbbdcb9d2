"""RetinaNet-ResNet50-FPN (v2) in pure JAX.

One of the reference's strong detectors (retinanet_resnet50_fpn_v2,
/root/reference/torch_models/train.py:18, detect.py:34-38). Structure per
torchvision v2: ResNet50-FPN with P6/P7, shared 4-conv GroupNorm(32) heads,
9 anchors per location (sizes {2^0, 2^(1/3), 2^(2/3)} x base 32..512 across
P3..P7, aspect ratios 0.5/1/2), sigmoid focal classification loss
(alpha 0.25, gamma 2), box regression on (1, 1, 1, 1)-weighted deltas,
0.5/0.4 matcher with low-quality matches allowed.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.metrics import box_iou_safe
from ..ops.nms import nms_split_batch, topk1d
from .common import conv2d, conv_init
from .resnet import ResNet50FPN

ANCHOR_SIZES = (32, 64, 128, 256, 512)
ASPECT_RATIOS = (0.5, 1.0, 2.0)
SCALE_OCTAVES = (1.0, 2 ** (1 / 3), 2 ** (2 / 3))


def retina_anchors(image_size: int, strides=(8, 16, 32, 64, 128)):
    """(A, 4) xyxy anchors over all FPN levels (torchvision AnchorGenerator:
    zero-based cell corners scaled by stride, centered boxes)."""
    out = []
    for size, stride in zip(ANCHOR_SIZES, strides):
        f = math.ceil(image_size / stride)
        # torchvision AnchorGenerator ordering: ratio-major (ratio slowest,
        # scale fastest), with aspect_ratio = h/w — per-index parity matters
        # for imported head weights.
        whs = []
        for r in ASPECT_RATIOS:
            for octave in SCALE_OCTAVES:
                s = size * octave
                whs.append((s / math.sqrt(r), s * math.sqrt(r)))
        whs = np.array(whs, np.float32)  # (9, 2)
        ys, xs = np.meshgrid(np.arange(f), np.arange(f), indexing="ij")
        cx = (xs.reshape(-1, 1) + 0.5) * stride
        cy = (ys.reshape(-1, 1) + 0.5) * stride
        c = np.stack(
            [np.repeat(cx, 9, 1).reshape(-1), np.repeat(cy, 9, 1).reshape(-1)], 1
        )
        wh = np.tile(whs, (f * f, 1))
        out.append(
            np.concatenate([c - wh / 2, c + wh / 2], axis=1).astype(np.float32)
        )
    return np.concatenate(out)


def _groupnorm(x, p, groups=32, eps=1e-5):
    b, h, w, c = x.shape
    xg = x.reshape(b, h, w, groups, c // groups)
    mean = jnp.mean(xg, axis=(1, 2, 4), keepdims=True)
    var = jnp.var(xg, axis=(1, 2, 4), keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    return xg.reshape(b, h, w, c) * p["g"] + p["b"]


@dataclasses.dataclass(frozen=True)
class RetinaNet:
    num_classes: int = 91  # torchvision retinanet logits cover all ids; no bg
    image_size: int = 640

    @property
    def backbone(self):
        return ResNet50FPN(extra="p6p7")

    def init(self, key):
        p = {}
        key, sub = jax.random.split(key)
        p["backbone"] = self.backbone.init(sub)

        def tower(key):
            layers = []
            for _ in range(4):
                key, sub = jax.random.split(key)
                layers.append(
                    {
                        "w": conv_init(sub, 3, 256, 256),
                        "b": jnp.zeros((256,)),
                        "gn": {"g": jnp.ones((256,)), "b": jnp.zeros((256,))},
                    }
                )
            return key, layers

        key, p["cls_tower"] = tower(key)
        key, p["reg_tower"] = tower(key)
        key, k1, k2 = jax.random.split(key, 3)
        na = len(ASPECT_RATIOS) * len(SCALE_OCTAVES)
        # focal-loss prior bias: -log((1 - 0.01) / 0.01)
        p["cls_out"] = {
            "w": conv_init(k1, 3, 256, na * self.num_classes),
            "b": jnp.full((na * self.num_classes,), -math.log((1 - 0.01) / 0.01)),
        }
        p["reg_out"] = {
            "w": conv_init(k2, 3, 256, na * 4),
            "b": jnp.zeros((na * 4,)),
        }
        return p

    def apply(self, params, x):
        """x: (B, S, S, 3). Returns (cls_logits (B, A, C), reg (B, A, 4))."""
        feats = self.backbone.apply(params["backbone"], x)
        cls_all, reg_all = [], []
        for f in feats:
            c = f
            for layer in params["cls_tower"]:
                c = conv2d(c, layer["w"], 1, padding=((1, 1), (1, 1))) + layer["b"]
                c = jax.nn.relu(_groupnorm(c, layer["gn"]))
            c = conv2d(c, params["cls_out"]["w"], 1, padding=((1, 1), (1, 1)))
            c = c + params["cls_out"]["b"]
            r = f
            for layer in params["reg_tower"]:
                r = conv2d(r, layer["w"], 1, padding=((1, 1), (1, 1))) + layer["b"]
                r = jax.nn.relu(_groupnorm(r, layer["gn"]))
            r = conv2d(r, params["reg_out"]["w"], 1, padding=((1, 1), (1, 1)))
            r = r + params["reg_out"]["b"]
            b, hh, ww, _ = c.shape
            cls_all.append(c.reshape(b, -1, self.num_classes))
            reg_all.append(r.reshape(b, -1, 4))
        return jnp.concatenate(cls_all, 1), jnp.concatenate(reg_all, 1)

    # ---- box coding (weights 1,1,1,1) --------------------------------------

    @staticmethod
    def decode_boxes(reg, anchors):
        # anchors: (A, 4) broadcast against (B, A, 4) reg, or pre-gathered
        # (B, K, 4) rows (the RETINA_RAW tail) — same arithmetic either way
        acx = (anchors[..., 0] + anchors[..., 2]) * 0.5
        acy = (anchors[..., 1] + anchors[..., 3]) * 0.5
        aw = anchors[..., 2] - anchors[..., 0]
        ah = anchors[..., 3] - anchors[..., 1]
        cx = reg[..., 0] * aw + acx
        cy = reg[..., 1] * ah + acy
        w = jnp.exp(jnp.clip(reg[..., 2], None, math.log(1000.0 / 16))) * aw
        h = jnp.exp(jnp.clip(reg[..., 3], None, math.log(1000.0 / 16))) * ah
        return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)

    @staticmethod
    def encode_boxes(gt, anchors):
        acx = (anchors[:, 0] + anchors[:, 2]) * 0.5
        acy = (anchors[:, 1] + anchors[:, 3]) * 0.5
        aw = anchors[:, 2] - anchors[:, 0]
        ah = anchors[:, 3] - anchors[:, 1]
        gcx = (gt[..., 0] + gt[..., 2]) * 0.5
        gcy = (gt[..., 1] + gt[..., 3]) * 0.5
        gw = jnp.maximum(gt[..., 2] - gt[..., 0], 1e-6)
        gh = jnp.maximum(gt[..., 3] - gt[..., 1], 1e-6)
        return jnp.stack(
            [(gcx - acx) / aw, (gcy - acy) / ah, jnp.log(gw / aw), jnp.log(gh / ah)],
            -1,
        )


def retina_match(anchors, gt_boxes, gt_valid, hi=0.5, lo=0.4):
    """Matcher(0.5, 0.4, allow_low_quality_matches=True): per anchor, matched
    GT index, -1 = background, -2 = ignored (between thresholds)."""
    iou = box_iou_safe(gt_boxes, anchors)
    iou = jnp.where(gt_valid[:, None], iou, -1.0)
    best_gt = jnp.argmax(iou, axis=0)
    best_iou = jnp.max(iou, axis=0)
    matches = jnp.where(best_iou >= hi, best_gt, jnp.where(best_iou < lo, -1, -2))
    # allow_low_quality: for each GT, anchors tying its max IoU are matched.
    gt_best = jnp.max(iou, axis=1, keepdims=True)  # (M, 1)
    low_q = jnp.any((iou == gt_best) & (gt_best > 0) & gt_valid[:, None], axis=0)
    return jnp.where(low_q, best_gt, matches)


def retina_loss(net: RetinaNet, cls_logits, reg, anchors, gt_boxes, gt_cls, gt_valid):
    """Sigmoid focal classification + smooth-L1 regression, each normalized by
    the foreground count (gt_cls is 0-based in the model's label space)."""
    alpha, gamma = 0.25, 2.0

    def one(cl, rg, gb, gc, gv):
        match = retina_match(anchors, gb, gv)
        fg = match >= 0
        num_fg = jnp.maximum(jnp.sum(fg), 1)
        midx = jnp.clip(match, 0, None)
        target = jax.nn.one_hot(
            jnp.where(fg, gc[midx], net.num_classes), net.num_classes,
            dtype=cl.dtype,
        )
        p = jax.nn.sigmoid(cl)
        ce = jnp.maximum(cl, 0) - cl * target + jnp.log1p(jnp.exp(-jnp.abs(cl)))
        p_t = p * target + (1 - p) * (1 - target)
        a_t = alpha * target + (1 - alpha) * (1 - target)
        focal = a_t * (1 - p_t) ** gamma * ce
        consider = match != -2  # ignore in-between anchors
        cls_loss = jnp.sum(focal * consider[:, None]) / num_fg

        t_reg = net.encode_boxes(gb[midx], anchors)
        d = rg - t_reg
        ad = jnp.abs(d)
        sl1 = jnp.where(ad < 1.0 / 9.0, 4.5 * d * d, ad - 1.0 / 18.0)
        box_loss = jnp.sum(jnp.sum(sl1, -1) * fg) / num_fg
        return cls_loss, box_loss

    cls_l, box_l = jax.vmap(one)(cls_logits, reg, gt_boxes, gt_cls, gt_valid)
    total = jnp.mean(cls_l) + jnp.mean(box_l)
    return total, {"classification": jnp.mean(cls_l), "bbox_regression": jnp.mean(box_l)}


RETINA_RAW = True
"""Raw-logit tail (trace-time knob; clear retina_postprocess's cache when
flipping). The dense tail computes sigmoid over the FULL (B, A=76,725,
C=91) logit matrix plus a full A-row box decode, although the exact pair
ranking (ops/nms.py _rank_pairs_exact) only ever reads its top
max_cand=2048 boxes. The raw tail hoists that box prefilter in FRONT of
the transcendentals: rank sigmoid(rowmax(logits)) — bit-equal to
max(sigmoid(logits)) because sigmoid is monotone and rounding preserves
order (the ops/nms_raw.py argument) — keep the top-2048 rows per image
with the same chunked topk1d the dense path's prefilter uses, and run
sigmoid/decode/NMS on rows only. f32 detections are bit-identical (the
same values flow through the same selection in the same order — the inner
prefilter re-ranks an already-ranked 2048-row set); bf16 head outputs keep
bit-identical selection/scores/classes with ~1 f32 ulp box-coordinate
drift (the bf16->f32 convert fuses into the decode arithmetic differently
for full-matrix vs gathered-row consumers — the same consumer-dependent
rounding contract as ops/nms_raw.py). Pinned by
tests/test_retinanet.py::test_retina_raw_tail_bit_exact. A/B:
tools/exp_retinaraw.py."""

RETINA_PRE = 2048  # raw-tail box prefilter width == the NMS max_cand


@partial(jax.jit, static_argnames=("net", "max_det", "nms_thresh"))
def retina_postprocess(
    net: RetinaNet,
    cls_logits,
    reg,
    anchors,
    score_thresh: float = 0.05,
    nms_thresh: float = 0.5,
    max_det: int = 300,
):
    """Sigmoid scores -> threshold -> decode -> class-aware NMS.
    Returns (dets (B, max_det, 6) [x1,y1,x2,y2,score,cls], valid).
    Accepts bf16 logits/reg (the serving trunk's output dtype): the raw
    tail casts only the 2048 gathered rows to f32, exactly where the dense
    path cast the full matrices (models/infer.py _detect_generic)."""
    if RETINA_RAW and cls_logits.shape[1] > RETINA_PRE:
        kb = RETINA_PRE
        rowmax = jnp.max(cls_logits, axis=-1)  # exact in any dtype
        score = jax.nn.sigmoid(rowmax.astype(jnp.float32))  # (B, A)
        box_score = jnp.where(score > score_thresh, score, -1.0)
        _, idx = jax.vmap(lambda s: topk1d(s, kb, chunk=10240))(box_score)
        cls_logits = jnp.take_along_axis(
            cls_logits, idx[..., None], axis=1
        ).astype(jnp.float32)
        reg = jnp.take_along_axis(reg, idx[..., None], axis=1).astype(
            jnp.float32
        )
        anchors = anchors[idx]  # (B, kb, 4) — decode_boxes broadcasts
    else:
        cls_logits = cls_logits.astype(jnp.float32)
        reg = reg.astype(jnp.float32)
    scores = jax.nn.sigmoid(cls_logits)
    boxes = net.decode_boxes(reg, anchors)
    boxes = jnp.clip(boxes, 0.0, net.image_size)

    # split NMS core (obj == 1): no packed (N, 5+C) tensor, so no strided
    # minor-dim slices at N=76,725 on TPU. Batched pool=False entry: exact
    # per-image pair ranking (same results as vmap(nms_split)) with the
    # fused Pallas suppressor on TPU (ops/nms.py nms_split_batch).
    xywh = jnp.concatenate(
        [(boxes[..., :2] + boxes[..., 2:4]) * 0.5,
         boxes[..., 2:4] - boxes[..., :2]], axis=-1
    )
    return nms_split_batch(
        jnp.ones(scores.shape[:2], scores.dtype), xywh, scores,
        conf_thres=score_thresh, iou_thres=nms_thresh,
        max_det=max_det, max_cand=2048, multi_label=True, pool=False,
    )


def retinanet_params_from_torch_state_dict(net: RetinaNet, sd):
    """Order-based torchvision retinanet_resnet50_fpn_v2 import. Tower convs
    carry no bias under GroupNorm in torchvision; ours stay zero."""
    from .import_torch import OrderedImporter
    from .resnet import import_resnet_fpn

    params = net.init(jax.random.PRNGKey(0))
    imp = OrderedImporter(sd)
    params = dict(params)
    params["backbone"] = import_resnet_fpn(imp, params["backbone"], "p6p7")

    def tower(layers, name):
        new = []
        for li, layer in enumerate(layers):
            layer = dict(layer)
            layer["w"] = imp.conv(f"{name}.{li}", layer["w"])
            layer["b"] = jnp.zeros_like(layer["b"])  # no conv bias under GN
            gn = dict(layer["gn"])
            gn["g"] = imp.vec(f"{name}.{li}.gn.weight", gn["g"])
            gn["b"] = imp.vec(f"{name}.{li}.gn.bias", gn["b"])
            layer["gn"] = gn
            new.append(layer)
        return new

    params["cls_tower"] = tower(params["cls_tower"], "cls_tower")
    co = dict(params["cls_out"])
    co["w"] = imp.conv("cls_out", co["w"])
    co["b"] = imp.vec("cls_out.bias", co["b"])
    params["cls_out"] = co
    params["reg_tower"] = tower(params["reg_tower"], "reg_tower")
    ro = dict(params["reg_out"])
    ro["w"] = imp.conv("reg_out", ro["w"])
    ro["b"] = imp.vec("reg_out.bias", ro["b"])
    params["reg_out"] = ro
    imp.done()
    return params


RetinaNet.params_from_torch_state_dict = lambda self, sd: \
    retinanet_params_from_torch_state_dict(self, sd)

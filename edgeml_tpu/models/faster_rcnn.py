"""Faster R-CNN-ResNet50-FPN (v2) in pure JAX (fixed-shape two-stage pipeline).

The reference's strongest detector option (fasterrcnn_resnet50_fpn_v2,
/root/reference/torch_models/train.py:17, detect.py:29-33). Torchvision-v2
structure: ResNet50-FPN over C2..C5 (P2..P5 + LastLevelMaxPool), a 2-conv RPN
head with 3 anchors per cell (sizes 32..512 across P2..pool, ratios 0.5/1/2),
multi-scale RoIAlign (7x7, sampling ratio 2, canonical-level mapping over
P2..P5), a 4-conv + 1024-fc box head with per-class regression,
(10,10,5,5)/(1,1,1,1) box coders.

TPU redesign of the dynamic parts:
  * proposal selection: per-level top-k + batched NMS at fixed widths
    (1000 test / 2000 train proposals), padded with validity masks;
  * RoIAlign: every proposal is aligned against every FPN level with a
    one-hot level mask (no ragged gather; 4x compute for zero data-dependent
    shapes);
  * ROI sampling for training: balanced positive/negative selection via
    random-keyed top-k over the match classes.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.metrics import box_iou_safe
from ..ops.nms import non_max_suppression, _iou_one_vs_many, topk1d
from .common import conv2d, conv_init
from .resnet import ResNet50FPN

RPN_STRIDES = (4, 8, 16, 32)  # P2..P5; + maxpool level (stride 64) below
RPN_SIZES = (32, 64, 128, 256)
ASPECT_RATIOS = (0.5, 1.0, 2.0)
ROI_STRIDES = (4, 8, 16, 32)  # RoIAlign featmaps: P2..P5 (pool level excluded)


def rpn_anchors(image_size: int):
    """Per-level (A_l, 4) xyxy anchor arrays for P2..P5+pool (3 per cell,
    torchvision _default_anchorgen: one size per level, 32..512)."""
    out = []
    strides = list(RPN_STRIDES) + [RPN_STRIDES[-1] * 2]
    sizes = list(RPN_SIZES) + [512]
    for size, stride in zip(sizes, strides):
        f = math.ceil(image_size / stride)
        # torchvision convention: aspect_ratio = h/w (see retina_anchors).
        whs = []
        for r in ASPECT_RATIOS:
            whs.append((size / math.sqrt(r), size * math.sqrt(r)))
        whs = np.array(whs, np.float32)
        ys, xs = np.meshgrid(np.arange(f), np.arange(f), indexing="ij")
        cx = (xs.reshape(-1, 1) + 0.5) * stride
        cy = (ys.reshape(-1, 1) + 0.5) * stride
        c = np.stack(
            [np.repeat(cx, 3, 1).reshape(-1), np.repeat(cy, 3, 1).reshape(-1)], 1
        )
        wh = np.tile(whs, (f * f, 1))
        out.append(np.concatenate([c - wh / 2, c + wh / 2], 1).astype(np.float32))
    return out


def _decode(reg, anchors, weights):
    wx, wy, ww, wh = weights
    acx = (anchors[..., 0] + anchors[..., 2]) * 0.5
    acy = (anchors[..., 1] + anchors[..., 3]) * 0.5
    aw = anchors[..., 2] - anchors[..., 0]
    ah = anchors[..., 3] - anchors[..., 1]
    cx = reg[..., 0] / wx * aw + acx
    cy = reg[..., 1] / wy * ah + acy
    w = jnp.exp(jnp.clip(reg[..., 2] / ww, None, math.log(1000.0 / 16))) * aw
    h = jnp.exp(jnp.clip(reg[..., 3] / wh, None, math.log(1000.0 / 16))) * ah
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)


def _encode(gt, anchors, weights):
    wx, wy, ww, wh = weights
    acx = (anchors[..., 0] + anchors[..., 2]) * 0.5
    acy = (anchors[..., 1] + anchors[..., 3]) * 0.5
    # Guard degenerate reference boxes (zero-padded proposals): their targets
    # are masked out of every loss, but inf * 0 would still poison the sums.
    aw = jnp.maximum(anchors[..., 2] - anchors[..., 0], 1e-6)
    ah = jnp.maximum(anchors[..., 3] - anchors[..., 1], 1e-6)
    gcx = (gt[..., 0] + gt[..., 2]) * 0.5
    gcy = (gt[..., 1] + gt[..., 3]) * 0.5
    gw = jnp.maximum(gt[..., 2] - gt[..., 0], 1e-6)
    gh = jnp.maximum(gt[..., 3] - gt[..., 1], 1e-6)
    return jnp.stack(
        [
            wx * (gcx - acx) / aw,
            wy * (gcy - acy) / ah,
            ww * jnp.log(gw / aw),
            wh * jnp.log(gh / ah),
        ],
        -1,
    )


ROI_GATHER = "patch"
"""RoIAlign gather layout (trace-time knob):
  "corner" — four separate gathers (v00/v01/v10/v11), one 256-wide row per
             bilinear corner: 4 * out^2 * sampling^2 gathered rows/proposal;
  "patch"  — ONE lax.gather of (2, 2, C) patches at (y0, x0): same bytes,
             16x fewer gathered rows and one index tensor instead of four;
  "fused"  — the (2, 2, C) patch gathered as a (2, 2C) slice from the
             pyramid reshaped (sum H_l, W_0*C). MEASURED CATASTROPHIC
             (r5c exp_roialign2 B=8: 3,235 ms vs patch's 115) — the
             x0*C start offset is a DYNAMIC index into the minor/lane
             dimension, which does not lower on TPU (CLAUDE.md gather
             rules). Kept only as the negative-result record.
  "pair"   — each pyramid row pre-concatenated with its successor along
             channels ((sum H_l, W_0, 2C)); a sample point then gathers
             ONE (1, 2, 2C) slice at (y0, x0): the same cells as "patch"
             with HALF the gathered rows again, and the dynamic offsets
             stay in sublane dims. Costs one (sum H_l, W_0, 2C) write
             per image (~0.5 ms/batch at bf16) — row count was the
             measured wall (r4j/r5c: ~3.1M rows x ~16 cyc at B=8).
The shifted-corner weight algebra picks the same cells with the same
weights (exact under sequential evaluation — verified against a NumPy
replication), but XLA fuses the two graphs' multiply-adds differently, so
compiled outputs agree to ~2 ulp (<=3e-7 observed), not bitwise ("patch"
and "fused" gather identical values — they differ only in slice shape).
RoIAlign was 78% of the Faster R-CNN serving step (exp_rcnn r4j: +136.0 ms
of 174.8 at B=8): the corner form's gathered-ROW count, not its bytes, was
the wall (25.7 GB touched is a 31 ms bandwidth bound). A/B lives in
tools/exp_nmsblock.py's sibling exp_roialign.py."""

ROI_PYR = "bf16"
"""SERVING RoIAlign pyramid storage dtype (trace-time knob, consumed by
FasterRCNN.detect only — training always follows the training dtype). None
follows the feature dtype (f32 under f32 serving, bf16 under bf16). "bf16"
(default since round 5) stores the level pyramid — a read-only gather
operand — in bfloat16 under f32 serving too, halving the gathered bytes:
r5c exp_roialign2 measured the full B=8 f32 detect at 115.4 ms (pyr f32)
vs 102.8 (pyr bf16), +12% img/s. Bilinear weights and all downstream
decode stay f32; the ~1e-2 relative feature rounding is a documented
f32-contract divergence (docs/DIVERGENCES.md #19) bounded by
tests/test_faster_rcnn.py::test_roi_pyr_bf16_close. Set to None for the
strict all-f32 serving pipeline."""

ROI_W16 = True
"""When the gathered pyramid is bfloat16 (bf16 serving, or ROI_PYR="bf16"
under f32 serving), also run the bilinear weighting in bf16 (trace-time
knob). The (out, s, out, s, 2, 2, C) expansion intermediate is the
RoIAlign tail's HBM traffic (~6.6 GB/B=8-batch at f32) — f32 weights were
silently promoting the bf16 patches back to f32 for it. Weighting in bf16
halves that; the pooled output still upcasts to the head dtype after the
sampling mean. Accuracy rides the same divergence bound as ROI_PYR
(test_roi_pyr_bf16_close covers both). Off => always weight in f32."""

ROI_CHUNK = 1000
"""SERVING proposals per RoIAlign lax.map step (trace-time). 1000 (= the
full proposal set, i.e. UNCHUNKED) is the r5 default: the bf16 pyramid
(ROI_PYR) halves the live bilinear expansion that OOMed the unchunked
f32 form in round 4, and unchunked measured +7% at every serving shape
(r5e/r5i exp_roialign4/5: B=8 f32 103->96 ms; B=16 f32 207->193; B=16
bf16 199->185; no OOM at B=16). Applies to detect only: training
(rcnn_loss) pins ROI_CHUNK_TRAIN — its pyramid stays f32 and the backward
pass roughly doubles the live expansion, the exact combination that
OOMed."""

ROI_CHUNK_TRAIN = 128
"""Training RoIAlign chunk (rcnn_loss.py): the round-4 memory-safe
setting, kept for the f32-pyramid + gradient path."""

ROI_HEAD = None
"""SERVING box-head compute dtype (trace-time knob, detect only). "bf16"
casts the pooled features and box-head conv/fc weights to bfloat16 under
f32 serving (the head's matmul operands are bf16-rounded by the MXU at
DEFAULT precision anyway — this additionally halves the activation
bandwidth of the 4 conv3x3 + fc stack over (P, 7, 7, 256) rows). cls/reg
logits upcast to f32 before softmax/decode as always."""


def roi_align_fpn(feats, boxes, image_size: int, out: int = 7, sampling: int = 2,
                  chunk: int | None = None, pyr_dtype=None):
    """Multi-scale RoIAlign: (N, 4) xyxy boxes -> (N, out, out, C).

    Canonical level mapping k = floor(4 + log2(sqrt(area)/224)) clamped to
    the FPN range (torchvision's MultiScaleRoIAlign LevelMapper, k_min=2,
    k_max=5); feats: list of (H_l, W_l, C) maps for strides 4/8/16/32
    (P2..P5).

    Each box is sampled ONLY on its assigned level, addressed through a
    row-concatenated level pyramid (levels stacked along rows, width padded
    to W_0, per-box row offset). The earlier every-level-then-one-hot-mask
    form had fixed shapes too but was measured at 92% of the whole Faster
    R-CNN serving step (862 of 940 ms/batch at B=16, tools/exp_rcnn.py) —
    a canonically-mapped box spans only ~7-28 grid cells on its OWN level,
    so three quarters of its bilinear gathers were masked-out waste.
    Bit-exact vs the masked form: the one-hot sum selected exactly the
    assigned level's contribution.

    chunk: proposals per lax.map step — bounds the live
    (out, sampling, out, sampling, C) bilinear expansion (the unchunked
    form OOMed a 16 GB chip at batch 16 with 1000 proposals).

    pyr_dtype: optional storage dtype for the gathered pyramid (see
    ROI_PYR — serving passes it; training leaves the features' dtype).
    """
    areas = jnp.maximum(
        (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1]), 1e-6
    )
    k = jnp.floor(4.0 + jnp.log2(jnp.sqrt(areas) / 224.0 + 1e-9))
    k = jnp.clip(k, 2.0, 5.0) - 2.0  # 0..3 over strides 4..32

    n = boxes.shape[0]
    ch = feats[0].shape[-1]
    if n == 0:
        return jnp.zeros((0, out, out, ch), feats[0].dtype)

    heights = [f.shape[0] for f in feats]
    widths = [f.shape[1] for f in feats]
    w0 = widths[0]
    pyr = jnp.concatenate(
        [jnp.pad(f, ((0, 0), (0, w0 - f.shape[1]), (0, 0))) for f in feats],
        axis=0,
    )  # (sum H_l, W_0, C)
    if pyr_dtype is not None:
        pyr = pyr.astype(pyr_dtype)
    pyr_flat = pyr.reshape(pyr.shape[0], -1)  # (sum H_l, W_0*C) for "fused"
    if ROI_GATHER == "pair":
        # row h paired with row h+1 along channels; the global last row's
        # pair partner is a self-duplicate that is never read (every real
        # sample has y0p <= level hi-1, so ro+y0p <= sum H_l - 2).
        pyr_pair = jnp.concatenate(
            [pyr, jnp.concatenate([pyr[1:], pyr[-1:]], axis=0)], axis=-1
        )  # (sum H_l, W_0, 2C)
    row_off = np.cumsum([0] + heights[:-1])

    ki = k.astype(jnp.int32)
    stride_b = jnp.asarray(ROI_STRIDES, jnp.float32)[ki]  # (N,)
    h_b = jnp.asarray(heights, jnp.float32)[ki]
    w_b = jnp.asarray(widths, jnp.float32)[ki]
    off_b = jnp.asarray(row_off, jnp.int32)[ki]

    def one(box, stride, hl, wl, ro):
        b = box / stride
        w = jnp.maximum(b[2] - b[0], 1.0)
        h = jnp.maximum(b[3] - b[1], 1.0)
        bin_h = h / out
        bin_w = w / out
        iy = jnp.arange(sampling) + 0.5
        py = jnp.arange(out)
        ys = b[1] + py[:, None] * bin_h + iy[None, :] * bin_h / sampling
        xs = b[0] + py[:, None] * bin_w + iy[None, :] * bin_w / sampling
        yc = jnp.clip(ys, 0.0, hl - 1)
        xc = jnp.clip(xs, 0.0, wl - 1)
        y0 = jnp.floor(yc).astype(jnp.int32)
        x0 = jnp.floor(xc).astype(jnp.int32)
        hi = hl.astype(jnp.int32) - 1
        wi = wl.astype(jnp.int32) - 1
        if ROI_GATHER == "corner":
            y1 = jnp.minimum(y0 + 1, hi)
            x1 = jnp.minimum(x0 + 1, wi)
            ly = (yc - y0)[:, :, None, None, None]  # (out, s, 1, 1, 1)
            lx = (xc - x0)[None, None, :, :, None]  # (1, 1, out, s, 1)
            v00 = pyr[ro + y0[:, :, None, None], x0[None, None]]
            v01 = pyr[ro + y0[:, :, None, None], x1[None, None]]
            v10 = pyr[ro + y1[:, :, None, None], x0[None, None]]
            v11 = pyr[ro + y1[:, :, None, None], x1[None, None]]
            val = (
                v00 * (1 - ly) * (1 - lx)
                + v01 * (1 - ly) * lx
                + v10 * ly * (1 - lx)
                + v11 * ly * lx
            )
            return jnp.mean(val, axis=(1, 3))  # (out, out, C)
        # "patch": one (2, 2, C) slice per sample point. Shifted-corner
        # algebra: with y0' = min(y0, hi-1) and ly' = yc - y0', the pair
        # (y0', y0'+1) with weights (1-ly', ly') selects exactly the same
        # cells with the same weights as the clamped corner form — when
        # y0 <= hi-1 the indices coincide, and when y0 == hi (yc == hi,
        # so ly == 0) the shift makes ly' == 1, an exact-1 weight on row
        # hi, matching the corner form's exact-0 weight on the duplicate
        # row. x identically. Bit-exact: the selected values and weight
        # products are the same floats.
        # max(.., 0) defines the chunk-pad-row case (hi = 0 -> y0p would be
        # -1, and gather start-index clamping under PROMISE_IN_BOUNDS is
        # implementation-defined); real rows have hi >= 1 so it is a no-op
        y0p = jnp.maximum(jnp.minimum(y0, hi - 1), 0)
        x0p = jnp.maximum(jnp.minimum(x0, wi - 1), 0)
        ly = (yc - y0p)[:, :, None, None]  # (out, s, 1, 1)
        lx = (xc - x0p)[None, None]  # (1, 1, out, s)
        if ROI_W16 and pyr.dtype == jnp.bfloat16:
            # bf16 weighting over a bf16 pyramid (see ROI_W16): keeps the
            # bilinear expansion in bf16 instead of promoting it to f32
            ly = ly.astype(jnp.bfloat16)
            lx = lx.astype(jnp.bfloat16)
        rows = jnp.broadcast_to(
            ro + y0p[:, :, None, None], (out, sampling, out, sampling)
        )
        cols = jnp.broadcast_to(x0p[None, None], (out, sampling, out, sampling))
        ch = pyr.shape[-1]
        if ROI_GATHER == "pair":
            starts = jnp.stack([rows, cols], -1).reshape(-1, 2)
            pair = jax.lax.gather(
                pyr_pair,
                starts,
                jax.lax.GatherDimensionNumbers(
                    offset_dims=(1, 2, 3),
                    collapsed_slice_dims=(),
                    start_index_map=(0, 1),
                ),
                slice_sizes=(1, 2, 2 * ch),
            ).reshape(out, sampling, out, sampling, 2, 2 * ch)
            ly = ly[..., None]
            lx = lx[..., None]
            val = (
                pair[..., 0, :ch] * (1 - ly) * (1 - lx)
                + pair[..., 1, :ch] * (1 - ly) * lx
                + pair[..., 0, ch:] * ly * (1 - lx)
                + pair[..., 1, ch:] * ly * lx
            )
            return jnp.mean(val, axis=(1, 3))  # (out, out, C)
        if ROI_GATHER == "fused":
            # (2, 2C) slice from the (sum H_l, W_0*C) view: identical cells
            # (x0p*C .. x0p*C+2C spans exactly columns x0p, x0p+1 of the
            # 3-D pyramid), half the gathered rows of the (2, 2, C) slab.
            starts = jnp.stack([rows, cols * ch], -1).reshape(-1, 2)
            patches = jax.lax.gather(
                pyr_flat,
                starts,
                jax.lax.GatherDimensionNumbers(
                    offset_dims=(1, 2),
                    collapsed_slice_dims=(),
                    start_index_map=(0, 1),
                ),
                slice_sizes=(2, 2 * ch),
            ).reshape(out, sampling, out, sampling, 2, 2, ch)
        else:
            starts = jnp.stack([rows, cols], -1).reshape(-1, 2)
            patches = jax.lax.gather(
                pyr,
                starts,
                jax.lax.GatherDimensionNumbers(
                    offset_dims=(1, 2, 3),
                    collapsed_slice_dims=(),
                    start_index_map=(0, 1),
                ),
                slice_sizes=(2, 2, ch),
            ).reshape(out, sampling, out, sampling, 2, 2, ch)
        ly = ly[..., None]
        lx = lx[..., None]
        val = (
            patches[..., 0, 0, :] * (1 - ly) * (1 - lx)
            + patches[..., 0, 1, :] * (1 - ly) * lx
            + patches[..., 1, 0, :] * ly * (1 - lx)
            + patches[..., 1, 1, :] * ly * lx
        )
        return jnp.mean(val, axis=(1, 3))  # (out, out, C)

    chunk = min(ROI_CHUNK if chunk is None else chunk, n)
    pad = -n % chunk

    def padded(a, fill=0.0):
        # pad rows are discarded; fill keeps their coordinate math finite
        return jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1),
                       constant_values=fill)

    pooled = jax.lax.map(
        lambda args: jax.vmap(one)(*args),
        (
            padded(boxes).reshape(-1, chunk, 4),
            padded(stride_b, 1.0).reshape(-1, chunk),
            padded(h_b, 1.0).reshape(-1, chunk),
            padded(w_b, 1.0).reshape(-1, chunk),
            padded(off_b, 0).reshape(-1, chunk),
        ),
    )  # (n_chunks, chunk, out, out, C)
    return pooled.reshape(-1, *pooled.shape[2:])[:n]


@dataclasses.dataclass(frozen=True)
class FasterRCNN:
    num_classes: int = 91  # includes background 0
    image_size: int = 640
    rpn_post_nms: int = 1000
    detections_per_img: int = 100

    @property
    def backbone(self):
        return ResNet50FPN(extra="maxpool", first_stage=0)

    def init(self, key):
        p = {}
        key, sub = jax.random.split(key)
        p["backbone"] = self.backbone.init(sub)
        # RPN head (v2: two 3x3 convs).
        key, k1, k2, k3, k4 = jax.random.split(key, 5)
        p["rpn"] = {
            "conv1": {"w": conv_init(k1, 3, 256, 256), "b": jnp.zeros((256,))},
            "conv2": {"w": conv_init(k2, 3, 256, 256), "b": jnp.zeros((256,))},
            "cls": {"w": conv_init(k3, 1, 256, 3), "b": jnp.zeros((3,))},
            "reg": {"w": conv_init(k4, 1, 256, 12), "b": jnp.zeros((12,))},
        }
        # Box head (v2): 4 conv3x3(256)+BN-less (we use bias) + fc1024.
        convs = []
        for _ in range(4):
            key, sub = jax.random.split(key)
            convs.append({"w": conv_init(sub, 3, 256, 256), "b": jnp.zeros((256,))})
        key, kf, kc, kb = jax.random.split(key, 4)
        fan = 256 * 7 * 7
        p["box_head"] = {
            "convs": convs,
            "fc": {
                "w": jax.random.uniform(
                    kf, (fan, 1024), jnp.float32,
                    -1 / math.sqrt(fan), 1 / math.sqrt(fan),
                ),
                "b": jnp.zeros((1024,)),
            },
            "cls": {
                "w": 0.01 * jax.random.normal(kc, (1024, self.num_classes)),
                "b": jnp.zeros((self.num_classes,)),
            },
            "reg": {
                "w": 0.001 * jax.random.normal(kb, (1024, self.num_classes * 4)),
                "b": jnp.zeros((self.num_classes * 4,)),
            },
        }
        return p

    # ---- stages ---------------------------------------------------------------

    def run_rpn(self, params, feats):
        """Per-level (obj_logits (B, A_l), deltas (B, A_l, 4))."""
        outs = []
        for f in feats:
            h = jax.nn.relu(
                conv2d(f, params["rpn"]["conv1"]["w"], 1, padding=((1, 1), (1, 1)))
                + params["rpn"]["conv1"]["b"]
            )
            h = jax.nn.relu(
                conv2d(h, params["rpn"]["conv2"]["w"], 1, padding=((1, 1), (1, 1)))
                + params["rpn"]["conv2"]["b"]
            )
            cls = conv2d(h, params["rpn"]["cls"]["w"], 1) + params["rpn"]["cls"]["b"]
            reg = conv2d(h, params["rpn"]["reg"]["w"], 1) + params["rpn"]["reg"]["b"]
            b, hh, ww, _ = cls.shape
            outs.append(
                (cls.reshape(b, hh * ww * 3), reg.reshape(b, hh * ww * 3, 4))
            )
        return outs

    def proposals(self, rpn_outs, anchors_per_level, pre_nms: int = 1000,
                  nms_thresh: float = 0.7, post_nms: int | None = None):
        """Fixed-width proposal selection per image: per-level top-k + decode +
        NMS, then global top post_nms by score. Returns (boxes (B, P, 4),
        valid (B, P))."""
        post_nms = post_nms or self.rpn_post_nms

        def one_image(level_data):
            cand_boxes, cand_scores = [], []
            for (cls, reg), anc in zip(level_data, anchors_per_level):
                k = min(pre_nms, cls.shape[0])
                # topk1d, not lax.top_k: the P2 level is 76,800 logits at
                # 640^2, inside XLA's measured TopK shape cliff (CLAUDE.md)
                scores, idx = topk1d(cls, k)
                boxes = _decode(reg[idx], anc[idx], (1.0, 1.0, 1.0, 1.0))
                boxes = jnp.clip(boxes, 0.0, self.image_size)
                # drop degenerate boxes
                ok = (boxes[:, 2] - boxes[:, 0] > 1e-3) & (
                    boxes[:, 3] - boxes[:, 1] > 1e-3
                )
                scores = jnp.where(ok, scores, -jnp.inf)
                # per-level NMS at fixed width
                keep_boxes, keep_scores = self._nms_level(
                    boxes, scores, nms_thresh, k
                )
                cand_boxes.append(keep_boxes)
                cand_scores.append(keep_scores)
            all_boxes = jnp.concatenate(cand_boxes)
            all_scores = jnp.concatenate(cand_scores)
            top_scores, top_idx = jax.lax.top_k(
                all_scores, min(post_nms, all_scores.shape[0])
            )
            return all_boxes[top_idx], top_scores > -jnp.inf

        return one_image

    @staticmethod
    def _nms_level(boxes, scores, thresh, width):
        """Greedy NMS keeping order; suppressed entries get -inf scores.

        Runs through the fixpoint suppression (ops/nms.py); objectness logits
        are mapped through sigmoid (monotone, strictly positive) since the
        suppressor treats score <= 0 as invalid.
        """
        from ..ops.nms import suppress_mask

        p = jnp.where(jnp.isfinite(scores), jax.nn.sigmoid(scores), 0.0)
        kept = suppress_mask(boxes, p, float(thresh), min(width, boxes.shape[0]))
        return boxes, jnp.where(kept, p, -jnp.inf)

    def run_box_head(self, params, feats, boxes, pyr_dtype=None,
                     head_dtype=None, chunk=None):
        """RoIAlign + head for one image's (P, 4) proposals ->
        (cls_logits (P, C), deltas (P, C, 4)). pyr_dtype/head_dtype are the
        serving-only ROI_PYR / ROI_HEAD overrides (detect passes them;
        training leaves both None and pins chunk=ROI_CHUNK_TRAIN)."""
        pooled = roi_align_fpn(feats, boxes, self.image_size,
                               chunk=chunk, pyr_dtype=pyr_dtype)
        bh = params["box_head"]
        if head_dtype is not None:
            bh = jax.tree_util.tree_map(
                lambda a: a.astype(head_dtype)
                if getattr(a, "dtype", None) == jnp.float32 else a, bh)
        # bf16 serving: bilinear weights are f32, so pooled promotes to f32
        # even over bf16 feature maps — bring it back to the head's dtype
        h = pooled.astype(bh["convs"][0]["w"].dtype)
        for cp in bh["convs"]:
            h = jax.nn.relu(
                conv2d(h, cp["w"], 1, padding=((1, 1), (1, 1))) + cp["b"]
            )
        h = h.reshape(h.shape[0], -1)
        h = jax.nn.relu(h @ bh["fc"]["w"] + bh["fc"]["b"])
        cls = h @ bh["cls"]["w"] + bh["cls"]["b"]
        reg = h @ bh["reg"]["w"] + bh["reg"]["b"]
        return cls, reg.reshape(-1, self.num_classes, 4)

    # ---- full inference ---------------------------------------------------------

    def detect(self, params, images, anchors_per_level,
               score_thresh: float = 0.05, nms_thresh: float = 0.5,
               dtype=None):
        """images (B, S, S, 3) -> (dets (B, D, 6) [x1,y1,x2,y2,score,cls],
        valid). cls ids are in the model's background-inclusive space.

        dtype: optional compute dtype (jnp.bfloat16) for the backbone, RPN
        head, RoIAlign gathers and box head — the serving speed knob. All
        decision math (proposal decode/top-k/NMS, score softmax, box decode,
        final NMS) stays f32: logits are cast back before any of it."""
        if dtype is not None:
            params = jax.tree_util.tree_map(
                lambda a: a.astype(dtype)
                if getattr(a, "dtype", None) == jnp.float32 else a, params)
            images = images.astype(dtype)
        feats = self.backbone.apply(params["backbone"], images)
        rpn_outs = self.run_rpn(params, feats)
        if dtype is not None:
            rpn_outs = [
                (c.astype(jnp.float32), r.astype(jnp.float32))
                for c, r in rpn_outs
            ]
        prop_fn = self.proposals(rpn_outs, anchors_per_level)

        # serving-only RoIAlign/head dtype knobs (see ROI_PYR / ROI_HEAD):
        # under bf16 serving the pyramid is already bf16 and the head params
        # were cast above, so the overrides only matter for f32 serving.
        pyr_dt = jnp.bfloat16 if (ROI_PYR == "bf16" and dtype is None) else None
        head_dt = jnp.bfloat16 if (ROI_HEAD == "bf16" and dtype is None) \
            else None

        def one(bi_feats, bi_levels):
            boxes, valid = prop_fn(bi_levels)
            cls, reg = self.run_box_head(params, bi_feats, boxes,
                                         pyr_dtype=pyr_dt, head_dtype=head_dt)
            cls = cls.astype(jnp.float32)
            reg = reg.astype(jnp.float32)
            scores = jax.nn.softmax(cls, -1)[:, 1:]  # (P, C-1)
            # per-class decoded boxes
            deltas = reg[:, 1:, :]  # (P, C-1, 4)
            dec = _decode(
                deltas, boxes[:, None, :], (10.0, 10.0, 5.0, 5.0)
            )  # (P, C-1, 4)
            dec = jnp.clip(dec, 0.0, self.image_size)
            scores = jnp.where(valid[:, None], scores, 0.0)
            # one NMS row per (proposal, class)
            nc = scores.shape[1]
            from ..ops.nms import nms_rows

            flat_scores = jnp.where(
                scores > score_thresh, scores, 0.0
            ).reshape(-1)
            flat_cls = jnp.tile(jnp.arange(nc, dtype=dec.dtype), scores.shape[0])
            dets, dvalid = nms_rows(
                dec.reshape(-1, 4), flat_scores, flat_cls,
                iou_thres=nms_thresh, max_det=self.detections_per_img,
            )
            dets = dets.at[:, 5].add(jnp.where(dvalid, 1.0, 0.0))  # +1 for bg
            return dets, dvalid

        # One trace for the whole batch: every per-image op (top_k, fixpoint
        # NMS, RoIAlign gathers, scatters) is vmappable, so the batch runs as
        # one program instead of B unrolled copies.
        return jax.vmap(one)(list(feats[:4]), rpn_outs)


def faster_rcnn_params_from_torch_state_dict(net: FasterRCNN, sd):
    """Order-based torchvision fasterrcnn_resnet50_fpn_v2 import. The v2 FPN
    and box head train their convs under BatchNorm2d; those BN statistics are
    FOLDED into this model's bias-carrying convs (exact at inference). The
    box-head fc input is re-permuted from torch's (C, H, W)-major flatten to
    this model's NHWC (H, W, C)-major flatten."""
    import jax
    import numpy as np

    from .import_torch import OrderedImporter
    from .resnet import import_resnet_fpn

    params = dict(net.init(jax.random.PRNGKey(0)))
    imp = OrderedImporter(sd)
    params["backbone"] = import_resnet_fpn(
        imp, params["backbone"], "maxpool", fpn_norm=True
    )

    rpn = dict(params["rpn"])
    for name in ("conv1", "conv2", "cls", "reg"):
        cp = dict(rpn[name])
        cp["w"] = imp.conv(f"rpn.{name}", cp["w"])
        cp["b"] = imp.vec(f"rpn.{name}.bias", cp["b"])
        rpn[name] = cp
    params["rpn"] = rpn

    bh = dict(params["box_head"])
    convs = []
    for ci, cp in enumerate(bh["convs"]):
        cp = dict(cp)
        w = imp.conv(f"box_head.conv{ci}", cp["w"])  # no bias (BN follows)
        g, b, m, v = imp.bn(
            f"box_head.conv{ci}.bn", cp["b"], cp["b"], cp["b"], cp["b"]
        )
        scale = g * jax.lax.rsqrt(v + 1e-5)
        cp["w"] = w * scale[None, None, None, :]
        cp["b"] = b - m * scale
        convs.append(cp)
    bh["convs"] = convs
    fc = dict(bh["fc"])
    fc["w"] = imp.linear_chw("box_head.fc", fc["w"], (256, 7, 7))
    fc["b"] = imp.vec("box_head.fc.bias", fc["b"])
    bh["fc"] = fc
    for name in ("cls", "reg"):
        cp = dict(bh[name])
        cp["w"] = imp.linear(f"box_predictor.{name}", cp["w"])
        cp["b"] = imp.vec(f"box_predictor.{name}.bias", cp["b"])
        bh[name] = cp
    params["box_head"] = bh
    imp.done()
    return params


FasterRCNN.params_from_torch_state_dict = lambda self, sd: \
    faster_rcnn_params_from_torch_state_dict(self, sd)

"""YOLOv5 (n/s/m/l/x) in pure JAX — the reference's weak/strong detector pair.

The reference treats YOLOv5 as an external torch dependency
(/root/reference/yolov5_scripts.md): train with ultralytics, dump detections
with val.py --save-txt --save-conf, dump hidden-layer feature maps with a
patched feature_visualization. This module is a from-scratch JAX
implementation of the same network family so the whole pipeline runs
XLA-compiled on TPU:

  * CSP backbone (Conv/C3/SPPF), PANet neck, anchor-based Detect head,
    width/depth multiples per variant — architecture per the public yolov5
    model definition (v6.x: 6x6 stem conv, SPPF);
  * NHWC activations, HWIO weights, functional BatchNorm (eps 1e-3,
    momentum 0.03) with separate running stats — one apply() serves
    training (batch stats), inference (running stats), and feature taps;
  * hidden-stage feature taps matching the reference's stage numbering
    (stage index = module index, lib/data.py:99-100);
  * ultralytics state_dict import (OIHW -> HWIO, anchors rescaled from
    grid units back to pixels).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .common import (
    bn_apply,
    conv2d,
    conv2d_stem_s2d,
    conv_init,
    max_pool_same,
    silu,
    upsample2x,
)

BN_EPS = 1e-3
BN_MOMENTUM = 0.03

# Trace-time knob (tools/exp_c3fuse.py): run each C3 block's cv1/cv2 —
# two 1x1 convs over the SAME input — as ONE conv with concatenated output
# channels, then split. Numerically equivalent in both modes (every conv
# output channel, BN channel statistic, and SiLU lane is independent; only
# the conv contraction's summation order can reassociate), and doubles the MXU
# lane utilization of those convs on narrow-channel variants (YOLOv5n's
# first C3 runs cout=16 of 128 lanes). Default OFF until TPU-measured.
C3_FUSE_CV12 = False

# (depth_multiple, width_multiple) per variant.
YOLOV5_VARIANTS = {
    "n": (0.33, 0.25),
    "s": (0.33, 0.50),
    "m": (0.67, 0.75),
    "l": (1.00, 1.00),
    "x": (1.33, 1.25),
}

# Default P5 anchors in pixels, per detection level (stride 8 / 16 / 32).
DEFAULT_ANCHORS = (
    ((10, 13), (16, 30), (33, 23)),
    ((30, 61), (62, 45), (59, 119)),
    ((116, 90), (156, 198), (373, 326)),
)
STRIDES = (8, 16, 32)
HEAD_STAGES = (17, 20, 23)  # layer indices feeding the detect head


def _gw(c, width):
    """Scale channel count by the width multiple, to a multiple of 8."""
    return max(int(math.ceil(c * width / 8) * 8), 8) if c != 3 else 3


def _gd(n, depth):
    return max(round(n * depth), 1)


@dataclasses.dataclass(frozen=True)
class YoloV5:
    """Static architecture spec. Parameters/stats live in separate pytrees."""

    variant: str = "n"
    num_classes: int = 80
    img_size: int = 640
    anchors: tuple = DEFAULT_ANCHORS

    @property
    def depth(self):
        return YOLOV5_VARIANTS[self.variant][0]

    @property
    def width(self):
        return YOLOV5_VARIANTS[self.variant][1]

    @property
    def na(self):
        return len(self.anchors[0])

    @property
    def no(self):
        return self.num_classes + 5

    # ---- layer table -------------------------------------------------------
    # (index, kind, from, kwargs). "from" of -1 means previous output.
    def layers(self):
        w, d = self.width, self.depth
        c = {k: _gw(k, w) for k in (64, 128, 256, 512, 1024)}
        return [
            (0, "conv", -1, dict(cin=3, cout=c[64], k=6, s=2, p=2)),
            (1, "conv", -1, dict(cin=c[64], cout=c[128], k=3, s=2)),
            (2, "c3", -1, dict(cin=c[128], cout=c[128], n=_gd(3, d), shortcut=True)),
            (3, "conv", -1, dict(cin=c[128], cout=c[256], k=3, s=2)),
            (4, "c3", -1, dict(cin=c[256], cout=c[256], n=_gd(6, d), shortcut=True)),
            (5, "conv", -1, dict(cin=c[256], cout=c[512], k=3, s=2)),
            (6, "c3", -1, dict(cin=c[512], cout=c[512], n=_gd(9, d), shortcut=True)),
            (7, "conv", -1, dict(cin=c[512], cout=c[1024], k=3, s=2)),
            (8, "c3", -1, dict(cin=c[1024], cout=c[1024], n=_gd(3, d), shortcut=True)),
            (9, "sppf", -1, dict(cin=c[1024], cout=c[1024], k=5)),
            (10, "conv", -1, dict(cin=c[1024], cout=c[512], k=1, s=1)),
            (11, "up", -1, {}),
            (12, "concat", (-1, 6), {}),
            (13, "c3", -1, dict(cin=c[1024], cout=c[512], n=_gd(3, d), shortcut=False)),
            (14, "conv", -1, dict(cin=c[512], cout=c[256], k=1, s=1)),
            (15, "up", -1, {}),
            (16, "concat", (-1, 4), {}),
            (17, "c3", -1, dict(cin=c[512], cout=c[256], n=_gd(3, d), shortcut=False)),
            (18, "conv", -1, dict(cin=c[256], cout=c[256], k=3, s=2)),
            (19, "concat", (-1, 14), {}),
            (20, "c3", -1, dict(cin=c[512], cout=c[512], n=_gd(3, d), shortcut=False)),
            (21, "conv", -1, dict(cin=c[512], cout=c[512], k=3, s=2)),
            (22, "concat", (-1, 10), {}),
            (23, "c3", -1, dict(cin=c[1024], cout=c[1024], n=_gd(3, d), shortcut=False)),
        ]

    @property
    def head_channels(self):
        w = self.width
        return (_gw(256, w), _gw(512, w), _gw(1024, w))

    # ---- init --------------------------------------------------------------

    def _init_convbn(self, key, cin, cout, k):
        kw, _ = jax.random.split(key)
        return (
            {"w": conv_init(kw, k, cin, cout), "g": jnp.ones((cout,)), "b": jnp.zeros((cout,))},
            {"m": jnp.zeros((cout,)), "v": jnp.ones((cout,))},
        )

    def _init_c3(self, key, cin, cout, n, shortcut):
        ch = cout // 2
        keys = jax.random.split(key, 3 + 2 * n)
        p, s = {}, {}
        p["cv1"], s["cv1"] = self._init_convbn(keys[0], cin, ch, 1)
        p["cv2"], s["cv2"] = self._init_convbn(keys[1], cin, ch, 1)
        p["cv3"], s["cv3"] = self._init_convbn(keys[2], 2 * ch, cout, 1)
        p["m"], s["m"] = [], []
        for j in range(n):
            bp, bs = {}, {}
            bp["cv1"], bs["cv1"] = self._init_convbn(keys[3 + 2 * j], ch, ch, 1)
            bp["cv2"], bs["cv2"] = self._init_convbn(keys[4 + 2 * j], ch, ch, 3)
            p["m"].append(bp)
            s["m"].append(bs)
        return p, s

    def init(self, key):
        params, stats = {}, {}
        for idx, kind, _, kw in self.layers():
            key, sub = jax.random.split(key)
            name = f"l{idx}"
            if kind == "conv":
                params[name], stats[name] = self._init_convbn(
                    sub, kw["cin"], kw["cout"], kw["k"]
                )
            elif kind == "c3":
                params[name], stats[name] = self._init_c3(
                    sub, kw["cin"], kw["cout"], kw["n"], kw["shortcut"]
                )
            elif kind == "sppf":
                ch = kw["cin"] // 2
                p, s = {}, {}
                key, k1, k2 = jax.random.split(key, 3)
                p["cv1"], s["cv1"] = self._init_convbn(k1, kw["cin"], ch, 1)
                p["cv2"], s["cv2"] = self._init_convbn(k2, ch * 4, kw["cout"], 1)
                params[name], stats[name] = p, s
        # Detect head: 1x1 convs with bias, per level.
        det_p = []
        for ch, stride in zip(self.head_channels, STRIDES):
            key, kw_ = jax.random.split(key)
            cout = self.na * self.no
            w = conv_init(kw_, 1, ch, cout)
            # Objectness/class bias priors (yolov5's bias init): obj bias
            # log(8 / (640/stride)^2) per level, cls log(0.6 / (nc - 0.99)).
            b = np.zeros((self.na, self.no), np.float32)
            b[:, 4] = math.log(8 / (self.img_size / stride) ** 2)
            b[:, 5:] = math.log(0.6 / (self.num_classes - 0.99999))
            det_p.append({"w": w, "b": jnp.asarray(b.reshape(-1))})
        params["detect"] = det_p
        return params, stats

    # ---- apply -------------------------------------------------------------

    def _convbn(self, x, p, s, pad, stride, train):
        # Explicit symmetric padding (torch's autopad k//2; the stem uses 2):
        # XLA's SAME padding distributes asymmetrically for stride-2 k=3
        # convolutions ((0,1) instead of torch's (1,1)), which would shift
        # every downsampling layer by one pixel vs imported weights.
        even = x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
        if p["w"].shape[:3] == (6, 6, 3) and stride == 2 and pad == 2 and even:
            # the RGB stem: space-to-depth formulation, same tap set,
            # ~1.7x faster on TPU (see conv2d_stem_s2d). The later k=3 s2
            # downsamplers are deliberately NOT s2d'd: conv2d_s2d_k3s2 wins
            # in isolation (5.1 -> 4.2 ms) but regresses the full pipeline
            # ~7% — the input transpose breaks XLA's fusion with the
            # producing stage (measured bf16 e2e 3378 -> 3141 img/s).
            x = conv2d_stem_s2d(x, p["w"])
        else:
            x = conv2d(x, p["w"], stride, padding=((pad, pad), (pad, pad)))
        x, new_s = bn_apply(
            x,
            {"scale": p["g"], "bias": p["b"], "mean": s["m"], "var": s["v"]},
            eps=BN_EPS,
            momentum=BN_MOMENTUM,
            train=train,
        )
        return silu(x), {"m": new_s["mean"], "v": new_s["var"]}

    def _c3(self, x, p, s, shortcut, train):
        ns = {"m": []}
        if C3_FUSE_CV12:
            ch = p["cv1"]["g"].shape[0]
            pf = {
                "w": jnp.concatenate([p["cv1"]["w"], p["cv2"]["w"]], axis=3),
                "g": jnp.concatenate([p["cv1"]["g"], p["cv2"]["g"]]),
                "b": jnp.concatenate([p["cv1"]["b"], p["cv2"]["b"]]),
            }
            sf = {
                "m": jnp.concatenate([s["cv1"]["m"], s["cv2"]["m"]]),
                "v": jnp.concatenate([s["cv1"]["v"], s["cv2"]["v"]]),
            }
            y12, ns12 = self._convbn(x, pf, sf, 0, 1, train)
            y1, y2 = y12[..., :ch], y12[..., ch:]
            ns["cv1"] = {"m": ns12["m"][:ch], "v": ns12["v"][:ch]}
            ns["cv2"] = {"m": ns12["m"][ch:], "v": ns12["v"][ch:]}
        else:
            y1, ns["cv1"] = self._convbn(x, p["cv1"], s["cv1"], 0, 1, train)
            y2, ns["cv2"] = self._convbn(x, p["cv2"], s["cv2"], 0, 1, train)
        for bp, bs in zip(p["m"], s["m"]):
            b1, n1 = self._convbn(y1, bp["cv1"], bs["cv1"], 0, 1, train)
            b2, n2 = self._convbn(b1, bp["cv2"], bs["cv2"], 1, 1, train)
            y1 = y1 + b2 if shortcut else b2
            ns["m"].append({"cv1": n1, "cv2": n2})
        y, ns["cv3"] = self._convbn(
            jnp.concatenate([y1, y2], axis=-1), p["cv3"], s["cv3"], 0, 1, train
        )
        return y, ns

    def _sppf(self, x, p, s, train):
        ns = {}
        y, ns["cv1"] = self._convbn(x, p["cv1"], s["cv1"], 0, 1, train)
        p1 = max_pool_same(y, 5)
        p2 = max_pool_same(p1, 5)
        p3 = max_pool_same(p2, 5)
        y, ns["cv2"] = self._convbn(
            jnp.concatenate([y, p1, p2, p3], axis=-1), p["cv2"], s["cv2"], 0, 1, train
        )
        return y, ns

    def walk(self, x, conv_fn, c3_fn, sppf_fn):
        """THE single traversal of the YOLOv5 layer graph (backbone + neck).

        Every activation walk over self.layers() — the float serving/
        training trunk (_trunk), the int8 calibration pass
        (models/quant.py _calibrate_walk) and the int8 serving trunk
        (quant.Q8Yolo.trunk) — routes through this one function, so their
        dataflow (conv sources, concat order, up/concat routing) can never
        desynchronize: the quantization grid is only valid because the
        calibration walk matches the serving walks EXACTLY.

        conv_fn/c3_fn/sppf_fn(name, x, kw) compute one block and return its
        output tensor; up/concat routing lives here. Returns
        (head_inputs — the HEAD_STAGES outputs — and the {idx: tensor}
        table of every stage output).
        """
        outputs = {}
        y = x
        for idx, kind, src, kw in self.layers():
            name = f"l{idx}"
            if kind == "conv":
                y = conv_fn(name, y if src == -1 else outputs[src], kw)
            elif kind == "c3":
                y = c3_fn(name, y, kw)
            elif kind == "sppf":
                y = sppf_fn(name, y, kw)
            elif kind == "up":
                y = upsample2x(y)
            elif kind == "concat":
                y = jnp.concatenate([y, outputs[src[1]]], axis=-1)
            else:
                raise ValueError(f"unknown layer kind {kind!r}")
            outputs[idx] = y
        return [outputs[i] for i in HEAD_STAGES], outputs

    def _trunk(self, params, stats, x, train, taps=()):
        """Backbone + neck walk up to the three head inputs (HEAD_STAGES).

        Returns (feat_list, new_stats, tap_dict)."""
        new_stats = {}

        def conv_fn(name, xi, kw):
            y, new_stats[name] = self._convbn(
                xi, params[name], stats[name],
                kw.get("p", kw["k"] // 2), kw["s"], train,
            )
            return y

        def c3_fn(name, xi, kw):
            y, new_stats[name] = self._c3(
                xi, params[name], stats[name], kw["shortcut"], train
            )
            return y

        def sppf_fn(name, xi, kw):
            y, new_stats[name] = self._sppf(xi, params[name], stats[name], train)
            return y

        feats, outputs = self.walk(x, conv_fn, c3_fn, sppf_fn)
        return feats, new_stats, {i: outputs[i] for i in taps}

    def apply(self, params, stats, x, *, train: bool = False, taps=()):
        """Run the network. x: (B, S, S, 3) float32 in [0, 1].

        Returns (level_outputs, new_stats, tap_dict) where level_outputs is a
        list of raw (B, H, W, na, no) head tensors per stride, and tap_dict
        maps requested stage indices (0..23) to their NHWC activations
        (the reference's feature_visualization stages, yolov5_scripts.md:24-42).
        """
        feats, new_stats, tap_out = self._trunk(params, stats, x, train, taps)
        heads = []
        for f, p in zip(feats, params["detect"]):
            h = conv2d(f, p["w"], 1) + p["b"]
            b, hh, ww, _ = h.shape
            heads.append(h.reshape(b, hh, ww, self.na, self.no))
        return heads, new_stats, tap_out

    @staticmethod
    def decode_level_split(h_xy, h_wh, h_obj, h_cls, stride, anchors, na, nc,
                           fuse_conf: bool = False):
        """Anchor decode for one level from SPLIT head components (each a
        separate contiguous conv output — no (.., 85) minor-dim slicing).
        h_xy/h_wh must be float32 (+bias applied); h_obj/h_cls stay in their
        incoming dtype (the serving score path). Shared by the f32/bf16 path
        (predict) and the int8 path (quant.Q8Yolo.predict) so the box
        parameterization cannot drift between them.

        Returns (obj (B, HWna), xywh (B, HWna, 4) f32, cls (B, HWna, nc)).

        fuse_conf=True instead returns (best (B, HWna), xywh, conf
        (B, HWna, nc)) where conf = sigmoid(obj) * sigmoid(cls) and best is
        its row max — the pair-confidence matrix the NMS tail ranks. Fusing
        the multiply + row-max into the head epilogue here (one VPU pass over
        values XLA already touches) lets the tail skip BOTH its full-matrix
        best-confidence pass and the per-box obj gather (ops/nms.py
        conf_fused). Bit-identical to computing them tail-side: rounding is
        monotone, so max_c round(cls_c*obj) == round(max_c(cls_c)*obj) in
        any dtype, and the reference's obj > conf_thres gate is implied by
        conf > conf_thres since conf <= obj elementwise."""
        b, hh, ww = h_obj.shape[:3]
        gx = jnp.arange(ww, dtype=jnp.float32)
        gy = jnp.arange(hh, dtype=jnp.float32)
        grid = jnp.stack(jnp.meshgrid(gx, gy), axis=-1)  # (H, W, 2)
        sxy = jax.nn.sigmoid(h_xy).reshape(b, hh, ww, na, 2)
        xy = (sxy * 2.0 - 0.5 + grid[:, :, None, :]) * stride
        anc = jnp.asarray(anchors, jnp.float32)
        swh = jax.nn.sigmoid(h_wh).reshape(b, hh, ww, na, 2)
        wh = (swh * 2.0) ** 2 * anc[None, None, :, :]
        xywh = jnp.concatenate([xy, wh], -1).reshape(b, -1, 4)
        obj = jax.nn.sigmoid(h_obj).reshape(b, -1)
        cls = jax.nn.sigmoid(h_cls).reshape(b, -1, nc)
        if fuse_conf:
            conf = cls * obj[..., None]
            return jnp.max(conf, axis=-1), xywh, conf
        return obj, xywh, cls

    def predict(self, params, stats, x, *, dtype=None, fuse_conf=False):
        """Serving path: trunk + SPLIT head convs + anchor decode, returning
        contiguous per-component arrays

            (obj (B, N), xywh (B, N, 4) pixel xywh-center, cls (B, N, nc)),

        N = sum over levels of H*W*na, row order identical to decode().

        fuse_conf=True returns (best (B, N), xywh, conf (B, N, nc)) instead
        — the pre-multiplied pair-confidence matrix and its row max, computed
        in the head epilogue (see decode_level_split) so the NMS tail
        (ops/nms.py conf_fused=True) never re-reads the full matrix or
        gathers obj rows. Detections are bit-identical either way.

        Measured negative result (round 3): emitting cls pre-packed as f32
        bf16-pairs (bitcast in the head epilogue, to halve the NMS row-gather
        elements) cost +4.6 ms/128-batch in the trunk — the per-level max and
        bitcast do not fuse into the head convs — while the packed gather
        saved nothing (tools/exp_tail4.py); the plain layout below is the
        fast one.

        TPU rationale: decode()'s (B, N, 85) concat puts obj/cls behind a
        stride-85 minor-dim slice, which on tiled TPU layouts costs more than
        the whole backbone (measured ~11 ms per slice at B=64). Here the head
        conv weights are sliced per component instead — same FLOPs, same
        values (output channels of a conv are independent) — so every
        downstream consumer (top_k, gathers, NMS) reads a contiguous array.

        dtype: optional compute dtype for the serving trunk AND the obj/cls
        score path (e.g. jnp.bfloat16, ~30% faster). Box geometry is always
        decoded in float32 (sub-pixel coordinates near 640 need the mantissa;
        scores in [0, 1] tolerate bf16's 0.4% — the bf16 path is a documented
        speed/accuracy knob with no exactness contract vs the f32 path). The
        f32 default is bit-identical to apply + decode.
        """
        hdtype = jnp.float32 if dtype is None else dtype
        if dtype is not None:
            cast = lambda t: jax.tree_util.tree_map(
                lambda a: a.astype(dtype)
                if getattr(a, "dtype", None) == jnp.float32 else a, t)
            params_t = dict(cast(params), detect=params["detect"])
            feats, _, _ = self._trunk(params_t, cast(stats), x.astype(dtype), False)
        else:
            feats, _, _ = self._trunk(params, stats, x, False)
        na, no, nc = self.na, self.no, self.num_classes
        objs, xywhs, clss = [], [], []
        for f, p, stride, anchors in zip(
            feats, params["detect"], STRIDES, self.anchors
        ):
            w = p["w"].reshape(1, 1, -1, na, no).astype(hdtype)
            bias = p["b"].reshape(na, no).astype(hdtype)
            h_obj = conv2d(f, w[..., 4], 1) + bias[:, 4]
            h_xy = conv2d(f, w[..., 0:2].reshape(1, 1, -1, na * 2), 1) \
                .astype(jnp.float32) + bias[:, 0:2].reshape(-1).astype(jnp.float32)
            h_wh = conv2d(f, w[..., 2:4].reshape(1, 1, -1, na * 2), 1) \
                .astype(jnp.float32) + bias[:, 2:4].reshape(-1).astype(jnp.float32)
            h_cls = conv2d(f, w[..., 5:].reshape(1, 1, -1, na * nc), 1) \
                + bias[:, 5:].reshape(-1)
            o, xw, cl = self.decode_level_split(
                h_xy, h_wh, h_obj, h_cls, stride, anchors, na, nc,
                fuse_conf=fuse_conf)
            objs.append(o)
            xywhs.append(xw)
            clss.append(cl)
        return (
            jnp.concatenate(objs, 1),
            jnp.concatenate(xywhs, 1),
            jnp.concatenate(clss, 1),
        )

    def raw_geometry(self, params=None, dtype=None):
        """Constants for the raw-logit serving tail (ops/nms_raw.py):
        (starts (L+1,) i32 cumulative row offsets, widths (L,) i32,
        strides (L,) f32, table (L*na, 6) f32 rows
        [bias_x, bias_y, bias_w, bias_h, anchor_w, anchor_h]).

        The xy/wh head biases ride here instead of being added full-matrix:
        predict_raw emits the raw conv outputs and the bias is applied per
        gathered row, bit-identically — predict casts the conv output to
        f32 BEFORE adding the bias, so deferring the add changes nothing.
        dtype MUST be the serving dtype: predict rounds the bias through
        that dtype first (`p["b"].astype(hdtype)` then the f32 upcast), so
        the table carries the same rounding (a full-precision f32 bias here
        measured ulp-level box drift vs the decoded bf16 path on trained
        checkpoints — init xy/wh biases are zero and hide it).
        params=None builds a zero-bias table — only valid for zero carries
        (models/infer._zero_carry), where no candidate is ever real."""
        na, no = self.na, self.no
        hdtype = jnp.float32 if dtype is None else dtype
        starts, widths, strides, rows = [0], [], [], []
        for li, (stride, anchors) in enumerate(zip(STRIDES, self.anchors)):
            hw = self.img_size // stride
            starts.append(starts[-1] + hw * hw * na)
            widths.append(hw)
            strides.append(float(stride))
            if params is None:
                bias = jnp.zeros((na, 4), jnp.float32)
            else:
                bias = params["detect"][li]["b"].reshape(na, no)
                bias = bias.astype(hdtype)[:, 0:4].astype(jnp.float32)
            anc = jnp.asarray(anchors, jnp.float32).reshape(na, 2)
            rows.append(jnp.concatenate([bias, anc], axis=1))
        return (
            jnp.asarray(starts, jnp.int32),
            jnp.asarray(widths, jnp.int32),
            jnp.asarray(strides, jnp.float32),
            jnp.concatenate(rows, 0),
        )

    def predict_raw(self, params, stats, x, *, dtype=None):
        """Raw-logit serving path: trunk + split head convs, NO full-matrix
        sigmoid/decode. Returns

            (score (B, N), obj (B, N), xy_raw (B, N, 2), wh_raw (B, N, 2),
             cls_raw (B, N, nc)),

        same row order as predict. obj is sigmoid(h_obj); cls_raw keeps raw
        logits (bias applied — the row max needs it); xy_raw/wh_raw are the
        raw conv outputs WITHOUT bias (it lives in raw_geometry and is added
        per gathered row, in f32, exactly as predict adds it full-matrix).
        score = sigmoid(max_c cls_raw) * obj is bit-equal to the decoded
        path's max_c(sigmoid(cls)) * sigmoid(obj): sigmoid is monotone and
        rounding preserves order, so the max commutes with the rounded
        sigmoid. The NMS tail (ops/nms_raw.nms_split_batch_raw) applies
        sigmoid/decode to the gathered rows only; detections are
        bit-identical to predict + nms_split_batch for both the f32 and the
        bf16 serving modes (tests/test_nms_raw.py).

        TPU rationale: the full (B, N, nc) sigmoid and the (B, N, 4) f32
        box decode are the serving trunk's epilogue bandwidth (the tail
        reads only PAIR_G rows/image), and raw bf16 xy/wh make the whole
        row gather a single lossless one-hot MXU matmul (nms_raw
        _gather_rows_raw) where decoded f32 boxes forced narrow gathers."""
        hdtype = jnp.float32 if dtype is None else dtype
        if dtype is not None:
            cast = lambda t: jax.tree_util.tree_map(
                lambda a: a.astype(dtype)
                if getattr(a, "dtype", None) == jnp.float32 else a, t)
            params_t = dict(cast(params), detect=params["detect"])
            feats, _, _ = self._trunk(
                params_t, cast(stats), x.astype(dtype), False
            )
        else:
            feats, _, _ = self._trunk(params, stats, x, False)
        na, no, nc = self.na, self.no, self.num_classes
        scores, objs, xys, whs, clss = [], [], [], [], []
        for f, p in zip(feats, params["detect"]):
            w = p["w"].reshape(1, 1, -1, na, no).astype(hdtype)
            bias = p["b"].reshape(na, no).astype(hdtype)
            b_, hh, ww = f.shape[:3]
            h_obj = conv2d(f, w[..., 4], 1) + bias[:, 4]
            h_cls = conv2d(f, w[..., 5:].reshape(1, 1, -1, na * nc), 1) \
                + bias[:, 5:].reshape(-1)
            h_xy = conv2d(f, w[..., 0:2].reshape(1, 1, -1, na * 2), 1)
            h_wh = conv2d(f, w[..., 2:4].reshape(1, 1, -1, na * 2), 1)
            # Row max BEFORE the (b, HWna, nc) flatten: splitting the minor
            # dim na*nc -> (na, nc) is layout-free, so the max + sigmoids
            # stay fusable into the head-conv epilogue; reducing AFTER the
            # hh*ww*na merge measured a ~2.8 ms/128-batch trunk penalty
            # (exp_rawablate stage 0, r4e). Same values either way (the max
            # runs over the same nc-groups; reshape order is immaterial).
            cl4 = h_cls.reshape(b_, hh, ww, na, nc)
            o4 = jax.nn.sigmoid(h_obj)  # (b, hh, ww, na)
            sc4 = jax.nn.sigmoid(jnp.max(cl4, axis=-1)) * o4
            scores.append(sc4.reshape(b_, -1))
            objs.append(o4.reshape(b_, -1))
            xys.append(h_xy.reshape(b_, hh * ww * na, 2))
            whs.append(h_wh.reshape(b_, hh * ww * na, 2))
            clss.append(cl4.reshape(b_, hh * ww * na, nc))
        return tuple(
            jnp.concatenate(v, 1) for v in (scores, objs, xys, whs, clss)
        )

    def decode(self, heads):
        """Anchor decode: raw heads -> (B, total, no) with pixel xywh boxes.

        y = sigmoid(h); xy = (2y - 0.5 + cell) * stride; wh = (2y)^2 * anchor
        (the yolov5 v5+ parameterization).
        """
        outs = []
        for h, stride, anchors in zip(heads, STRIDES, self.anchors):
            b, hh, ww, na, no = h.shape
            y = jax.nn.sigmoid(h)
            gx = jnp.arange(ww, dtype=h.dtype)
            gy = jnp.arange(hh, dtype=h.dtype)
            grid = jnp.stack(jnp.meshgrid(gx, gy), axis=-1)  # (H, W, 2) = (x, y)
            xy = (y[..., 0:2] * 2.0 - 0.5 + grid[:, :, None, :]) * stride
            anc = jnp.asarray(anchors, h.dtype)  # (na, 2) pixels
            wh = (y[..., 2:4] * 2.0) ** 2 * anc[None, None, :, :]
            out = jnp.concatenate([xy, wh, y[..., 4:]], axis=-1)
            outs.append(out.reshape(b, hh * ww * na, no))
        return jnp.concatenate(outs, axis=1)

    # ---- weight import -----------------------------------------------------

    def params_from_torch_state_dict(self, sd) -> tuple:
        """Map an ultralytics YOLOv5 state_dict to (params, stats).

        Accepts keys with or without a leading 'model.' prefix; conv weights
        OIHW -> HWIO; 'model.24.anchors' is stored in grid units (anchors /
        stride) and is rescaled back to pixels.
        """

        def get(k):
            for cand in (k, "model." + k, k.replace("model.", "", 1)):
                if cand in sd:
                    v = sd[cand]
                    return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
            raise KeyError(k)

        def convbn(prefix):
            w = get(prefix + ".conv.weight").transpose(2, 3, 1, 0)
            return (
                {
                    "w": jnp.asarray(w),
                    "g": jnp.asarray(get(prefix + ".bn.weight")),
                    "b": jnp.asarray(get(prefix + ".bn.bias")),
                },
                {
                    "m": jnp.asarray(get(prefix + ".bn.running_mean")),
                    "v": jnp.asarray(get(prefix + ".bn.running_var")),
                },
            )

        params, stats = {}, {}
        for idx, kind, _, kw in self.layers():
            name = f"l{idx}"
            pre = f"model.{idx}"
            if kind == "conv":
                params[name], stats[name] = convbn(pre)
            elif kind == "c3":
                p, s = {}, {}
                for cv in ("cv1", "cv2", "cv3"):
                    p[cv], s[cv] = convbn(f"{pre}.{cv}")
                p["m"], s["m"] = [], []
                for j in range(kw["n"]):
                    bp, bs = {}, {}
                    for cv in ("cv1", "cv2"):
                        bp[cv], bs[cv] = convbn(f"{pre}.m.{j}.{cv}")
                    p["m"].append(bp)
                    s["m"].append(bs)
                params[name], stats[name] = p, s
            elif kind == "sppf":
                p, s = {}, {}
                p["cv1"], s["cv1"] = convbn(f"{pre}.cv1")
                p["cv2"], s["cv2"] = convbn(f"{pre}.cv2")
                params[name], stats[name] = p, s
        det = []
        for li in range(3):
            w = get(f"model.24.m.{li}.weight").transpose(2, 3, 1, 0)
            b = get(f"model.24.m.{li}.bias")
            det.append({"w": jnp.asarray(w), "b": jnp.asarray(b)})
        params["detect"] = det
        try:
            anchors_grid = get("model.24.anchors")  # (3, na, 2), grid units
            anchors_px = anchors_grid * np.asarray(STRIDES)[:, None, None]
            object.__setattr__(  # frozen dataclass: update spec to checkpoint
                self, "anchors",
                tuple(tuple(map(tuple, lvl)) for lvl in anchors_px.tolist()),
            )
        except KeyError:
            pass
        return params, stats


def _map_bn_nodes(tree, fn):
    """Apply fn to every BatchNorm stats node ({"m", "v"} leaf dict)."""
    if isinstance(tree, dict):
        # BN stats leaves are {"m": arr, "v": arr}; C3 blocks also use "m"
        # as their bottleneck-LIST key, so require both values be arrays.
        if (
            "m" in tree and "v" in tree
            and not isinstance(tree["m"], (dict, list, tuple))
            and not isinstance(tree["v"], (dict, list, tuple))
        ):
            return fn(tree)
        return {k: _map_bn_nodes(v, fn) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return type(tree)(_map_bn_nodes(v, fn) for v in tree)
    return tree


def calibrate_bn(net: YoloV5, params, stats, images_fn, iters: int = 6):
    """Set BatchNorm running statistics to the network's ACTUAL activation
    statistics, pooled over `iters` train-mode calibration batches.

    Each train-mode pass normalizes with its own batch statistics (the
    running stats never feed back), so the passes are independent samples;
    the momentum update is inverted per pass (batch = old + (new - old) /
    momentum) to recover the raw batch moments, and the passes are pooled
    in (E[x], E[x^2]) space — the law-of-total-variance combination — so
    ALL iters batches contribute to the estimate, not just the last one.

    Torch-default conv init is not gain-preserving: with never-updated init
    stats (mean 0 / var 1), activations decay ~40x per stage and the head
    sees ~zero input — random-weight serving then scores every candidate at
    its bias constant, a degenerate NMS workload of massive exact ties
    (measured; bench.py uses this so its synthetic serving distribution is
    realistic). Calibrate at the SERVING image size: spatial statistics are
    size-dependent and stats calibrated at 64 px diverge at 640.

    :param images_fn: iteration -> (B, S, S, 3) calibration batch.
    """
    moments = None
    for i in range(iters):
        _, new_stats, _ = net.apply(params, stats, images_fn(i), train=True)
        batch = jax.tree_util.tree_map(
            lambda o, n: o + (n - o) / BN_MOMENTUM, stats, new_stats
        )
        if iters == 1:  # exact single-batch stats, no moment roundtrip
            return batch
        mom = _map_bn_nodes(
            batch, lambda s: {"m": s["m"], "v": s["v"] + s["m"] ** 2}
        )
        moments = (
            mom if moments is None
            else jax.tree_util.tree_map(jnp.add, moments, mom)
        )
    moments = jax.tree_util.tree_map(lambda a: a / iters, moments)
    return _map_bn_nodes(
        moments,
        lambda s: {"m": s["m"], "v": jnp.maximum(s["v"] - s["m"] ** 2, 0.0)},
    )


def fuse_convbn(params, stats, eps: float = BN_EPS):
    """Fold BatchNorm statistics into conv weights for inference.

    Returns (fused_params, zeroed_stats) such that apply(..., train=False)
    is numerically equivalent but each Conv+BN collapses into one conv with
    bias — fewer HBM passes per layer at serving time.
    """

    def fold(p, s):
        if not (isinstance(p, dict) and "w" in p and "g" in p):
            return None
        scale = p["g"] * jax.lax.rsqrt(s["v"] + eps)
        return (
            {"w": p["w"] * scale[None, None, None, :],
             "g": jnp.ones_like(p["g"]),
             "b": p["b"] - s["m"] * scale},
            {"m": jnp.zeros_like(s["m"]), "v": jnp.ones_like(s["v"])},
        )

    def walk(p, s):
        out = fold(p, s)
        if out is not None:
            return out
        if isinstance(p, dict):
            new_p, new_s = {}, {}
            for k in p:
                if k in (s or {}):
                    new_p[k], new_s[k] = walk(p[k], s[k])
                else:
                    new_p[k] = p[k]
            return new_p, new_s
        if isinstance(p, list):
            pairs = [walk(a, b) for a, b in zip(p, s)]
            return [a for a, _ in pairs], [b for _, b in pairs]
        return p, s

    new_params, new_stats = {}, {}
    for k in params:
        if k in stats:
            new_params[k], new_stats[k] = walk(params[k], stats[k])
        else:
            new_params[k] = params[k]
    return new_params, new_stats

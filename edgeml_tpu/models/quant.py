"""Post-training int8 quantization for the YOLOv5 serving trunk.

The reference serves its detectors in f32/AMP on CUDA
(/root/reference/torch_models/detect.py:72-78); on TPU the MXU runs int8
contractions at ~2x the bf16 rate with half the operand bandwidth, so an
int8 trunk is the TPU-native edge-deployment knob (this framework's whole
domain is edge object detection). This module implements symmetric
post-training quantization (PTQ):

  * BatchNorm folded into conv weights/bias FIRST (exact fold — the
    quantized walk applies no BN), so each layer is conv-int8 -> int32 ->
    per-channel dequant + bias + SiLU -> requantize, and everything after
    the MXU contraction is one fused elementwise epilogue.
  * Weights: per-OUTPUT-channel symmetric scales (absmax/127). Where a
    conv's input is a concat of tensors with different activation scales,
    the per-group input scales are absorbed into the f32 weights BEFORE
    weight quantization (w'[.., i in g, o] = w * s_g), which is exact, so
    the int8 conv needs only one scalar activation scale of 1.0 and a
    per-output-channel dequant factor.
  * Activations: per-TENSOR symmetric scales calibrated post-training by
    recording absmax of every producer output over calibration batches
    (the same images_fn protocol as calibrate_bn). Producers emit int8 in
    their own epilogue; nearest-neighbour upsample and max-pool operate on
    int8 directly (both commute with the monotone quantizer).
  * C3 shortcut adds run on DEQUANTIZED values inside the adding conv's
    epilogue and requantize at the sum's own calibrated scale.
  * The detect head (1x1 convs) consumes the int8 feature maps with
    quantized weights too; its raw logits are dequantized to float for the
    sigmoid/box decode, so the output contract matches YoloV5.predict
    ((obj, xywh, cls) with f32 boxes).

Accuracy is a measured knob, not a contract: int8 PTQ perturbs scores and
boxes (tests/test_quant.py pins the drift bounds; tools/exp_q8.py measures
trunk throughput on the chip); exactness-critical pipelines keep the
f32/bf16 paths.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .common import conv2d, max_pool_same, silu
from .yolov5 import BN_EPS, HEAD_STAGES, STRIDES, YoloV5


def _fold_convbn(p, s, eps=BN_EPS):
    """Exact BN fold: returns (w, b) such that conv(x, w) + b equals
    silu-less conv+BN eval. (fuse_convbn keeps the BN op in the walk and
    re-applies rsqrt(1+eps); this fold is used by a walk with NO BN op.)"""
    scale = p["g"] * jax.lax.rsqrt(s["v"] + eps)
    return p["w"] * scale[None, None, None, :], p["b"] - s["m"] * scale


def quantize_tensor(x, scale):
    """Symmetric int8 quantization: round-to-nearest-even, clip to ±127."""
    return jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)


def _quantize_weight(w, in_scales=None, in_groups=None):
    """Per-output-channel symmetric int8 weights.

    in_scales/in_groups: optional per-input-channel-group activation scales
    to absorb into the f32 weights before quantization (exact), so a concat
    input with heterogeneous scales still needs only one int8 contraction.
    in_groups is a list of (start, stop) channel ranges matching in_scales.
    """
    w = jnp.asarray(w, jnp.float32)
    if in_scales is not None:
        parts = []
        for (lo, hi), s in zip(in_groups, in_scales):
            parts.append(w[:, :, lo:hi, :] * s)
        w = jnp.concatenate(parts, axis=2)
    amax = jnp.max(jnp.abs(w), axis=(0, 1, 2))  # per cout
    wscale = jnp.maximum(amax, 1e-12) / 127.0
    wq = quantize_tensor(w, wscale[None, None, None, :])
    return wq, wscale


def _qconv(xq, wq, dq_scale, bias, stride, pad):
    """int8 x int8 -> int32 conv on the MXU, dequantized per output channel.

    Returns float32 pre-activation (dq_scale already includes the input's
    activation scale)."""
    y = jax.lax.conv_general_dilated(
        xq, wq, (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    return y.astype(jnp.float32) * dq_scale + bias


def _qconv_stem_s2d(xq, wq, dq_scale, bias):
    """The RGB stem (6x6 s2 p2) as a 3x3 s1 conv over the 2x2 space-to-depth
    input — common.conv2d_stem_s2d's transform on the int8 operands. The tap
    set is identical and int32 accumulation is exact, so this is BIT-equal
    to the plain quantized stem (tests/test_quant.py), unlike the float
    version where only the summation order differs."""
    b, h, wd, c = xq.shape
    k = wq.shape[0]
    kh = k // 2
    xs = (
        xq.reshape(b, h // 2, 2, wd // 2, 2, c)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(b, h // 2, wd // 2, 4 * c)
    )
    ws = (
        wq.reshape(kh, 2, kh, 2, c, -1)
        .transpose(0, 2, 1, 3, 4, 5)
        .reshape(kh, kh, 4 * c, -1)
    )
    p = kh // 2
    y = jax.lax.conv_general_dilated(
        xs, ws, (1, 1), ((p, p), (p, p)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    return y.astype(jnp.float32) * dq_scale + bias


# ---------------------------------------------------------------------------
# The quantized trunk walk. Both walks below traverse the layer graph via
# YoloV5.walk — the ONE shared traversal also used by the float trunk — so
# calibration, float and int8 serving can never desynchronize. Node naming:
# "l{idx}" for layer outputs, "l{idx}/cv1" etc. for C3/SPPF internals,
# "l{idx}/m{j}/sum" for shortcut sums, "in" for the input image.
# ---------------------------------------------------------------------------


def _calibrate_walk(net: YoloV5, fused, x, amax):
    """One f32 forward pass over BN-folded weights, recording absmax of every
    activation tensor into `amax` (dict name -> scalar array). Returns the
    three head inputs. The f32 values here define the quantization grid;
    dataflow equality with Q8Yolo.trunk is guaranteed by sharing
    YoloV5.walk — only the per-block compute differs."""

    def rec(name, v):
        a = jnp.max(jnp.abs(v))
        amax[name] = jnp.maximum(amax.get(name, jnp.zeros(())), a)
        return v

    def convbn(name, x, fp, pad, stride):
        w, b = fp
        return rec(name, silu(
            conv2d(x, w, stride, padding=((pad, pad), (pad, pad))) + b))

    def conv_fn(name, xi, kw):
        return convbn(name, xi, fused[name], kw.get("p", kw["k"] // 2),
                      kw["s"])

    def c3_fn(name, xi, kw):
        fp = fused[name]
        y1 = convbn(f"{name}/cv1", xi, fp["cv1"], 0, 1)
        y2 = convbn(f"{name}/cv2", xi, fp["cv2"], 0, 1)
        for j, bp in enumerate(fp["m"]):
            b1 = convbn(f"{name}/m{j}/cv1", y1, bp["cv1"], 0, 1)
            b2 = convbn(f"{name}/m{j}/cv2", b1, bp["cv2"], 1, 1)
            y1 = rec(f"{name}/m{j}/sum", y1 + b2) if kw["shortcut"] else b2
        return convbn(
            f"{name}/cv3", jnp.concatenate([y1, y2], -1), fp["cv3"], 0, 1)

    def sppf_fn(name, xi, kw):
        fp = fused[name]
        y = convbn(f"{name}/cv1", xi, fp["cv1"], 0, 1)
        p1 = max_pool_same(y, 5)
        p2 = max_pool_same(p1, 5)
        p3 = max_pool_same(p2, 5)
        return convbn(f"{name}/cv2", jnp.concatenate([y, p1, p2, p3], -1),
                      fp["cv2"], 0, 1)

    rec("in", x)
    feats, _ = net.walk(x, conv_fn, c3_fn, sppf_fn)
    return feats


class Q8Yolo:
    """Quantized parameter bundle + the int8 serving walk.

    The quantized arrays live in `.tree` — a plain pytree (pass it as a
    TRACED jit argument; see q8_predict) so jitted serving programs don't
    bake the weights in as constants."""

    def __init__(self, net: YoloV5, qparams, scales, detect_q):
        self.net = net
        self.qparams = qparams  # name -> {"w": int8, "dq": f32 (cout,), "b": f32}
        self.scales = scales  # node name -> f32 scalar activation scale
        self.detect_q = detect_q  # per level {"w": int8, "dq": (cout,), "b": ...}

    @property
    def tree(self):
        """The quantized state as one pytree (for jit/sharding plumbing)."""
        return {"qparams": self.qparams, "scales": self.scales,
                "detect": self.detect_q}

    # -- serving -------------------------------------------------------------

    def _emit(self, name, y_f32):
        """Requantize a producer's f32 epilogue value at its own scale."""
        return quantize_tensor(y_f32, self.scales[name])

    def _convbn_q(self, name, xq, pad, stride, emit=True):
        qp = self.qparams[name]
        even = xq.shape[1] % 2 == 0 and xq.shape[2] % 2 == 0
        if qp["w"].shape[:3] == (6, 6, 3) and stride == 2 and pad == 2 and even:
            # the RGB stem: space-to-depth, bit-equal in int8 (see
            # _qconv_stem_s2d) and the same ~1.7x TPU win as the f32/bf16
            # stem (3-channel minor dims tile terribly on the MXU)
            y = silu(_qconv_stem_s2d(xq, qp["w"], qp["dq"], qp["b"]))
        else:
            y = silu(_qconv(xq, qp["w"], qp["dq"], qp["b"], stride, pad))
        return self._emit(name, y) if emit else y

    def _c3_q(self, name, xq, shortcut):
        y1 = self._convbn_q(f"{name}/cv1", xq, 0, 1)
        y2 = self._convbn_q(f"{name}/cv2", xq, 0, 1)
        for j in self.qparams_children(name):
            b1 = self._convbn_q(f"{name}/m{j}/cv1", y1, 0, 1)
            if shortcut:
                # dequantized add fused into cv2's epilogue, requantized at
                # the sum's own calibrated scale
                b2 = self._convbn_q(f"{name}/m{j}/cv2", b1, 1, 1, emit=False)
                s1 = self.scales[
                    f"{name}/cv1" if j == 0 else f"{name}/m{j - 1}/sum"]
                y1 = self._emit(
                    f"{name}/m{j}/sum", y1.astype(jnp.float32) * s1 + b2)
            else:
                y1 = self._convbn_q(f"{name}/m{j}/cv2", b1, 1, 1)
        yc = jnp.concatenate([y1, y2], axis=-1)
        return self._convbn_q(f"{name}/cv3", yc, 0, 1)

    def qparams_children(self, name):
        out = []
        j = 0
        while f"{name}/m{j}/cv1" in self.qparams:
            out.append(j)
            j += 1
        return out

    def _sppf_q(self, name, xq):
        y = self._convbn_q(f"{name}/cv1", xq, 0, 1)
        p1 = max_pool_same(y, 5)
        p2 = max_pool_same(p1, 5)
        p3 = max_pool_same(p2, 5)
        return self._convbn_q(
            f"{name}/cv2", jnp.concatenate([y, p1, p2, p3], -1), 0, 1)

    def trunk(self, x):
        """x: (B, S, S, 3) f32 in [0, 1]. Returns the three int8 head inputs
        (HEAD_STAGES) — traversal shared with the float trunk and the
        calibration pass via YoloV5.walk."""
        xq = quantize_tensor(x, self.scales["in"])
        feats, _ = self.net.walk(
            xq,
            lambda name, xi, kw: self._convbn_q(
                name, xi, kw.get("p", kw["k"] // 2), kw["s"]),
            lambda name, xi, kw: self._c3_q(name, xi, kw["shortcut"]),
            lambda name, xi, kw: self._sppf_q(name, xi),
        )
        return feats

    def predict(self, x, score_dtype=None, fuse_conf=False):
        """Full int8 serving path; same output contract as YoloV5.predict:
        (obj (B, N), xywh (B, N, 4) f32 pixel xywh, cls (B, N, nc)) —
        or (best, xywh, conf) with fuse_conf=True (see YoloV5.predict).

        The head follows YoloV5.predict's split-weight scheme — per-component
        1x1 convs on contiguous output-channel groups (weights, dq scales
        and biases slice independently per output channel) — so no (.., 85)
        minor-dim activation slice ever reaches the TPU (CLAUDE.md: one such
        slice costs more than the whole YOLOv5n backbone). Decode itself is
        YoloV5.decode_level_split, shared with the f32/bf16 path.

        score_dtype (e.g. bfloat16) casts the dequantized obj/cls logits
        before the sigmoid — the int8-trunk analogue of predict(dtype=bf16)'s
        score path, enabling the keyed bf16 NMS tail (ops/nms.py _use_keys)
        downstream. Box logits always stay float32."""
        net = self.net
        feats = self.trunk(x)
        na, no, nc = net.na, net.no, net.num_classes
        objs, xywhs, clss = [], [], []
        for f, qp, stride, anchors in zip(
            feats, self.detect_q, STRIDES, net.anchors
        ):
            w = qp["w"].reshape(1, 1, -1, na, no)
            dq = qp["dq"].reshape(na, no)
            bias = qp["b"].reshape(na, no)

            def comp(sl, w=w, dq=dq, bias=bias, f=f):
                wi = w[..., sl]
                wi = wi.reshape(1, 1, wi.shape[2], -1)
                return _qconv(
                    f, wi, dq[:, sl].reshape(-1), bias[:, sl].reshape(-1),
                    1, 0,
                )

            h_obj = comp(4)
            h_xy = comp(slice(0, 2))
            h_wh = comp(slice(2, 4))
            h_cls = comp(slice(5, no))
            if score_dtype is not None:
                h_obj = h_obj.astype(score_dtype)
                h_cls = h_cls.astype(score_dtype)
            o, xw, cl = net.decode_level_split(
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


def prepare_int8(net: YoloV5, params, stats, images_fn, iters: int = 4):
    """Build a Q8Yolo from trained/imported weights.

    images_fn: iteration -> (B, S, S, 3) calibration batch (same protocol as
    calibrate_bn). The BN stats are folded exactly; activation scales are
    absmax over the calibration batches.
    """
    # 1. exact BN fold into (w, b) pairs keyed like the quantized walk
    fused = {}

    def fold_tree(name, p, s):
        if isinstance(p, dict) and "w" in p and "g" in p:
            fused_entry = _fold_convbn(p, s)
            return fused_entry
        if isinstance(p, dict):
            return {k: fold_tree(f"{name}/{k}", p[k], s[k]) for k in p}
        if isinstance(p, list):
            return [fold_tree(f"{name}/m{j}", a, b)
                    for j, (a, b) in enumerate(zip(p, s))]
        raise TypeError(type(p))

    for idx, kind, _, _ in net.layers():
        name = f"l{idx}"
        if name in params:
            fused[name] = fold_tree(name, params[name], stats[name])

    # 2. calibrate activation absmax over the f32 folded walk — ONE jitted
    # program over the stacked calibration batches (the eager walk would be
    # hundreds of per-op launches through the TPU tunnel)
    batches = jnp.stack([images_fn(i) for i in range(iters)])

    @partial(jax.jit, static_argnames=("net_",))
    def calib(net_, fused_, batches_):
        amax = {}
        for i in range(batches_.shape[0]):
            batch_amax = {}
            _calibrate_walk(net_, fused_, batches_[i], batch_amax)
            for k, v in batch_amax.items():
                prev = amax.get(k)
                amax[k] = v if prev is None else jnp.maximum(prev, v)
        return {k: jnp.maximum(v, 1e-6) / 127.0 for k, v in amax.items()}

    scales = calib(net, fused, batches)

    # 3. quantize weights, absorbing input activation scales
    layer_table = {idx: (kind, src, kw) for idx, kind, src, kw in net.layers()}

    def out_node(i):
        """Scale-table name of layer i's OUTPUT tensor (the last conv of the
        block — matching both walks' record/emit points)."""
        k, _, _ = layer_table[i]
        return {"c3": f"l{i}/cv3", "sppf": f"l{i}/cv2"}.get(k, f"l{i}")

    def input_nodes(idx):
        """Concat-aware input node list for layer idx (in channel order).
        Every conv/c3/sppf in the layer table consumes the previous layer;
        up/concat pseudo-layers are traversed back to their producers."""

        def resolve(i):
            k, s, _ = layer_table[i]
            if k == "concat":
                return resolve(i - 1 if s[0] == -1 else s[0]) + resolve(s[1])
            if k == "up":
                return resolve(i - 1)
            return [out_node(i)]

        if idx == 0:
            return ["in"]
        # The serving/calibration walks route conv inputs via `src`; this
        # scale resolution assumes the table's universal src == -1. A future
        # variant with a non-previous conv source must extend resolve() too —
        # fail loudly instead of absorbing the wrong activation scale.
        assert layer_table[idx][1] == -1, (idx, layer_table[idx])
        return resolve(idx - 1)

    def build_all(fused_, scales_, detect_p):
        """Steps 3+4 as ONE jitted program (per-conv eager quantization would
        be hundreds of tiny tunnel launches)."""
        qparams = {}

        def qw(name, fp, in_nodes, widths):
            w, b = fp
            groups, scl, lo = [], [], 0
            for node, width in zip(in_nodes, widths):
                groups.append((lo, lo + width))
                scl.append(scales_[node])
                lo += width
            assert lo == w.shape[2], (name, lo, w.shape)
            wq, wscale = _quantize_weight(w, scl, groups)
            qparams[name] = {"w": wq, "dq": wscale[None, None, None, :],
                             "b": jnp.asarray(b, jnp.float32)}

        def node_width(node):
            """Channel width of a producer node = cout of its last conv."""
            if node == "in":
                return 3
            idx = int(node[1:].split("/")[0])
            kind, _, kw = layer_table[idx]
            return kw["cout"] if "cout" in kw else None

        for idx, kind, src, kw in net.layers():
            name = f"l{idx}"
            if kind == "conv":
                nodes = input_nodes(idx)
                qw(name, fused_[name], nodes, [node_width(n) for n in nodes])
            elif kind == "c3":
                nodes = input_nodes(idx)
                widths = [node_width(n) for n in nodes]
                qw(f"{name}/cv1", fused_[name]["cv1"], nodes, widths)
                qw(f"{name}/cv2", fused_[name]["cv2"], nodes, widths)
                ch = fused_[name]["cv1"][0].shape[3]
                for j, bp in enumerate(fused_[name]["m"]):
                    y1_node = (f"{name}/cv1" if j == 0
                               else (f"{name}/m{j - 1}/sum" if kw["shortcut"]
                                     else f"{name}/m{j - 1}/cv2"))
                    qw(f"{name}/m{j}/cv1", bp["cv1"], [y1_node], [ch])
                    qw(f"{name}/m{j}/cv2", bp["cv2"],
                       [f"{name}/m{j}/cv1"], [ch])
                n = len(fused_[name]["m"])
                y1_final = (f"{name}/m{n - 1}/sum" if kw["shortcut"] and n
                            else (f"{name}/m{n - 1}/cv2" if n
                                  else f"{name}/cv1"))
                qw(f"{name}/cv3", fused_[name]["cv3"],
                   [y1_final, f"{name}/cv2"], [ch, ch])
            elif kind == "sppf":
                nodes = input_nodes(idx)
                widths = [node_width(n) for n in nodes]
                qw(f"{name}/cv1", fused_[name]["cv1"], nodes, widths)
                ch = fused_[name]["cv1"][0].shape[3]
                # y, p1, p2, p3 all share cv1's scale (max pool keeps it)
                qw(f"{name}/cv2", fused_[name]["cv2"],
                   [f"{name}/cv1"] * 4, [ch] * 4)

        # 4. detect head: 1x1 convs on the stage 17/20/23 int8 features
        detect_q = []
        for feat_idx, p in zip(HEAD_STAGES, detect_p):
            wq, wscale = _quantize_weight(
                p["w"], [scales_[out_node(feat_idx)]], [(0, p["w"].shape[2])])
            detect_q.append({"w": wq, "dq": wscale[None, None, None, :],
                             "b": jnp.asarray(p["b"], jnp.float32)})
        return qparams, detect_q

    qparams, detect_q = jax.jit(build_all)(fused, scales, params["detect"])
    return Q8Yolo(net, qparams, scales, detect_q)


def q8_predict(net: YoloV5, tree, x, score_dtype=None, fuse_conf=False):
    """Functional int8 serving entry: same contract as YoloV5.predict but
    over the quantized pytree (Q8Yolo.tree). `net` is static structure;
    `tree` and `x` are traced, so jitted callers (models/infer.py) keep the
    quantized weights as runtime arguments. score_dtype/fuse_conf: see
    Q8Yolo.predict."""
    return Q8Yolo(net, tree["qparams"], tree["scales"],
                  tree["detect"]).predict(x, score_dtype=score_dtype,
                                          fuse_conf=fuse_conf)

"""Post-training int8 quantization for the SSDLite320-MobileNetV3 trunk.

The reference serves SSDLite as its default weak torchvision detector
(/root/reference/torch_models/detect.py:23-27); models/quant.py built the
int8 PTQ path for YOLO only. This module extends the same scheme to the
MobileNetV3 + SSDLite extras + depthwise-separable heads:

  * BatchNorm folded exactly (quant._fold_convbn, eps=1e-3 here);
  * weights per-OUTPUT-channel symmetric (works unchanged for depthwise
    convs: groups == cin means each output channel has its own k*k*1
    filter); activations per-TENSOR symmetric absmax over calibration
    batches;
  * every conv has exactly ONE input tensor (no concats anywhere in this
    family), so the input's activation scale folds into the dequant factor
    (dq = s_in * s_w[cout]) instead of the weight-absorption dance the
    YOLO C3 concats need;
  * epilogues: hardswish / relu / relu6 run on the dequantized f32
    pre-activation, then requantize at the consumer-facing calibrated
    scale — conv-int8 -> int32 -> f32 dequant+bias -> act -> int8, one
    fused elementwise chain per layer;
  * Squeeze-Excite stays f32: it pools to a (1, 1, C) vector (~nothing to
    quantize) and its hardsigmoid gate multiplies the f32 pre-emit dw
    output; the post-SE product gets its own scale;
  * inverted-residual adds run on dequantized values and requantize at the
    sum's own scale (the C3-shortcut pattern, quant.py docstring);
  * head projection convs consume int8 features with int8 weights and emit
    f32 logits (softmax/decode stay f32 — ssd_postprocess unchanged).

Calibration and int8 serving share ONE traversal (_ssd_walk) driven by two
small contexts, so the scale table and the quantized dataflow can never
desynchronize — the quant.py YoloV5.walk discipline, ported.

Accuracy is a measured knob, not a contract:
tests/test_quant_ssd.py pins the PTQ drift (and the dataset-mAP delta via
engine.evaluate); tools/exp_q8ssd.py measures throughput on the chip.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .common import conv2d
from .mobilenetv3 import C4_BLOCK, hardsigmoid, hardswish
from .quant import _fold_convbn, _quantize_weight, quantize_tensor
from .ssdlite import SSDLite, relu6

_ACTS = {"HS": hardswish, "RE": jax.nn.relu, "R6": relu6, None: None}


def _se_f32(x, p):
    """MobileNetV3 squeeze-excite on an f32 map (mobilenetv3._run_se)."""
    s = jnp.mean(x, axis=(1, 2), keepdims=True)
    s = jax.nn.relu(conv2d(s, p["fc1"]["w"], 1) + p["fc1"]["b"])
    s = conv2d(s, p["fc2"]["w"], 1) + p["fc2"]["b"]
    return x * hardsigmoid(s)


class _CalibCtx:
    """f32 walk over BN-folded weights; records absmax at every emit point.
    Tensors are plain f32 arrays."""

    def __init__(self, fused, se_params, amax):
        self.fused = fused
        self.se_params = se_params
        self.amax = amax

    def rec(self, name, v):
        a = jnp.max(jnp.abs(v))
        self.amax[name] = jnp.maximum(self.amax.get(name, jnp.zeros(())), a)
        return v

    def input(self, x):
        return self.rec("in", x)

    def conv(self, name, x, stride, act, groups=1, emit=True):
        w, b = self.fused[name]
        k = w.shape[0]
        p = k // 2
        y = conv2d(x, w, stride, padding=((p, p), (p, p)), groups=groups) + b
        if act is not None:
            y = _ACTS[act](y)
        return self.rec(name, y) if emit else y

    def se(self, name, y):
        return self.rec(name, _se_f32(y, self.se_params[name]))

    def add(self, name, y, res):
        return self.rec(name, y + res)


class _Q8Ctx:
    """int8 walk. Tensors are (int8 array, scale-table name) pairs except
    where emit=False returns the raw f32 epilogue."""

    def __init__(self, qparams, se_params, scales):
        self.qparams = qparams
        self.se_params = se_params
        self.scales = scales

    def _emit(self, name, y):
        return quantize_tensor(y, self.scales[name]), name

    def input(self, x):
        return self._emit("in", x)

    def conv(self, name, xq_n, stride, act, groups=1, emit=True):
        xq, _ = xq_n
        qp = self.qparams[name]
        k = qp["w"].shape[0]
        p = k // 2
        y = jax.lax.conv_general_dilated(
            xq, qp["w"], (stride, stride), ((p, p), (p, p)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups,
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * qp["dq"] + qp["b"]
        if act is not None:
            y = _ACTS[act](y)
        return self._emit(name, y) if emit else y

    def se(self, name, y):
        return self._emit(name, _se_f32(y, self.se_params[name]))

    def add(self, name, y, res):
        rq, rname = res
        return self._emit(
            name, y + rq.astype(jnp.float32) * self.scales[rname]
        )


def _ssd_walk(net: SSDLite, ctx, x):
    """THE SSDLite traversal (calibration and int8 serving share it).
    Returns (cls_logits (B, A, C), reg (B, A, 4)) as f32.

    Emit-node names: "in", "stem", "b{i}/{expand,dw,se,project,sum}",
    "last", "x{j}/{reduce,dw,expand}", "{cls,reg}{l}/dw"; head projections
    emit f32 (no requantization)."""
    bb = net.backbone
    x = ctx.input(x)
    x = ctx.conv("stem", x, 2, "HS")
    c4 = None
    for bi, (k, exp, out, use_se, act_n, stride) in enumerate(bb.config):
        inp = x
        if f"b{bi}/expand" in _names_of(ctx):
            x = ctx.conv(f"b{bi}/expand", x, 1, act_n)
        if bi == C4_BLOCK:
            c4 = x  # 672-ch expansion output, stride 16 (mobilenetv3 tap)
        x = ctx.conv(f"b{bi}/dw", x, stride, act_n, groups=exp,
                     emit=not use_se)
        if use_se:
            x = ctx.se(f"b{bi}/se", x)
        has_res = stride == 1 and _width(inp) == out
        x = ctx.conv(f"b{bi}/project", x, 1, None, emit=not has_res)
        if has_res:
            x = ctx.add(f"b{bi}/sum", x, inp)
    x = ctx.conv("last", x, 1, "HS")
    feats = [c4, x]
    for j in range(4):
        mid = net.extra_channels[j][1] // 2
        x = ctx.conv(f"x{j}/reduce", x, 1, "R6")
        x = ctx.conv(f"x{j}/dw", x, 2, "R6", groups=mid)
        x = ctx.conv(f"x{j}/expand", x, 1, "R6")
        feats.append(x)

    def head(prefix, cols):
        outs = []
        for li, f in enumerate(feats):
            ch = net.feature_channels[li]
            h = ctx.conv(f"{prefix}{li}/dw", f, 1, "R6", groups=ch)
            h = ctx.conv(f"{prefix}{li}/proj", h, 1, None, emit=False)
            b, hh, ww, _ = h.shape
            outs.append(h.reshape(b, hh * ww * 6, cols))
        return jnp.concatenate(outs, axis=1)

    return head("cls", net.num_classes), head("reg", 4)


def _width(t):
    """Channel width of a walk tensor (f32 array or (int8, name) pair)."""
    return (t[0] if isinstance(t, tuple) else t).shape[-1]


def _names_of(ctx):
    return ctx.fused if isinstance(ctx, _CalibCtx) else ctx.qparams


class Q8SSD:
    """Quantized SSDLite bundle (mirror of quant.Q8Yolo)."""

    def __init__(self, net: SSDLite, qparams, se_params, scales):
        self.net = net
        self.qparams = qparams
        self.se_params = se_params
        self.scales = scales

    @property
    def tree(self):
        return {"qparams": self.qparams, "se": self.se_params,
                "scales": self.scales}

    def apply(self, x):
        """x (B, S, S, 3) f32 -> (cls_logits, reg) f32, the SSDLite.apply
        eval-mode output contract (feeds ssd_postprocess unchanged)."""
        ctx = _Q8Ctx(self.qparams, self.se_params, self.scales)
        return _ssd_walk(self.net, ctx, x)


def _fold_ssd(net: SSDLite, params, stats):
    """Exact BN fold of every conv into the walk's name table. Returns
    (fused {name: (w, b)}, se_params {name: f32 fc pytree},
    proj {name: (w, b)} merged into fused)."""
    eps = net.backbone.bn_eps  # 1e-3 for both the backbone and the SSD parts
    fused, se_params = {}, {}

    def fold(name, p, s):
        fused[name] = _fold_convbn(p, s, eps=eps)

    bb_p, bb_s = params["backbone"], stats["backbone"]
    fold("stem", bb_p["stem"], bb_s["stem"])
    for bi, (bp, bs) in enumerate(zip(bb_p["blocks"], bb_s["blocks"])):
        if "expand" in bp:
            fold(f"b{bi}/expand", bp["expand"], bs["expand"])
        fold(f"b{bi}/dw", bp["dw"], bs["dw"])
        if "se" in bp:
            se_params[f"b{bi}/se"] = bp["se"]
        fold(f"b{bi}/project", bp["project"], bs["project"])
    fold("last", bb_p["last"], bb_s["last"])
    for j, (ep, es) in enumerate(zip(params["extra"], stats["extra"])):
        for part in ("reduce", "dw", "expand"):
            fold(f"x{j}/{part}", ep[part], es[part])
    for prefix, head_p, head_s in (
        ("cls", params["cls_head"], stats["cls_head"]),
        ("reg", params["reg_head"], stats["reg_head"]),
    ):
        for li, (hp, hs) in enumerate(zip(head_p, head_s)):
            fold(f"{prefix}{li}/dw", hp["dw"], hs["dw"])
            fused[f"{prefix}{li}/proj"] = (
                jnp.asarray(hp["proj"]["w"], jnp.float32),
                jnp.asarray(hp["proj"]["b"], jnp.float32),
            )
    return fused, se_params


def _input_nodes(net: SSDLite, fused):
    """Static (conv name -> its input's emit-node name) map, derived by
    replaying _ssd_walk's sequential order symbolically. Every conv in this
    family has exactly one input tensor. Asserts full coverage of `fused`."""
    nodes = {}
    prev = "in"
    width = None

    def step(name, cout):
        nonlocal prev, width
        nodes[name] = prev
        prev, width = name, cout

    step("stem", 16)
    for bi, (k, exp, out, use_se, act_n, stride) in enumerate(
        net.backbone.config
    ):
        block_in, block_w = prev, width
        if f"b{bi}/expand" in fused:
            step(f"b{bi}/expand", exp)
        if bi == C4_BLOCK:
            c4_node = prev
        nodes[f"b{bi}/dw"] = prev
        prev = f"b{bi}/se" if use_se else f"b{bi}/dw"  # dw emit or post-SE
        width = exp
        nodes[f"b{bi}/project"] = prev
        prev = f"b{bi}/sum" if (stride == 1 and block_w == out) \
            else f"b{bi}/project"
        width = out
    step("last", net.backbone.c5_channels)
    feat_nodes = [c4_node, "last"]
    for j in range(4):
        mid = net.extra_channels[j][1] // 2
        step(f"x{j}/reduce", mid)
        step(f"x{j}/dw", mid)
        step(f"x{j}/expand", net.extra_channels[j][1])
        feat_nodes.append(f"x{j}/expand")
    for prefix in ("cls", "reg"):
        for li, fn_node in enumerate(feat_nodes):
            nodes[f"{prefix}{li}/dw"] = fn_node
            nodes[f"{prefix}{li}/proj"] = f"{prefix}{li}/dw"
    missing = set(fused) - set(nodes)
    assert not missing, f"unbound convs: {sorted(missing)}"
    return nodes


def prepare_int8_ssd(net: SSDLite, params, stats, images_fn, iters: int = 4):
    """Build a Q8SSD from trained/imported weights (the prepare_int8
    protocol: images_fn(i) -> (B, S, S, 3) calibration batch)."""
    fused, se_params = _fold_ssd(net, params, stats)

    batches = jnp.stack([images_fn(i) for i in range(iters)])

    def calib(fused_, se_, batches_):
        amax = {}
        for i in range(batches_.shape[0]):
            ctx = _CalibCtx(fused_, se_, {})
            _ssd_walk(net, ctx, batches_[i])
            for k, v in ctx.amax.items():
                prev = amax.get(k)
                amax[k] = v if prev is None else jnp.maximum(prev, v)
        return {k: jnp.maximum(v, 1e-6) / 127.0 for k, v in amax.items()}

    scales = jax.jit(calib)(fused, se_params, batches)

    # bind each conv to its input node (static replay of the walk order),
    # then quantize: dq = s_in * s_w[cout] (single input tensor everywhere)
    in_node = _input_nodes(net, fused)

    def build(fused_, scales_):
        qparams = {}
        for name, (w, b) in fused_.items():
            wq, wscale = _quantize_weight(w)
            dq = (wscale * scales_[in_node[name]])[None, None, None, :]
            qparams[name] = {"w": wq, "dq": dq,
                             "b": jnp.asarray(b, jnp.float32)}
        return qparams

    qparams = jax.jit(build)(fused, scales)
    return Q8SSD(net, qparams, se_params, scales)


def q8_ssd_apply(net: SSDLite, tree, x):
    """Functional int8 serving entry (mirror of quant.q8_predict): same
    output contract as SSDLite.apply eval mode, over the quantized pytree
    (Q8SSD.tree). `net` is static structure; `tree`/`x` are traced, so
    jitted callers keep the quantized weights as runtime arguments."""
    return Q8SSD(net, tree["qparams"], tree["se"], tree["scales"]).apply(x)

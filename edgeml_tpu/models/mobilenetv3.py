"""MobileNetV3-Large backbone in pure JAX (NHWC, param pytrees).

Backbone of the reference's default weak detector
(ssdlite320_mobilenet_v3_large, /root/reference/torch_models/train.py:16 and
detect.py:23-27). Structure follows the torchvision implementation so
torchvision checkpoints import directly:

  stem conv 3x3 s2 (16, hardswish) -> 15 inverted-residual blocks (squeeze-
  excite on the 5x5 stages, relu/hardswish per the V3 paper) -> 1x1 conv to
  960. The SSDLite extractor taps the EXPANSION conv of block 13 (672
  channels, stride 16, "C4") and the final 960 map ("C5").

BatchNorm uses torchvision's detection settings (eps 1e-3, momentum 0.01)
when constructed for SSDLite.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .common import bn_apply, conv2d, conv_init

# (kernel, expanded, out, use_se, activation, stride) per inverted residual,
# input channels are implicit from the previous block.
def v3_large_config(reduced_tail: bool = False):
    """torchvision _mobilenet_v3_conf('mobilenet_v3_large'): reduced_tail
    halves the channels of the last three blocks (and hence the final conv,
    6x the last block width). The pretrained ssdlite320 checkpoint uses the
    reduced tail ('Enable reduced tail if no pretrained backbone is
    selected' — with DEFAULT detection weights the backbone weights are
    dropped, so reduce_tail is on)."""
    r = 2 if reduced_tail else 1
    return (
        (3, 16, 16, False, "RE", 1),
        (3, 64, 24, False, "RE", 2),
        (3, 72, 24, False, "RE", 1),
        (5, 72, 40, True, "RE", 2),
        (5, 120, 40, True, "RE", 1),
        (5, 120, 40, True, "RE", 1),
        (3, 240, 80, False, "HS", 2),
        (3, 200, 80, False, "HS", 1),
        (3, 184, 80, False, "HS", 1),
        (3, 184, 80, False, "HS", 1),
        (3, 480, 112, True, "HS", 1),
        (3, 672, 112, True, "HS", 1),
        (5, 672, 160 // r, True, "HS", 2),  # C4 tap: expansion conv here
        (5, 960 // r, 160 // r, True, "HS", 1),
        (5, 960 // r, 160 // r, True, "HS", 1),
    )


V3_LARGE = v3_large_config(False)
C4_BLOCK = 12  # zero-based block index of the C4 tap


def hardswish(x):
    return x * jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


def hardsigmoid(x):
    return jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


def _act(name):
    return hardswish if name == "HS" else jax.nn.relu


@dataclasses.dataclass(frozen=True)
class MobileNetV3Large:
    bn_eps: float = 1e-3
    bn_momentum: float = 0.01
    reduced_tail: bool = False

    @property
    def config(self):
        return v3_large_config(self.reduced_tail)

    @property
    def c5_channels(self) -> int:
        return 6 * self.config[-1][2]  # 960 full tail / 480 reduced

    # ---- init ---------------------------------------------------------------

    def _convbn(self, key, k, cin, cout, groups=1):
        return (
            {
                "w": conv_init(key, k, cin, cout, groups),
                "g": jnp.ones((cout,)),
                "b": jnp.zeros((cout,)),
            },
            {"m": jnp.zeros((cout,)), "v": jnp.ones((cout,))},
        )

    def _se(self, key, c, squeeze):
        k1, k2 = jax.random.split(key)
        return {
            "fc1": {"w": conv_init(k1, 1, c, squeeze), "b": jnp.zeros((squeeze,))},
            "fc2": {"w": conv_init(k2, 1, squeeze, c), "b": jnp.zeros((c,))},
        }

    def init(self, key):
        params, stats = {}, {}
        key, sub = jax.random.split(key)
        params["stem"], stats["stem"] = self._convbn(sub, 3, 3, 16)
        cin = 16
        blocks_p, blocks_s = [], []
        for k, exp, out, use_se, act, stride in self.config:
            bp, bs = {}, {}
            if exp != cin:
                key, sub = jax.random.split(key)
                bp["expand"], bs["expand"] = self._convbn(sub, 1, cin, exp)
            key, sub = jax.random.split(key)
            bp["dw"], bs["dw"] = self._convbn(sub, k, exp, exp, groups=exp)
            if use_se:
                key, sub = jax.random.split(key)
                # torchvision SqueezeExcitation: squeeze = _make_divisible(exp // 4, 8)
                sq = _make_divisible(exp // 4, 8)
                bp["se"] = self._se(sub, exp, sq)
            key, sub = jax.random.split(key)
            bp["project"], bs["project"] = self._convbn(sub, 1, exp, out)
            blocks_p.append(bp)
            blocks_s.append(bs)
            cin = out
        params["blocks"], stats["blocks"] = blocks_p, blocks_s
        key, sub = jax.random.split(key)
        params["last"], stats["last"] = self._convbn(sub, 1, cin, self.c5_channels)
        return params, stats

    # ---- apply --------------------------------------------------------------

    def _run_convbn(self, x, p, s, stride, act, train, groups=1, pad=None):
        k = p["w"].shape[0]
        pad = k // 2 if pad is None else pad
        x = conv2d(x, p["w"], stride, padding=((pad, pad), (pad, pad)), groups=groups)
        x, new_s = bn_apply(
            x,
            {"scale": p["g"], "bias": p["b"], "mean": s["m"], "var": s["v"]},
            eps=self.bn_eps,
            momentum=self.bn_momentum,
            train=train,
        )
        return (act(x) if act else x), {"m": new_s["mean"], "v": new_s["var"]}

    def _run_se(self, x, p):
        # mean pool -> fc1 -> relu -> fc2 -> hardsigmoid scale
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = conv2d(s, p["fc1"]["w"], 1) + p["fc1"]["b"]
        s = jax.nn.relu(s)
        s = conv2d(s, p["fc2"]["w"], 1) + p["fc2"]["b"]
        return x * hardsigmoid(s)

    def apply(self, params, stats, x, *, train: bool = False):
        """Returns ((c4, c5), new_stats): the SSDLite feature pair."""
        new_stats = {"blocks": []}
        x, new_stats["stem"] = self._run_convbn(
            x, params["stem"], stats["stem"], 2, hardswish, train
        )
        c4 = None
        for bi, ((k, exp, out, use_se, act_n, stride), bp, bs) in enumerate(
            zip(self.config, params["blocks"], stats["blocks"])
        ):
            act = _act(act_n)
            ns = {}
            inp = x
            if "expand" in bp:
                x, ns["expand"] = self._run_convbn(
                    x, bp["expand"], bs["expand"], 1, act, train
                )
            if bi == C4_BLOCK:
                c4 = x  # 672-channel expansion output, stride 16
            x, ns["dw"] = self._run_convbn(
                x, bp["dw"], bs["dw"], stride, act, train, groups=x.shape[-1]
            )
            if use_se:
                x = self._run_se(x, bp["se"])
            x, ns["project"] = self._run_convbn(
                x, bp["project"], bs["project"], 1, None, train
            )
            if stride == 1 and inp.shape[-1] == x.shape[-1]:
                x = x + inp
            new_stats["blocks"].append(ns)
        x, new_stats["last"] = self._run_convbn(
            x, params["last"], stats["last"], 1, hardswish, train
        )
        return (c4, x), new_stats


def _make_divisible(v, divisor=8):
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def import_mobilenet(imp, params, stats):
    """Consume a torchvision MobileNetV3-Large features.* prefix in module
    order (stem CNA, inverted residuals with optional expand/SE, last CNA)."""
    from .import_torch import import_convbn

    p, s = dict(params), dict(stats)
    p["stem"], s["stem"] = import_convbn(imp, "stem", p["stem"], s["stem"])
    bp_new, bs_new = [], []
    for bi, (bp, bs) in enumerate(zip(p["blocks"], s["blocks"])):
        bp, bs = dict(bp), dict(bs)
        if "expand" in bp:
            bp["expand"], bs["expand"] = import_convbn(
                imp, f"block{bi}.expand", bp["expand"], bs["expand"]
            )
        bp["dw"], bs["dw"] = import_convbn(imp, f"block{bi}.dw", bp["dw"], bs["dw"])
        if "se" in bp:
            se = {"fc1": dict(bp["se"]["fc1"]), "fc2": dict(bp["se"]["fc2"])}
            for fc in ("fc1", "fc2"):
                se[fc]["w"] = imp.conv(f"block{bi}.se.{fc}", se[fc]["w"])
                se[fc]["b"] = imp.vec(f"block{bi}.se.{fc}.bias", se[fc]["b"])
            bp["se"] = se
        bp["project"], bs["project"] = import_convbn(
            imp, f"block{bi}.project", bp["project"], bs["project"]
        )
        bp_new.append(bp)
        bs_new.append(bs)
    p["blocks"], s["blocks"] = bp_new, bs_new
    p["last"], s["last"] = import_convbn(imp, "last", p["last"], s["last"])
    return p, s

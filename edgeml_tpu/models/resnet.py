"""ResNet-50 backbone + Feature Pyramid Network in pure JAX.

Shared trunk of the reference's strong detectors
(fasterrcnn_resnet50_fpn_v2 / retinanet_resnet50_fpn_v2,
/root/reference/torch_models/train.py:17-18). Follows the torchvision
structure: 7x7 stem, bottleneck stages (3, 4, 6, 3), frozen BatchNorm
(detection models never update BN stats — running statistics are applied in
both train and eval, matching FrozenBatchNorm2d), and an FPN over C3/C4/C5
with 256-channel lateral/output convs plus configurable extra levels
(LastLevelMaxPool for Faster R-CNN, P6/P7 convs for RetinaNet).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .common import conv2d, conv_init, upsample2x

STAGE_BLOCKS = (3, 4, 6, 3)
STAGE_CHANNELS = (256, 512, 1024, 2048)


def _frozen_bn(x, p):
    """FrozenBatchNorm2d: affine transform with fixed statistics.

    The per-channel coefficients are computed in the statistics' dtype —
    f32 under AMP training, where amp_cast keeps the m/v leaves f32 — and
    only the resulting 1-D vectors are cast to x.dtype, so a bfloat16
    activation stream stays bfloat16 through the backbone (upcasting the
    activation itself breaks the conv+bn+relu bf16 fusion; measured -18%
    on the analogous serving path, models/common.py bn_apply)."""
    scale = p["g"] * jax.lax.rsqrt(p["v"] + 1e-5)
    bias = p["b"] - p["m"] * scale
    return x * scale.astype(x.dtype) + bias.astype(x.dtype)


@dataclasses.dataclass(frozen=True)
class ResNet50FPN:
    out_channels: int = 256
    extra: str = "maxpool"  # "maxpool" (Faster R-CNN) or "p6p7" (RetinaNet)
    # First stage fed to the FPN: 0 = C2 (torchvision returned_layers
    # [1,2,3,4], the Faster R-CNN default), 1 = C3 (returned_layers [2,3,4],
    # the RetinaNet default).
    first_stage: int = 1

    # ---- init ----------------------------------------------------------------

    def _convbn(self, key, k, cin, cout):
        return {
            "w": conv_init(key, k, cin, cout),
            "g": jnp.ones((cout,)),
            "b": jnp.zeros((cout,)),
            "m": jnp.zeros((cout,)),
            "v": jnp.ones((cout,)),
        }

    def _bottleneck(self, key, cin, cmid, cout, downsample):
        keys = jax.random.split(key, 4)
        p = {
            "conv1": self._convbn(keys[0], 1, cin, cmid),
            "conv2": self._convbn(keys[1], 3, cmid, cmid),
            "conv3": self._convbn(keys[2], 1, cmid, cout),
        }
        if downsample:
            p["down"] = self._convbn(keys[3], 1, cin, cout)
        return p

    def init(self, key):
        p = {}
        key, sub = jax.random.split(key)
        p["stem"] = self._convbn(sub, 7, 3, 64)
        cin = 64
        stages = []
        for si, (n, cout) in enumerate(zip(STAGE_BLOCKS, STAGE_CHANNELS)):
            cmid = cout // 4
            blocks = []
            for bi in range(n):
                key, sub = jax.random.split(key)
                blocks.append(
                    self._bottleneck(sub, cin if bi == 0 else cout, cmid, cout, bi == 0)
                )
            stages.append(blocks)
            cin = cout
        p["stages"] = stages
        # FPN lateral (1x1) + output (3x3) convs over the returned stages.
        lat, out = [], []
        for c in STAGE_CHANNELS[self.first_stage:]:
            key, k1, k2 = jax.random.split(key, 3)
            lat.append(
                {"w": conv_init(k1, 1, c, self.out_channels),
                 "b": jnp.zeros((self.out_channels,))}
            )
            out.append(
                {"w": conv_init(k2, 3, self.out_channels, self.out_channels),
                 "b": jnp.zeros((self.out_channels,))}
            )
        p["fpn_lateral"], p["fpn_output"] = lat, out
        if self.extra == "p6p7":
            # RetinaNet v2 keeps the paper's LastLevelP6P7(2048, 256): P6 is a
            # stride-2 conv on C5 itself (in_channels != out_channels disables
            # torchvision's use_P5 path), P7 on relu(P6).
            key, k1, k2 = jax.random.split(key, 3)
            p["p6"] = {
                "w": conv_init(k1, 3, STAGE_CHANNELS[-1], self.out_channels),
                "b": jnp.zeros((self.out_channels,)),
            }
            p["p7"] = {
                "w": conv_init(k2, 3, self.out_channels, self.out_channels),
                "b": jnp.zeros((self.out_channels,)),
            }
        return p

    # ---- apply ----------------------------------------------------------------

    def _run_block(self, x, p, stride):
        idt = x
        y = jax.nn.relu(_frozen_bn(conv2d(x, p["conv1"]["w"], 1), p["conv1"]))
        y = jax.nn.relu(
            _frozen_bn(
                conv2d(y, p["conv2"]["w"], stride, padding=((1, 1), (1, 1))),
                p["conv2"],
            )
        )
        y = _frozen_bn(conv2d(y, p["conv3"]["w"], 1), p["conv3"])
        if "down" in p:
            idt = _frozen_bn(conv2d(x, p["down"]["w"], stride), p["down"])
        return jax.nn.relu(y + idt)

    def apply(self, params, x):
        """x: (B, S, S, 3) normalized images. Returns the FPN level list
        (bottom level P{first_stage+2} .. P5, plus the extra level(s)) of
        (B, h, w, 256) maps."""
        y = conv2d(x, params["stem"]["w"], 2, padding=((3, 3), (3, 3)))
        y = jax.nn.relu(_frozen_bn(y, params["stem"]))
        y = jax.lax.reduce_window(
            y, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            ((0, 0), (1, 1), (1, 1), (0, 0)),
        )
        cs = []
        for si, blocks in enumerate(params["stages"]):
            stride = 1 if si == 0 else 2
            for bi, bp in enumerate(blocks):
                y = self._run_block(y, bp, stride if bi == 0 else 1)
            cs.append(y)
        cs = cs[self.first_stage:]

        lat = params["fpn_lateral"]
        out = params["fpn_output"]
        # Top-down pathway: lateral 1x1, nearest x2 upsample merge.
        ps = [None] * len(cs)
        for li in reversed(range(len(cs))):
            p = conv2d(cs[li], lat[li]["w"], 1) + lat[li]["b"]
            if li + 1 < len(cs):
                p = p + upsample2x(ps[li + 1])
            ps[li] = p
        feats = [
            conv2d(p, o["w"], 1, padding=((1, 1), (1, 1))) + o["b"]
            for p, o in zip(ps, out)
        ]
        if self.extra == "maxpool":
            feats.append(
                jax.lax.reduce_window(
                    feats[-1], -jnp.inf, jax.lax.max, (1, 1, 1, 1), (1, 2, 2, 1),
                    "VALID",
                )
            )
        else:  # p6p7 from C5 (LastLevelP6P7(2048, 256), v2 convention)
            p6 = conv2d(cs[-1], params["p6"]["w"], 2, padding=((1, 1), (1, 1)))
            p6 = p6 + params["p6"]["b"]
            p7 = conv2d(jax.nn.relu(p6), params["p7"]["w"], 2, padding=((1, 1), (1, 1)))
            p7 = p7 + params["p7"]["b"]
            feats.extend([p6, p7])
        return feats


def import_resnet_fpn(imp, params, extra: str, fpn_norm: bool = False):
    """Consume a torchvision BackboneWithFPN prefix in module order: resnet
    body (stem, bottleneck stages with trailing downsample), FPN inner then
    layer blocks, then P6/P7 when present.

    fpn_norm=True consumes the v2 Faster R-CNN FPN layout (Conv2dNormActivation
    with BatchNorm2d: conv without bias + 4 BN tensors,
    torchvision fasterrcnn_resnet50_fpn_v2's `_resnet_fpn_extractor(...,
    norm_layer=nn.BatchNorm2d)`) and FOLDS the BN statistics into this model's
    bias-carrying FPN convs — exact at inference. False matches the plain
    conv+bias layout (RetinaNet v2's FPN has no norm)."""
    import jax

    from .import_torch import import_frozen_convbn

    p = dict(params)
    p["stem"] = import_frozen_convbn(imp, "stem", p["stem"])
    stages = []
    for si, blocks in enumerate(p["stages"]):
        new_blocks = []
        for bi, bp in enumerate(blocks):
            bp = dict(bp)
            for cv in ("conv1", "conv2", "conv3"):
                bp[cv] = import_frozen_convbn(imp, f"layer{si+1}.{bi}.{cv}", bp[cv])
            if "down" in bp:
                bp["down"] = import_frozen_convbn(imp, f"layer{si+1}.{bi}.down", bp["down"])
            new_blocks.append(bp)
        stages.append(new_blocks)
    p["stages"] = stages
    for group in ("fpn_lateral", "fpn_output"):
        new = []
        for li, cp in enumerate(p[group]):
            cp = dict(cp)
            w = imp.conv(f"{group}.{li}", cp["w"])
            if fpn_norm:
                g, b, m, v = imp.bn(
                    f"{group}.{li}.bn", cp["b"], cp["b"], cp["b"], cp["b"]
                )
                scale = g * jax.lax.rsqrt(v + 1e-5)
                cp["w"] = w * scale[None, None, None, :]
                cp["b"] = b - m * scale
            else:
                cp["w"] = w
                cp["b"] = imp.vec(f"{group}.{li}.bias", cp["b"])
            new.append(cp)
        p[group] = new
    if extra == "p6p7":
        for name in ("p6", "p7"):
            cp = dict(p[name])
            cp["w"] = imp.conv(name, cp["w"])
            cp["b"] = imp.vec(name + ".bias", cp["b"])
            p[name] = cp
    return p

"""SSDLite320-MobileNetV3-Large in pure JAX.

The reference's default weak/strong detector option
(/root/reference/torch_models/train.py:16, detect.py:23-27). Architecture per
the torchvision implementation:

  * feature extractor: MobileNetV3-Large tapped at the block-13 expansion
    conv (672 ch, stride 16) and the final 960-channel map, plus four SSDLite
    extra blocks (1x1 reduce -> depthwise 3x3 s2 -> 1x1 expand, ReLU6,
    channels 512/256/256/128) -> 6 feature maps for a 320 input:
    20/10/5/3/2/1;
  * anchors: DefaultBoxGenerator with aspect ratios {2, 3}, scales linearly
    spaced 0.2..0.95 (+sqrt(s_k s_{k+1}) box) -> 6 boxes per location;
  * heads: depthwise-separable prediction blocks (classification to
    num_classes incl. background, regression to 4), box coder weights
    (10, 10, 5, 5);
  * loss: SSD multibox — IoU-0.5 matcher with best-anchor-per-GT forcing,
    smooth-L1 box regression, cross-entropy with 3:1 hard-negative mining;
  * postprocess: softmax scores, background dropped, score threshold, NMS
    0.55, 300 detections.

All fixed-shape and jittable; matching runs vmapped over the batch.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .common import bn_apply, conv2d, conv_init
from .mobilenetv3 import MobileNetV3Large

BOX_CODER_WEIGHTS = (10.0, 10.0, 5.0, 5.0)


def relu6(x):
    return jnp.clip(x, 0.0, 6.0)


def default_boxes(image_size: int = 320, feature_sizes=(20, 10, 5, 3, 2, 1)):
    """Anchor (default-box) grid, xyxy pixels — DefaultBoxGenerator semantics
    (aspect ratios [2, 3], scales 0.2..0.95 linear + geometric-mean box,
    wh clipped to [0, 1])."""
    k = len(feature_sizes)
    scales = [0.2 + (0.95 - 0.2) * i / (k - 1) for i in range(k)] + [1.0]
    out = []
    for fi, f in enumerate(feature_sizes):
        s = scales[fi]
        s_prime = math.sqrt(s * scales[fi + 1])
        wh = [[s, s], [s_prime, s_prime]]
        for r in (2, 3):
            sr = math.sqrt(r)
            wh.append([s * sr, s / sr])
            wh.append([s / sr, s * sr])
        wh = np.clip(np.array(wh, np.float32), 0.0, 1.0)  # (6, 2)
        ys, xs = np.meshgrid(np.arange(f), np.arange(f), indexing="ij")
        cx = (xs.reshape(-1, 1) + 0.5) / f
        cy = (ys.reshape(-1, 1) + 0.5) / f
        c = np.concatenate(
            [np.repeat(cx, 6, 1).reshape(-1, 1), np.repeat(cy, 6, 1).reshape(-1, 1)],
            axis=1,
        )  # (f*f*6, 2) — anchor-major within each cell
        whs = np.tile(wh, (f * f, 1))
        boxes = np.concatenate([c - whs / 2, c + whs / 2], axis=1) * image_size
        out.append(boxes.astype(np.float32))
    return np.concatenate(out)  # (A, 4) xyxy pixels


@dataclasses.dataclass(frozen=True)
class SSDLite:
    num_classes: int = 91  # includes background class 0
    image_size: int = 320
    # torchvision enables the reduced mobilenet tail when no pretrained
    # backbone is selected — i.e. the released COCO checkpoint is
    # reduced-tail (C5 = 480 ch), while a model trained from an ImageNet
    # backbone (the reference trainer's configuration) is full-tail (960).
    reduced_tail: bool = False

    @property
    def backbone(self):
        return MobileNetV3Large(reduced_tail=self.reduced_tail)

    @property
    def extra_channels(self):
        c5 = self.backbone.c5_channels
        return ((c5, 512), (512, 256), (256, 256), (256, 128))

    @property
    def feature_channels(self):
        return (672, self.backbone.c5_channels, 512, 256, 256, 128)

    @property
    def feature_sizes(self):
        """Per-level grid sizes for THIS image size (320 -> 20/10/5/3/2/1):
        C4 at stride 16, C5 at stride 32, then each extra block's stride-2
        conv (k=3, pad=1) halves with ceil. default_boxes must be built with
        these, not the 320 defaults, for non-320 inputs."""
        f = [-(-self.image_size // 16), -(-self.image_size // 32)]
        for _ in range(4):
            f.append(-(-f[-1] // 2))
        return tuple(f)

    # ---- init ----------------------------------------------------------------

    def _convbn(self, key, k, cin, cout, groups=1):
        return (
            {
                "w": conv_init(key, k, cin, cout, groups),
                "g": jnp.ones((cout,)),
                "b": jnp.zeros((cout,)),
            },
            {"m": jnp.zeros((cout,)), "v": jnp.ones((cout,))},
        )

    def init(self, key):
        params, stats = {}, {}
        key, sub = jax.random.split(key)
        params["backbone"], stats["backbone"] = self.backbone.init(sub)
        extras_p, extras_s = [], []
        for cin, cout in self.extra_channels:
            mid = cout // 2
            ep, es = {}, {}
            key, k1, k2, k3 = jax.random.split(key, 4)
            ep["reduce"], es["reduce"] = self._convbn(k1, 1, cin, mid)
            ep["dw"], es["dw"] = self._convbn(k2, 3, mid, mid, groups=mid)
            ep["expand"], es["expand"] = self._convbn(k3, 1, mid, cout)
            extras_p.append(ep)
            extras_s.append(es)
        params["extra"], stats["extra"] = extras_p, extras_s

        def head(key, cols):
            hp, hs = [], []
            for ch in self.feature_channels:
                key, k1, k2 = jax.random.split(key, 3)
                dw_p, dw_s = self._convbn(k1, 3, ch, ch, groups=ch)
                proj = {
                    "w": conv_init(k2, 1, ch, 6 * cols),
                    "b": jnp.zeros((6 * cols,)),
                }
                hp.append({"dw": dw_p, "proj": proj})
                hs.append({"dw": dw_s})
            return hp, hs

        key, kc = jax.random.split(key)
        params["cls_head"], stats["cls_head"] = head(kc, self.num_classes)
        key, kr = jax.random.split(key)
        params["reg_head"], stats["reg_head"] = head(kr, 4)
        return params, stats

    # ---- apply ----------------------------------------------------------------

    def _run_convbn(self, x, p, s, stride, act, train, groups=1):
        k = p["w"].shape[0]
        pad = k // 2
        x = conv2d(x, p["w"], stride, padding=((pad, pad), (pad, pad)), groups=groups)
        x, new_s = bn_apply(
            x,
            {"scale": p["g"], "bias": p["b"], "mean": s["m"], "var": s["v"]},
            eps=1e-3,
            momentum=0.01,
            train=train,
        )
        return (act(x) if act else x), {"m": new_s["mean"], "v": new_s["var"]}

    def apply(self, params, stats, x, *, train: bool = False):
        """x: (B, 320, 320, 3). Returns ((cls_logits (B, A, C),
        reg (B, A, 4)), new_stats)."""
        new_stats = {}
        (c4, c5), new_stats["backbone"] = self.backbone.apply(
            params["backbone"], stats["backbone"], x, train=train
        )
        feats = [c4, c5]
        y = c5
        new_stats["extra"] = []
        for ep, es in zip(params["extra"], stats["extra"]):
            ns = {}
            y, ns["reduce"] = self._run_convbn(y, ep["reduce"], es["reduce"], 1, relu6, train)
            y, ns["dw"] = self._run_convbn(
                y, ep["dw"], es["dw"], 2, relu6, train, groups=y.shape[-1]
            )
            y, ns["expand"] = self._run_convbn(y, ep["expand"], es["expand"], 1, relu6, train)
            feats.append(y)
            new_stats["extra"].append(ns)

        def run_head(head_p, head_s, cols, key_name):
            outs, ns_list = [], []
            for f, hp, hs in zip(feats, head_p, head_s):
                h, ns = self._run_convbn(
                    f, hp["dw"], hs["dw"], 1, relu6, train, groups=f.shape[-1]
                )
                h = conv2d(h, hp["proj"]["w"], 1) + hp["proj"]["b"]
                b, hh, ww, _ = h.shape
                outs.append(h.reshape(b, hh * ww * 6, cols))
                ns_list.append({"dw": ns})
            new_stats[key_name] = ns_list
            return jnp.concatenate(outs, axis=1)

        cls = run_head(params["cls_head"], stats["cls_head"], self.num_classes, "cls_head")
        reg = run_head(params["reg_head"], stats["reg_head"], 4, "reg_head")
        return (cls, reg), new_stats

    # ---- box coding -----------------------------------------------------------

    @staticmethod
    def decode_boxes(reg, anchors):
        """Apply (10, 10, 5, 5)-weighted deltas to xyxy anchors -> xyxy."""
        wx, wy, ww, wh = BOX_CODER_WEIGHTS
        acx = (anchors[:, 0] + anchors[:, 2]) * 0.5
        acy = (anchors[:, 1] + anchors[:, 3]) * 0.5
        aw = anchors[:, 2] - anchors[:, 0]
        ah = anchors[:, 3] - anchors[:, 1]
        cx = reg[..., 0] / wx * aw + acx
        cy = reg[..., 1] / wy * ah + acy
        w = jnp.exp(jnp.clip(reg[..., 2] / ww, None, math.log(1000.0 / 16))) * aw
        h = jnp.exp(jnp.clip(reg[..., 3] / wh, None, math.log(1000.0 / 16))) * ah
        return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)

    @staticmethod
    def encode_boxes(gt, anchors):
        """Inverse of decode for training targets (gt xyxy)."""
        wx, wy, ww, wh = BOX_CODER_WEIGHTS
        acx = (anchors[:, 0] + anchors[:, 2]) * 0.5
        acy = (anchors[:, 1] + anchors[:, 3]) * 0.5
        aw = anchors[:, 2] - anchors[:, 0]
        ah = anchors[:, 3] - anchors[:, 1]
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


def _import_head(imp, head_p, head_s, name):
    from .import_torch import import_convbn

    new_p, new_s = [], []
    for li, (hp, hs) in enumerate(zip(head_p, head_s)):
        hp, hs = dict(hp), dict(hs)
        hp["dw"], hs["dw"] = import_convbn(imp, f"{name}.{li}.dw", hp["dw"], hs["dw"])
        proj = dict(hp["proj"])
        proj["w"] = imp.conv(f"{name}.{li}.proj", proj["w"])
        proj["b"] = imp.vec(f"{name}.{li}.proj.bias", proj["b"])
        hp["proj"] = proj
        new_p.append(hp)
        new_s.append(hs)
    return new_p, new_s


def ssdlite_params_from_torch_state_dict(net: SSDLite, sd):
    """Order-based torchvision ssdlite320_mobilenet_v3_large import
    (see models/import_torch.py for mechanics and caveats). Returns
    (params, stats)."""
    import jax

    from .import_torch import OrderedImporter, import_convbn
    from .mobilenetv3 import import_mobilenet

    params, stats = net.init(jax.random.PRNGKey(0))
    imp = OrderedImporter(sd)
    params["backbone"], stats["backbone"] = import_mobilenet(
        imp, params["backbone"], stats["backbone"]
    )
    ep_new, es_new = [], []
    for ei, (ep, es) in enumerate(zip(params["extra"], stats["extra"])):
        ep, es = dict(ep), dict(es)
        for part in ("reduce", "dw", "expand"):
            ep[part], es[part] = import_convbn(imp, f"extra{ei}.{part}", ep[part], es[part])
        ep_new.append(ep)
        es_new.append(es)
    params["extra"], stats["extra"] = ep_new, es_new
    params["cls_head"], stats["cls_head"] = _import_head(
        imp, params["cls_head"], stats["cls_head"], "cls_head"
    )
    params["reg_head"], stats["reg_head"] = _import_head(
        imp, params["reg_head"], stats["reg_head"], "reg_head"
    )
    imp.done()
    return params, stats


SSDLite.params_from_torch_state_dict = lambda self, sd: \
    ssdlite_params_from_torch_state_dict(self, sd)

"""Emit (key, shape) manifests of the four real torch detector checkpoints.

Companion to tools/dump_torch_manifest.py: that script dumps manifests from a
LIVE torchvision/ultralytics install (neither exists in this image), while
this one reconstructs the same manifests programmatically from the upstream
module definitions — state_dict order is module-registration order, so the
layouts are fully determined by the architecture code:

  * fasterrcnn_resnet50_fpn_v2 / retinanet_resnet50_fpn_v2 / ssdlite320_
    mobilenet_v3_large as defined in torchvision>=0.13 (the v2 detection
    models and the Conv2dNormActivation-based FPN/SSD blocks), constructed
    with weights="DEFAULT" — the configuration the reference's detection
    dumper loads (/root/reference/torch_models/detect.py:21-38). Notably:
    plain BatchNorm2d bodies (num_batches_tracked present), the v2 Faster
    R-CNN FPN/box-head BN, GroupNorm RetinaNet towers, and SSDLite's
    REDUCED mobilenet tail (enabled whenever weights_backbone is dropped,
    which weights="DEFAULT" does).
  * ultralytics yolov5n (v6.0+ architecture: 6x6 stem, C3 blocks, SPPF),
    depth 0.33 / width 0.25, as served by torch.hub with autoshape=False.

Where a manifest generated here and one dumped by dump_torch_manifest.py on a
live install disagree, the live dump wins — replace the fixture and fix the
importer.

Usage:
    python tools/expected_manifests.py [OUT_DIR]   # default tests/fixtures/manifests
"""

import json
import os
import sys

# --------------------------------------------------------------------------
# building blocks
# --------------------------------------------------------------------------


def _bn(out, prefix, c, tracked=True):
    out.append((f"{prefix}.weight", [c]))
    out.append((f"{prefix}.bias", [c]))
    out.append((f"{prefix}.running_mean", [c]))
    out.append((f"{prefix}.running_var", [c]))
    if tracked:
        out.append((f"{prefix}.num_batches_tracked", []))


def resnet50_body(prefix):
    """torchvision.models.resnet50 through layer4 (IntermediateLayerGetter
    drops avgpool/fc but preserves key order). Plain BatchNorm2d — the v2
    detection models do not freeze the backbone norm."""
    out = []
    out.append((f"{prefix}.conv1.weight", [64, 3, 7, 7]))
    _bn(out, f"{prefix}.bn1", 64)
    inplanes = 64
    for li, nblocks in enumerate((3, 4, 6, 3)):
        width = 64 * 2 ** li
        planes_out = width * 4
        for bi in range(nblocks):
            p = f"{prefix}.layer{li + 1}.{bi}"
            cin = inplanes if bi == 0 else planes_out
            out.append((f"{p}.conv1.weight", [width, cin, 1, 1]))
            _bn(out, f"{p}.bn1", width)
            out.append((f"{p}.conv2.weight", [width, width, 3, 3]))
            _bn(out, f"{p}.bn2", width)
            out.append((f"{p}.conv3.weight", [planes_out, width, 1, 1]))
            _bn(out, f"{p}.bn3", planes_out)
            if bi == 0:  # Bottleneck registers downsample AFTER conv3/bn3
                out.append((f"{p}.downsample.0.weight", [planes_out, cin, 1, 1]))
                _bn(out, f"{p}.downsample.1", planes_out)
        inplanes = planes_out
    return out


def fpn(prefix, in_channels_list, norm: bool, extra):
    """FeaturePyramidNetwork: inner_blocks then layer_blocks, each a
    Conv2dNormActivation (conv+bias when norm_layer is None, conv+BN when
    BatchNorm2d), then the extra block ('p6p7' convs or parameterless
    maxpool)."""
    out = []
    for i, cin in enumerate(in_channels_list):
        p = f"{prefix}.inner_blocks.{i}"
        out.append((f"{p}.0.weight", [256, cin, 1, 1]))
        if norm:
            _bn(out, f"{p}.1", 256)
        else:
            out.append((f"{p}.0.bias", [256]))
    for i in range(len(in_channels_list)):
        p = f"{prefix}.layer_blocks.{i}"
        out.append((f"{p}.0.weight", [256, 256, 3, 3]))
        if norm:
            _bn(out, f"{p}.1", 256)
        else:
            out.append((f"{p}.0.bias", [256]))
    if extra == "p6p7":
        # LastLevelP6P7(2048, 256): P6 convolves C5 directly (in != out
        # disables use_P5), P7 convolves relu(P6).
        out.append((f"{prefix}.extra_blocks.p6.weight", [256, 2048, 3, 3]))
        out.append((f"{prefix}.extra_blocks.p6.bias", [256]))
        out.append((f"{prefix}.extra_blocks.p7.weight", [256, 256, 3, 3]))
        out.append((f"{prefix}.extra_blocks.p7.bias", [256]))
    return out


# --------------------------------------------------------------------------
# torchvision detector manifests
# --------------------------------------------------------------------------


def faster_rcnn():
    """fasterrcnn_resnet50_fpn_v2(weights='DEFAULT'): GeneralizedRCNN order
    transform (no params) -> backbone (body, fpn w/ BN, returned_layers
    [1,2,3,4]) -> rpn.head (conv_depth=2, bias convs, 3 anchors/cell) ->
    roi_heads (4xconv+BN box head, 1024 fc, 91-class predictor)."""
    out = resnet50_body("backbone.body")
    out += fpn("backbone.fpn", [256, 512, 1024, 2048], norm=True, extra=None)
    for i in range(2):
        out.append((f"rpn.head.conv.{i}.0.weight", [256, 256, 3, 3]))
        out.append((f"rpn.head.conv.{i}.0.bias", [256]))
    out.append(("rpn.head.cls_logits.weight", [3, 256, 1, 1]))
    out.append(("rpn.head.cls_logits.bias", [3]))
    out.append(("rpn.head.bbox_pred.weight", [12, 256, 1, 1]))
    out.append(("rpn.head.bbox_pred.bias", [12]))
    for i in range(4):
        out.append((f"roi_heads.box_head.{i}.0.weight", [256, 256, 3, 3]))
        _bn(out, f"roi_heads.box_head.{i}.1", 256)
    out.append(("roi_heads.box_head.5.weight", [1024, 256 * 7 * 7]))
    out.append(("roi_heads.box_head.5.bias", [1024]))
    out.append(("roi_heads.box_predictor.cls_score.weight", [91, 1024]))
    out.append(("roi_heads.box_predictor.cls_score.bias", [91]))
    out.append(("roi_heads.box_predictor.bbox_pred.weight", [364, 1024]))
    out.append(("roi_heads.box_predictor.bbox_pred.bias", [364]))
    return out


def retinanet():
    """retinanet_resnet50_fpn_v2(weights='DEFAULT'): backbone (body, plain
    FPN over [2,3,4] + LastLevelP6P7(256,256)) -> head (GroupNorm(32) towers,
    9 anchors/cell, 91 classes)."""
    out = resnet50_body("backbone.body")
    out += fpn("backbone.fpn", [512, 1024, 2048], norm=False, extra="p6p7")
    for head, final, cols in (
        ("classification_head", "cls_logits", 9 * 91),
        ("regression_head", "bbox_reg", 9 * 4),
    ):
        for i in range(4):
            p = f"head.{head}.conv.{i}"
            out.append((f"{p}.0.weight", [256, 256, 3, 3]))
            out.append((f"{p}.1.weight", [256]))  # GroupNorm(32, 256)
            out.append((f"{p}.1.bias", [256]))
        out.append((f"head.{head}.{final}.weight", [cols, 256, 3, 3]))
        out.append((f"head.{head}.{final}.bias", [cols]))
    return out


# mobilenet_v3_large inverted-residual config with the REDUCED tail
# (torchvision _mobilenet_v3_conf, reduce_divider=2): per block
# (cin, kernel, expanded, cout, squeeze_excite, stride).
MNV3_REDUCED = (
    (16, 3, 16, 16, False, 1),
    (16, 3, 64, 24, False, 2),
    (24, 3, 72, 24, False, 1),
    (24, 5, 72, 40, True, 2),
    (40, 5, 120, 40, True, 1),
    (40, 5, 120, 40, True, 1),
    (40, 3, 240, 80, False, 2),
    (80, 3, 200, 80, False, 1),
    (80, 3, 184, 80, False, 1),
    (80, 3, 184, 80, False, 1),
    (80, 3, 480, 112, True, 1),
    (112, 3, 672, 112, True, 1),
    (112, 5, 672, 80, True, 2),  # C4; the SSDLite wrapper splits this block
    (80, 5, 480, 80, True, 1),
    (80, 5, 480, 80, True, 1),
)


def _make_divisible(v, divisor=8):
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def _cna(out, prefix, cin, cout, k, groups=1):
    out.append((f"{prefix}.0.weight", [cout, cin // groups, k, k]))
    _bn(out, f"{prefix}.1", cout)


def _inverted_residual(out, prefix, cfg):
    cin, k, exp, cout, se, _stride = cfg
    j = 0
    if exp != cin:
        _cna(out, f"{prefix}.{j}", cin, exp, 1)
        j += 1
    _cna(out, f"{prefix}.{j}", exp, exp, k, groups=exp)
    j += 1
    if se:
        sq = _make_divisible(exp // 4, 8)
        out.append((f"{prefix}.{j}.fc1.weight", [sq, exp, 1, 1]))
        out.append((f"{prefix}.{j}.fc1.bias", [sq]))
        out.append((f"{prefix}.{j}.fc2.weight", [exp, sq, 1, 1]))
        out.append((f"{prefix}.{j}.fc2.bias", [exp]))
        j += 1
    _cna(out, f"{prefix}.{j}", exp, cout, 1)


def ssd():
    """ssdlite320_mobilenet_v3_large(weights='DEFAULT'): SSD order backbone
    (SSDLiteFeatureExtractorMobileNet: features.0 = mobilenet stem + blocks
    1..12 + the C4 block's expansion conv, features.1 = the C4 block's
    remainder + blocks 14/15 + the 6x-width final conv, then 4 extra blocks)
    -> head (classification then regression, depthwise-separable prediction
    blocks over 6 levels, 6 anchors/cell, 91 classes). Reduced mobilenet
    tail: weights='DEFAULT' drops weights_backbone, which flips torchvision's
    reduce_tail on."""
    out = []
    # features.0: stem CNA + blocks 1..12 + block 13's expansion CNA
    _cna(out, "backbone.features.0.0", 3, 16, 3)
    for bi, cfg in enumerate(MNV3_REDUCED[:12]):
        _inverted_residual(out, f"backbone.features.0.{bi + 1}.block", cfg)
    _cna(out, "backbone.features.0.13", 112, 672, 1)  # C4 expansion
    # features.1: 1.0 = the rest of block 13 (dw CNA, SE, project CNA),
    # then blocks 14, 15, and the final 1x1 conv to 6*80=480.
    _cna(out, "backbone.features.1.0.0", 672, 672, 5, groups=672)
    sq = _make_divisible(672 // 4, 8)
    out.append(("backbone.features.1.0.1.fc1.weight", [sq, 672, 1, 1]))
    out.append(("backbone.features.1.0.1.fc1.bias", [sq]))
    out.append(("backbone.features.1.0.1.fc2.weight", [672, sq, 1, 1]))
    out.append(("backbone.features.1.0.1.fc2.bias", [672]))
    _cna(out, "backbone.features.1.0.2", 672, 80, 1)
    for j, cfg in enumerate(MNV3_REDUCED[13:]):
        _inverted_residual(out, f"backbone.features.1.{j + 1}.block", cfg)
    _cna(out, "backbone.features.1.3", 80, 480, 1)
    # extra blocks: 1x1 reduce -> dw 3x3 s2 -> 1x1 expand (ReLU6, BN)
    chans = ((480, 512), (512, 256), (256, 256), (256, 128))
    for ei, (cin, cout) in enumerate(chans):
        mid = cout // 2
        _cna(out, f"backbone.extra.{ei}.0", cin, mid, 1)
        _cna(out, f"backbone.extra.{ei}.1", mid, mid, 3, groups=mid)
        _cna(out, f"backbone.extra.{ei}.2", mid, cout, 1)
    # heads: per level, dw 3x3 CNA + 1x1 projection conv (with bias)
    feats = (672, 480, 512, 256, 256, 128)
    for head, cols in (("classification_head", 91), ("regression_head", 4)):
        for li, ch in enumerate(feats):
            p = f"head.{head}.module_list.{li}"
            _cna(out, f"{p}.0", ch, ch, 3, groups=ch)
            out.append((f"{p}.1.weight", [6 * cols, ch, 1, 1]))
            out.append((f"{p}.1.bias", [6 * cols]))
    return out


# --------------------------------------------------------------------------
# ultralytics yolov5n
# --------------------------------------------------------------------------


def _yconv(out, prefix, cin, cout, k):
    out.append((f"{prefix}.conv.weight", [cout, cin, k, k]))
    _bn(out, f"{prefix}.bn", cout)


def _yc3(out, prefix, cin, cout, n):
    h = cout // 2
    _yconv(out, f"{prefix}.cv1", cin, h, 1)
    _yconv(out, f"{prefix}.cv2", cin, h, 1)
    _yconv(out, f"{prefix}.cv3", cout, cout, 1)  # 2h == cout
    for j in range(n):
        _yconv(out, f"{prefix}.m.{j}.cv1", h, h, 1)
        _yconv(out, f"{prefix}.m.{j}.cv2", h, h, 3)


def yolov5n():
    """ultralytics yolov5n (v6.0+ arch, depth 0.33 / width 0.25): 6x6 stem,
    C3 backbone/head, SPPF, 3-level Detect with the 'anchors' buffer
    registered before the m convs."""
    out = []
    _yconv(out, "model.0", 3, 16, 6)
    _yconv(out, "model.1", 16, 32, 3)
    _yc3(out, "model.2", 32, 32, 1)
    _yconv(out, "model.3", 32, 64, 3)
    _yc3(out, "model.4", 64, 64, 2)
    _yconv(out, "model.5", 64, 128, 3)
    _yc3(out, "model.6", 128, 128, 3)
    _yconv(out, "model.7", 128, 256, 3)
    _yc3(out, "model.8", 256, 256, 1)
    # SPPF: cv1 to c/2, cv2 from 4x(c/2)
    _yconv(out, "model.9.cv1", 256, 128, 1)
    _yconv(out, "model.9.cv2", 512, 256, 1)
    _yconv(out, "model.10", 256, 128, 1)
    _yc3(out, "model.13", 256, 128, 1)
    _yconv(out, "model.14", 128, 64, 1)
    _yc3(out, "model.17", 128, 64, 1)
    _yconv(out, "model.18", 64, 64, 3)
    _yc3(out, "model.20", 128, 128, 1)
    _yconv(out, "model.21", 128, 128, 3)
    _yc3(out, "model.23", 256, 256, 1)
    out.append(("model.24.anchors", [3, 3, 2]))  # buffer precedes m convs
    for li, cin in enumerate((64, 128, 256)):
        out.append((f"model.24.m.{li}.weight", [255, cin, 1, 1]))
        out.append((f"model.24.m.{li}.bias", [255]))
    return out


FAMILIES = {
    "faster_rcnn": faster_rcnn,
    "retinanet": retinanet,
    "ssd": ssd,
    "yolov5n": yolov5n,
}


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(__file__), "..", "tests", "fixtures", "manifests"
    )
    os.makedirs(out_dir, exist_ok=True)
    for family, fn in FAMILIES.items():
        manifest = fn()
        path = os.path.join(out_dir, f"{family}.json")
        with open(path, "w") as f:
            json.dump(manifest, f, indent=0)
        n_tensors = len(manifest)
        n_params = sum(
            int(__import__("numpy").prod(s)) for _, s in manifest if s
        )
        print(f"{family}: {n_tensors} tensors, {n_params / 1e6:.2f}M params -> {path}")


if __name__ == "__main__":
    main()

"""Per-stage cumulative ablation of the YOLOv5n serving TRUNK (bf16).

The r4i ablation put trunk+raw-heads at 14.5 ms of the 22.9 ms B=128
serving step at 23% MFU, but never localized WHERE in the trunk the time
goes — needed to aim the small-channel MXU-underfill levers (e.g. the
block-diagonal 1x1 form, tools/exp_mm1x1.py). Cumulative prefixes of the
layer graph, each prefix ONE jit (stage deltas from separate launches LIE
— CLAUDE.md), chained launches, one float() fetch per arm.

Stage cut points (layer table yolov5.py layers()):
  l0 stem | l1 ds16->32 | l2 C3 | l3 ds | l4 C3x2 | l5+l6 | l7+l8+l9 |
  neck-up l10-l17 | neck-down l18-l23 | +raw heads (predict_raw)

    python tools/exp_trunkstages.py [B] [iters] [dtype]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from edgeml_tpu.models.yolov5 import YoloV5, calibrate_bn
from edgeml_tpu.utils.synth import hash_uniform

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 16
DT = {"f32": jnp.float32, "bf16": jnp.bfloat16}[
    sys.argv[3] if len(sys.argv) > 3 else "bf16"
]

net = YoloV5(variant="n", num_classes=80, img_size=640)
params, stats = net.init(jax.random.PRNGKey(0))
stats = calibrate_bn(
    net, params, stats, lambda i: hash_uniform(9000 + i, (8, 640, 640, 3))
)

cast = lambda t: jax.tree_util.tree_map(
    lambda a: a.astype(DT)
    if getattr(a, "dtype", None) == jnp.float32 else a, t)
params_c = dict(cast(params), detect=params["detect"])
stats_c = cast(stats)


def prefix(x, upto):
    """walk() with a cutoff: run layers 0..upto, return the live tensor
    set (last output + any stored outputs a later stage would need —
    summed together, which is enough to keep all computed work live)."""
    outputs = {}
    y = x
    for idx, kind, src, kw in net.layers():
        if idx > upto:
            break
        name = f"l{idx}"
        if kind == "conv":
            y, _ = net._convbn(
                y if src == -1 else outputs[src],
                params_c[name], stats_c[name],
                kw.get("p", kw["k"] // 2), kw["s"], False,
            )
        elif kind == "c3":
            y, _ = net._c3(y, params_c[name], stats_c[name],
                           kw["shortcut"], False)
        elif kind == "sppf":
            y, _ = net._sppf(y, params_c[name], stats_c[name], False)
        elif kind == "up":
            from edgeml_tpu.models.yolov5 import upsample2x
            y = upsample2x(y)
        elif kind == "concat":
            y = jnp.concatenate([y, outputs[src[1]]], axis=-1)
        outputs[idx] = y
    return y


CUTS = [
    ("l0 stem", 0), ("l1 ds", 1), ("l2 C3", 2), ("l3 ds", 3),
    ("l4 C3x2", 4), ("l6 (+l5 ds,C3x3)", 6), ("l9 (+l7,l8,sppf)", 9),
    ("l17 neck-up", 17), ("l23 neck-down", 23), ("heads (predict_raw)", 99),
]

for label, upto in CUTS:

    @jax.jit
    def step(acc, seed):
        x = hash_uniform(seed, (B, 640, 640, 3))
        if upto == 99:
            out = net.predict_raw(params, stats, x, dtype=DT)
            return acc + out[0].astype(jnp.float32).sum() * 1e-9
        y = prefix(x.astype(DT), upto)
        return acc + y.astype(jnp.float32).sum() * 1e-9

    t0 = time.perf_counter()
    acc = step(jnp.zeros(()), 0)
    float(acc)
    wu = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(ITERS):
        acc = step(acc, 1 + i)
    float(acc)
    el = time.perf_counter() - t0
    print(
        f"{label:24s}: {el / ITERS * 1e3:8.2f} ms/batch "
        f"({B * ITERS / el:8.1f} img/s, warmup {wu:.1f}s)",
        flush=True,
    )

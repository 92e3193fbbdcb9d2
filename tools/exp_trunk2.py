"""Layer-wise trunk ablation: where do the serving trunk's milliseconds go,
and where does the int8 walk actually win?

Cumulative trunk-up-to-layer-L programs (everything after L is dead code and
XLA eliminates it), chained through a scalar acc with one final fetch. Stages
are the backbone/neck block boundaries; "head" adds the split head convs +
decode (the full predict/q8_predict).

    python tools/exp_trunk2.py [B] [iters] [bf16|int8|f32]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from edgeml_tpu.models.quant import Q8Yolo, prepare_int8, q8_predict
from edgeml_tpu.models.yolov5 import YoloV5, calibrate_bn
from edgeml_tpu.utils.synth import hash_uniform

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 8
MODE = sys.argv[3] if len(sys.argv) > 3 else "bf16"
STAGES = [1, 2, 4, 6, 8, 9, 13, 17, 20, 23, 99]  # 99 = +head+decode

net = YoloV5(variant="n", num_classes=80, img_size=640)
params, stats = net.init(jax.random.PRNGKey(0))
stats = calibrate_bn(
    net, params, stats, lambda i: hash_uniform(9000 + i, (8, 640, 640, 3))
)

if MODE == "int8":
    q8tree = prepare_int8(
        net, params, stats,
        lambda i: hash_uniform(7000 + i, (16, 640, 640, 3)), iters=2,
    ).tree


def q8_trunk_upto(tree, x, upto):
    """Q8Yolo.trunk stopped after layer `upto` (same walk, early exit)."""
    q = Q8Yolo(net, tree["qparams"], tree["scales"], tree["detect"])
    from edgeml_tpu.models.quant import quantize_tensor
    from edgeml_tpu.models.common import upsample2x

    xq = quantize_tensor(x, q.scales["in"])
    outputs = {}
    y = xq
    for idx, kind, src, kw in net.layers():
        name = f"l{idx}"
        if kind == "conv":
            y = q._convbn_q(name, y if src == -1 else outputs[src],
                            kw.get("p", kw["k"] // 2), kw["s"])
        elif kind == "c3":
            y = q._c3_q(name, y, kw["shortcut"])
        elif kind == "sppf":
            y = q._sppf_q(name, y)
        elif kind == "up":
            y = upsample2x(y)
        elif kind == "concat":
            y = jnp.concatenate([y, outputs[src[1]]], axis=-1)
        outputs[idx] = y
        if idx == upto:
            return y
    return y


def stage(upto):
    def fn(acc, seed):
        imgs = hash_uniform(seed, (B, 640, 640, 3))
        if MODE == "int8":
            if upto == 99:
                o, xw, cl = q8_predict(net, q8tree, imgs,
                                       score_dtype=jnp.bfloat16)
                return acc + o.astype(jnp.float32).sum() * 1e-9 \
                    + xw[0, 0, 0] + cl.astype(jnp.float32)[0, 0, 0]
            y = q8_trunk_upto(q8tree, imgs, upto)
            return acc + y.astype(jnp.float32).sum() * 1e-9
        dt = None if MODE == "f32" else jnp.bfloat16
        if upto == 99:
            o, xw, cl = net.predict(params, stats, imgs, dtype=dt)
            return acc + o.astype(jnp.float32).sum() * 1e-9 \
                + xw[0, 0, 0] + cl.astype(jnp.float32)[0, 0, 0]
        if dt is not None:
            cast = lambda t: jax.tree_util.tree_map(
                lambda a: a.astype(dt)
                if getattr(a, "dtype", None) == jnp.float32 else a, t)
            p_t = dict(cast(params), detect=params["detect"])
            _, _, taps = net._trunk(p_t, cast(stats), imgs.astype(dt),
                                    False, taps=(upto,))
        else:
            _, _, taps = net._trunk(params, stats, imgs, False, taps=(upto,))
        return acc + taps[upto].astype(jnp.float32).sum() * 1e-9

    return fn


prev = 0.0
for st in STAGES:
    step = jax.jit(stage(st))
    t0 = time.perf_counter()
    float(step(jnp.zeros(()), 0))
    warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    acc = jnp.zeros(())
    for i in range(ITERS):
        acc = step(acc, 1 + i)
    float(acc)
    ms = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{MODE} upto l{st:<3}: warmup {warm:5.1f}s  {ms:8.2f} ms/batch  "
          f"(+{ms - prev:7.2f})", flush=True)
    prev = ms

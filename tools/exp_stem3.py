"""Where does stem+l1 time go? Cumulative in-jit stages at serving shapes.

exp_trunk2 (r4a) showed l1 (stem + first downsampler) = 4.99 ms of the
12.20 ms B=128 bf16 trunk (41%), while its roofline is ~1.7 ms (629 MB f32
input read + early-activation round trips at 819 GB/s; compute is ~75
GFLOP ≈ 0.8 ms). This isolates the candidates:

  a  input cast f32->bf16 only (sum to keep it live)
  b  + the 2x2 space-to-depth rearrangement (reshape/transpose/reshape)
  c  + stem conv 3x3 s1 over s2d (+BN+SiLU epilogue)     [= layer 0]
  d  + first downsampler conv 3x3 s2 16->32 (+BN+SiLU)   [= layer 1]
  e  layer 0 WITHOUT the separate cast (cast fused into s2d read) — is the
     explicit astype a separate HBM pass or free?

Chained launches, on-device input generation, one float() fetch per region
(CLAUDE.md measurement rules).

    python tools/exp_stem3.py [B] [iters] [dtype]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from edgeml_tpu.models.common import conv2d
from edgeml_tpu.models.yolov5 import YoloV5
from edgeml_tpu.utils.synth import hash_uniform

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 16
DT = {"f32": jnp.float32, "bf16": jnp.bfloat16}[
    sys.argv[3] if len(sys.argv) > 3 else "bf16"
]

net = YoloV5(variant="n", num_classes=80, img_size=640)
params, stats = net.init(jax.random.PRNGKey(0))


def bn_silu(x, name):
    # perf probe only — approximates _convbn's BN+SiLU epilogue cost
    p, s = params[name], stats[name]
    inv = jax.lax.rsqrt(s["v"].astype(DT) + 1e-3)
    y = (x - s["m"].astype(DT)) * inv * p["g"].astype(DT) + p["b"].astype(DT)
    return y * jax.nn.sigmoid(y)


def stage(which):
    w0 = params["l0"]["w"].astype(DT)
    w1 = params["l1"]["w"].astype(DT)

    def fn(acc, seed):
        x = hash_uniform(seed, (B, 640, 640, 3))
        if which == "a":
            return acc + x.astype(DT).astype(jnp.float32).sum() * 1e-9
        b, h, wd, c = x.shape
        if which == "e":
            xs = (
                x.reshape(b, h // 2, 2, wd // 2, 2, c)
                .transpose(0, 1, 3, 2, 4, 5)
                .reshape(b, h // 2, wd // 2, 4 * c)
            ).astype(DT)
        else:
            xc = x.astype(DT)
            xs = (
                xc.reshape(b, h // 2, 2, wd // 2, 2, c)
                .transpose(0, 1, 3, 2, 4, 5)
                .reshape(b, h // 2, wd // 2, 4 * c)
            )
        if which == "b":
            return acc + xs.astype(jnp.float32).sum() * 1e-9
        # stem conv over the s2d input (conv2d_stem_s2d body, inlined so
        # the s2d stage above is the SAME array): 3x3 s1 p1 + BN + SiLU
        k = params["l0"]["w"].shape[0]
        kh = k // 2
        ws = (
            w0.reshape(kh, 2, kh, 2, c, -1)
            .transpose(0, 2, 1, 3, 4, 5)
            .reshape(kh, kh, 4 * c, -1)
        )
        p = kh // 2
        y = bn_silu(conv2d(xs, ws, 1, padding=((p, p), (p, p))), "l0")
        if which in ("c", "e"):
            return acc + y.astype(jnp.float32).sum() * 1e-9
        y = bn_silu(conv2d(y, w1, 2, padding=((1, 1), (1, 1))), "l1")
        return acc + y.astype(jnp.float32).sum() * 1e-9

    return fn


for which in (sys.argv[4:] or ["a", "b", "c", "d", "e"]):
    step = jax.jit(stage(which))
    t0 = time.perf_counter()
    float(step(jnp.zeros(()), 0))
    print(f"stage {which}: warmup {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    acc = jnp.zeros(())
    for i in range(ITERS):
        acc = step(acc, 1 + i)
    float(acc)
    ms = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"stage {which}: {ms:8.2f} ms/batch", flush=True)

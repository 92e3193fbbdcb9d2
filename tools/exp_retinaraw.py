"""RETINA_RAW tail A/B on full RetinaNet serving (B=16, f32 and bf16).

The dense tail pays a full (B, 76725, 91) sigmoid + full box decode before
the exact pair ranking reads its top 2048 boxes; the raw tail hoists the
box prefilter in front of the transcendentals (models/retinanet.py
RETINA_RAW — f32 bit-identical, bf16 ~1 ulp box drift). Also reports the
stage sizes: trunk+heads alone, +rowmax/prefilter, full step. Chained
launches, on-device input generation, float() fetch per arm (CLAUDE.md).

    python tools/exp_retinaraw.py [B] [iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

import edgeml_tpu.models.retinanet as rn
from edgeml_tpu.models.infer import _detect_generic
from edgeml_tpu.models.retinanet import RetinaNet, retina_postprocess
from edgeml_tpu.utils.synth import hash_uniform

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 8

net = RetinaNet(num_classes=91)
params = net.init(jax.random.PRNGKey(0))
size = net.image_size


def timed(tag, step):
    t0 = time.perf_counter()
    acc = step(jnp.zeros(()), 0)
    float(acc)
    wu = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(ITERS):
        acc = step(acc, 1 + i)
    a = float(acc)
    el = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{tag}: {el:8.2f} ms/batch  {B / el * 1e3:8.2f} img/s  "
          f"(warmup {wu:.1f}s, acc {a:.6f})", flush=True)


for dt, dname in ((None, "f32"), (jnp.bfloat16, "bf16")):
    # stage: trunk+heads only (the tail budget reference)
    cast = lambda t: jax.tree_util.tree_map(
        lambda a: a.astype(dt)
        if dt is not None and getattr(a, "dtype", None) == jnp.float32
        else a, t)
    params_c = cast(params)

    @jax.jit
    def trunk_only(acc, seed):
        imgs = hash_uniform(seed, (B, size, size, 3))
        if dt is not None:
            imgs = imgs.astype(dt)
        cls, reg = net.apply(params_c, imgs)
        return acc + cls.astype(jnp.float32).sum() * 1e-9 \
            + reg.astype(jnp.float32).sum() * 1e-9

    timed(f"{dname} trunk+heads      ", trunk_only)

    for raw in (True, False):
        rn.RETINA_RAW = raw
        retina_postprocess.clear_cache()

        @jax.jit
        def step(acc, seed):
            imgs = hash_uniform(seed, (B, size, size, 3))
            dets, valid = _detect_generic(
                net, params, None, imgs, 0.05, 0.5, dtype=dt
            )
            return acc + dets.sum() * 1e-9 + valid.sum() * 1e-9

        timed(f"{dname} full raw={raw!s:5s}  ", step)

rn.RETINA_RAW = True
retina_postprocess.clear_cache()

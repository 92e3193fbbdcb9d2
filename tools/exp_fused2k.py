"""Blocked fused suppressor at K=2048 on the REAL chip: (1) does the
blocked kernel compile through the axon remote compiler (the monolithic
K=2048 kernel crashed it at every tj, r4b)? (2) standalone kernel A/B vs
the XLA fixpoint, correctness-checked on-device; (3) SSDLite + RetinaNet
full serving A/B fused (FUSED_MAX_K=2048) vs XLA fixpoint (FUSED_MAX_K=0).
Chained accumulator, float() fetch; trace caches cleared per arm.

    python tools/exp_fused2k.py [B] [iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

import edgeml_tpu.ops.nms as nms_mod
from edgeml_tpu.models.infer import _detect_generic
from edgeml_tpu.ops.nms import greedy_keep_mask, nms_split_batch
from edgeml_tpu.ops.nms_fused import greedy_keep_mask_fused
from edgeml_tpu.utils.synth import hash_uniform

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 8

# --- 1+2: standalone kernel at K=2048, correctness + time ---------------
K = 2048
rng = np.random.default_rng(0)
hot = 400
centers = rng.uniform(50, 600, (B, hot, 2))
idx = rng.integers(0, hot, (B, K))
c = np.take_along_axis(centers, idx[..., None], axis=1) \
    + rng.normal(0, 6, (B, K, 2))
wh = np.exp(rng.uniform(np.log(10), np.log(80), (B, K, 2)))
boxes = jnp.asarray(
    np.concatenate([c - wh / 2, c + wh / 2], -1).astype(np.float32))
scores = jnp.asarray(
    np.sort(rng.random((B, K)).astype(np.float32))[:, ::-1].copy())

t0 = time.perf_counter()
try:
    got = greedy_keep_mask_fused(boxes, scores, 0.55)
    ng = int(jnp.sum(got))
    print(f"blocked K=2048 kernel COMPILED+RAN in "
          f"{time.perf_counter() - t0:.1f}s, keeps {ng}", flush=True)
except Exception as e:
    print(f"blocked K=2048 kernel FAILED: {type(e).__name__}: "
          f"{str(e)[:300]}", flush=True)
    sys.exit(1)

want = jax.jit(jax.vmap(
    lambda bb, ss: greedy_keep_mask(bb, ss, 0.55)))(boxes, scores)
eq = bool(jnp.all(want == got))
print(f"on-device bit-identical vs XLA fixpoint: {eq} "
      f"(keeps {int(jnp.sum(want))})", flush=True)
assert eq

for tag, fn in (
    ("fused ", lambda b1, s1: greedy_keep_mask_fused(b1, s1, 0.55)),
    ("xla   ", jax.jit(jax.vmap(lambda bb, ss: greedy_keep_mask(bb, ss, 0.55)))),
):
    acc = jnp.zeros(())
    fn(boxes, scores)  # warm
    t0 = time.perf_counter()
    for i in range(ITERS):
        acc = acc + jnp.sum(fn(boxes + acc * 0, scores))
    float(acc)
    el = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"standalone K=2048 {tag}: {el:7.2f} ms/launch (B={B})", flush=True)

# --- 3: SSD + RetinaNet serving A/B -------------------------------------
from edgeml_tpu.models.retinanet import RetinaNet
from edgeml_tpu.models.ssdlite import SSDLite

for name, net in (("ssdlite", SSDLite(num_classes=91)),
                  ("retinanet", RetinaNet(num_classes=91))):
    init = net.init(jax.random.PRNGKey(0))
    params, stats = init if isinstance(init, tuple) else (init, None)
    size = net.image_size
    for mode, maxk in (("fused2k", 2048), ("xla-fixpoint", 0)):
        nms_mod.FUSED_MAX_K = maxk
        nms_split_batch.clear_cache()  # trace-time flag

        @jax.jit
        def step(acc, seed):
            imgs = hash_uniform(seed, (B, size, size, 3))
            dets, valid = _detect_generic(
                net, params, stats, imgs, 0.05, 0.5
            )
            return acc + dets.sum() * 1e-9 + valid.sum() * 1e-9

        try:
            t0 = time.perf_counter()
            float(step(jnp.zeros(()), 0))
            print(f"{name} {mode}: warmup {time.perf_counter() - t0:.1f}s",
                  flush=True)
            acc = jnp.zeros(())
            t0 = time.perf_counter()
            for i in range(ITERS):
                acc = step(acc, 1 + i)
            a = float(acc)
            ms = (time.perf_counter() - t0) / ITERS * 1e3
            print(f"{name} {mode}: {ms:8.2f} ms/batch  "
                  f"{B / ms * 1e3:8.2f} img/s  acc {a:.6f}", flush=True)
        except Exception as e:
            print(f"{name} {mode}: FAILED {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
nms_mod.FUSED_MAX_K = 2048
nms_split_batch.clear_cache()

"""SSDLite int8 PTQ serving throughput vs f32/bf16 (models/quant_ssd.py)
on the full anchor-family serving step (_detect_generic + postprocess),
B=16 like the bench families section. Chained accumulator, float() fetch.

    python tools/exp_q8ssd.py [B] [iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from edgeml_tpu.models.infer import _detect_generic
from edgeml_tpu.models.quant_ssd import prepare_int8_ssd
from edgeml_tpu.models.ssdlite import SSDLite
from edgeml_tpu.utils.synth import hash_uniform

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 8

net = SSDLite(num_classes=91)
params, stats = net.init(jax.random.PRNGKey(0))
size = net.image_size

t0 = time.perf_counter()
q8 = prepare_int8_ssd(
    net, params, stats,
    lambda i: hash_uniform(6000 + i, (8, size, size, 3)), iters=2,
).tree
float(jnp.sum(jax.tree_util.tree_leaves(q8)[0].astype(jnp.float32)))
print(f"int8 prep: {time.perf_counter() - t0:.1f}s", flush=True)

for tag, dt, q in (("f32", None, None), ("bf16", jnp.bfloat16, None),
                   ("int8", None, q8)):

    @jax.jit
    def step(acc, seed, dt=dt, q=q):
        imgs = hash_uniform(seed, (B, size, size, 3))
        dets, valid = _detect_generic(
            net, params, stats, imgs, 0.05, 0.5, dtype=dt, q8=q
        )
        return acc + dets.sum() * 1e-9 + valid.sum() * 1e-9

    t0 = time.perf_counter()
    float(step(jnp.zeros(()), 0))
    print(f"{tag}: warmup {time.perf_counter() - t0:.1f}s", flush=True)
    acc = jnp.zeros(())
    t0 = time.perf_counter()
    for i in range(ITERS):
        acc = step(acc, 1 + i)
    a = float(acc)
    ms = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{tag}: {ms:8.2f} ms/batch  {B / ms * 1e3:8.2f} img/s  "
          f"acc {a:.6f}", flush=True)

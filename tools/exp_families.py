"""Serving throughput of the anchor families on TPU (random weights).

Exercises _detect_generic end-to-end per family — including the chunked
proposal top-k paths that otherwise only run on the CPU test platform —
and records img/s at a modest batch.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from edgeml_tpu.models.infer import _detect_generic
from edgeml_tpu.utils.synth import hash_uniform as cheap

FAMILIES = ("ssd", "retinanet", "faster_rcnn")
B = int(sys.argv[2]) if len(sys.argv) > 2 else 16
DTYPE = sys.argv[3] if len(sys.argv) > 3 else "f32"
which = sys.argv[1] if len(sys.argv) > 1 else "all"
if which != "all" and which not in FAMILIES:
    raise SystemExit(f"unknown family {which!r}; choose from {FAMILIES} or 'all'")


def bench_family(name):
    if name == "ssd":
        from edgeml_tpu.models.ssdlite import SSDLite

        net = SSDLite(num_classes=91)
        params, stats = net.init(jax.random.PRNGKey(0))
        size = net.image_size
    elif name == "retinanet":
        from edgeml_tpu.models.retinanet import RetinaNet

        net = RetinaNet(num_classes=91)
        params = net.init(jax.random.PRNGKey(0))
        stats = None
        size = net.image_size
    else:
        from edgeml_tpu.models.faster_rcnn import FasterRCNN

        net = FasterRCNN(num_classes=91)
        params = net.init(jax.random.PRNGKey(0))
        stats = None
        size = net.image_size

    dt = jnp.bfloat16 if DTYPE == "bf16" else None

    @jax.jit
    def step(acc, seed):
        imgs = cheap(seed, (B, size, size, 3))
        dets, valid = _detect_generic(net, params, stats, imgs, 0.05, 0.5,
                                      dtype=dt)
        return acc + dets.sum() * 1e-9 + valid.sum() * 1e-9

    t0 = time.perf_counter()
    acc = step(jnp.zeros(()), 0)
    float(acc)  # value fetch; block_until_ready is a no-op on axon
    print(f"{name}: warmup incl. compile {time.perf_counter() - t0:.1f}s",
          flush=True)
    iters = 6
    t0 = time.perf_counter()
    for i in range(iters):
        acc = step(acc, 1 + i)
    float(acc)  # value fetch; block_until_ready is a no-op on axon
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:12s} B={B} {DTYPE} size={size}: {dt * 1e3:8.2f} ms/batch "
          f"{B / dt:7.1f} img/s", flush=True)


for name in (FAMILIES if which == "all" else (which,)):
    bench_family(name)

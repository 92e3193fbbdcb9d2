"""NMS_BLOCK A/B on the SSD / RetinaNet serving postprocess.

Their K=2048 suppression rides the XLA global fixpoint (the fused Pallas
kernel is gated to K<=1024 after the remote-compiler crash). The blocked
form (ops/nms.py NMS_BLOCK) streams the (2048, 2048) sup matrix once
instead of once per suppression-chain link.

    python tools/exp_famblock.py [family|all] [B] [dtype]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from edgeml_tpu.models.infer import _detect_generic
from edgeml_tpu.ops import nms
from edgeml_tpu.utils.synth import hash_uniform as cheap

B = int(sys.argv[2]) if len(sys.argv) > 2 else 16
DTYPE = sys.argv[3] if len(sys.argv) > 3 else "f32"
which = sys.argv[1] if len(sys.argv) > 1 else "all"
FAMILIES = ("ssd", "retinanet")


def make_net(name):
    if name == "ssd":
        from edgeml_tpu.models.ssdlite import SSDLite

        net = SSDLite(num_classes=91)
        params, stats = net.init(jax.random.PRNGKey(0))
    else:
        from edgeml_tpu.models.retinanet import RetinaNet

        net = RetinaNet(num_classes=91)
        params = net.init(jax.random.PRNGKey(0))
        stats = None
    return net, params, stats


def bench(name, block):
    net, params, stats = make_net(name)
    nms.NMS_BLOCK = block
    # NMS_BLOCK is read at trace time inside module-level-jitted wrappers
    # (nms_split_batch, nms_rows) whose trace caches are keyed on avals —
    # without clearing, every arm silently reuses the first arm's trace
    # (the same nested-jit failure that invalidated the r4b G sweep).
    nms.nms_split_batch.clear_cache()
    nms.nms_rows.clear_cache()
    nms.nms_split.clear_cache()
    dt = jnp.bfloat16 if DTYPE == "bf16" else None
    size = net.image_size

    @jax.jit
    def step(acc, seed):
        imgs = cheap(seed, (B, size, size, 3))
        dets, valid = _detect_generic(net, params, stats, imgs, 0.05, 0.5,
                                      dtype=dt)
        return acc + dets.sum() * 1e-9 + valid.sum() * 1e-9

    t0 = time.perf_counter()
    float(step(jnp.zeros(()), 0))
    print(f"{name} block={block}: warmup {time.perf_counter() - t0:.1f}s",
          flush=True)
    iters = 8
    acc = jnp.zeros(())
    t0 = time.perf_counter()
    for i in range(iters):
        acc = step(acc, 1 + i)
    float(acc)
    d = (time.perf_counter() - t0) / iters
    print(f"{name:10s} block={str(block):4s} B={B} {DTYPE}: "
          f"{d * 1e3:8.2f} ms/batch {B / d:7.1f} img/s", flush=True)


for name in (FAMILIES if which == "all" else (which,)):
    for block in (None, 512, 256):
        bench(name, block)

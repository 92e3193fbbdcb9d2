"""Pallas gather kernel vs XLA gathers, in-context after the trunk."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from edgeml_tpu.models.yolov5 import YoloV5
from gather_pallas_kernel import gather_rows  # tools/ sibling
from edgeml_tpu.ops.nms import topk1d

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 8
DT = jnp.bfloat16
N, NC, KB = 25200, 80, 1024
CONF = 1e-5

net = YoloV5(variant="n", num_classes=NC, img_size=640)
params, stats = net.init(jax.random.PRNGKey(0))

# correctness on-TPU first
r = jax.random.PRNGKey(7)
src = jax.random.normal(r, (4, N, NC), jnp.float32)
idx = jax.random.randint(jax.random.PRNGKey(8), (4, KB), 0, N)
sc = jax.random.uniform(jax.random.PRNGKey(9), (4, N), jnp.float32)
ref = jax.vmap(lambda s, i, v: s[i] * v[i][:, None])(src, idx, sc)
out = gather_rows(src, idx, sc)
err = jnp.abs(out - ref).max()
print("max err scaled:", err, flush=True)
assert err == 0.0


def build(variant):
    def fn(acc, seed):
        imgs = jax.random.uniform(
            jax.random.PRNGKey(seed), (B, 640, 640, 3), jnp.float32
        )
        obj, xywh, cls = net.predict(params, stats, imgs, dtype=DT)

        def pre(o, c):
            best = jnp.max(c, axis=1) * o
            box_score = jnp.where((o > CONF) & (best > CONF), best, -1.0)
            return topk1d(box_score, KB)

        best_top, box_pre = jax.vmap(pre)(obj, cls)
        if variant == "xla":
            cc = jax.vmap(lambda c, o, i: c[i] * o[i][:, None])(
                cls, obj, box_pre
            )
        else:
            cc = gather_rows(cls, box_pre, obj)
        xg = jax.vmap(lambda x, i: x[i])(xywh, box_pre)
        return acc + best_top.sum() * 1e-9 + cc.sum() * 1e-9 + xg.sum() * 1e-12

    return jax.jit(fn)


for variant in ("xla", "pallas"):
    fn = build(variant)
    acc = fn(jnp.zeros(()), 0)
    float(acc)  # value fetch; block_until_ready is a no-op on axon
    t0 = time.perf_counter()
    for i in range(ITERS):
        acc = fn(acc, 1 + i)
    float(acc)  # value fetch; block_until_ready is a no-op on axon
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{variant:8s} {dt * 1e3:8.2f} ms  {B / dt:8.0f} img/s", flush=True)

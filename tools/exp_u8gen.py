"""Input-materialization A/B on the PRODUCTION pipelined serving step:
f32 in-jit generated images (hash_uniform, 629 MB write per 128x640^2
batch) vs uint8 (hash_u8, 157 MB) — the deployment input interface, whose
/255 normalize + serving-dtype cast fuse into one elementwise convert.
r4d attributed ~80% of the stem+l1 slice to input materialization; this
measures how much of it the u8 interface recovers. Chained launches, one
float() fetch per timed region.

    python tools/exp_u8gen.py [B] [iters] [dtypes...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from edgeml_tpu.models.infer import _detect_pipe_step, _zero_carry
from edgeml_tpu.models.yolov5 import YoloV5, calibrate_bn
from edgeml_tpu.utils.synth import hash_u8, hash_uniform

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 16
DTS = [
    {"f32": None, "bf16": jnp.bfloat16}[d] for d in (sys.argv[3:] or
                                                     ["bf16"])
]
CONF, IOU = 1e-5, 0.6

net = YoloV5(variant="n", num_classes=80, img_size=640)
params, stats = net.init(jax.random.PRNGKey(0))
stats = calibrate_bn(
    net, params, stats, lambda i: hash_uniform(9000 + i, (8, 640, 640, 3))
)
meta = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]]), (B, 1))
hw = jnp.tile(jnp.asarray([[640.0, 640.0]]), (B, 1))

for dt in DTS:
    dname = "f32" if dt is None else "bf16"
    for gen in ("f32", "u8"):

        @jax.jit
        def step(carry, seed, dt=dt, gen=gen):
            prev, acc, nfail = carry
            if gen == "u8":
                imgs = hash_u8(seed, (B, 640, 640, 3))
            else:
                imgs = hash_uniform(seed, (B, 640, 640, 3))
            nxt, d, v, ok = _detect_pipe_step(
                net, params, stats, prev, imgs, meta, hw, CONF, IOU, dtype=dt
            )
            return (nxt, acc + d.sum(), nfail + (1 - ok.astype(jnp.int32)))

        zero = (_zero_carry(net, B, 640, dt), jnp.zeros(()),
                jnp.zeros((), jnp.int32))
        t0 = time.perf_counter()
        carry = step(zero, 0)
        float(carry[1])
        print(f"{dname} gen={gen}: warmup {time.perf_counter() - t0:.1f}s",
              flush=True)
        t0 = time.perf_counter()
        for i in range(ITERS):
            carry = step(carry, 1 + i)
        acc = float(carry[1])
        el = time.perf_counter() - t0
        print(
            f"{dname} gen={gen:3s}: {el / ITERS * 1e3:7.2f} ms/batch  "
            f"{B * ITERS / el:7.1f} img/s  redos {int(carry[2])}/{ITERS}  "
            f"acc {acc:.1f}",
            flush=True,
        )

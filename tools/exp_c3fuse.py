"""A/B: C3 cv1/cv2 fused-conv knob (yolov5.C3_FUSE_CV12) on the production
serving step.

Each C3 block's cv1 and cv2 are 1x1 convs over the SAME input; the knob runs
them as one conv with concatenated output channels (2x the MXU lane width on
YOLOv5n's narrow layers), then splits. Numerically equivalent
(tests/test_yolov5.py::test_c3_fuse_cv12_bit_exact); this measures the
throughput delta on the pipelined serving step, both trunk dtypes.

    python tools/exp_c3fuse.py [B] [iters] [dtype] [variant]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

import edgeml_tpu.models.yolov5 as y5
from edgeml_tpu.models.infer import _detect_pipe_step, _zero_carry
from edgeml_tpu.models.yolov5 import YoloV5, calibrate_bn
from edgeml_tpu.utils.synth import hash_uniform

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 16
DT = {"f32": None, "bf16": jnp.bfloat16}[
    sys.argv[3] if len(sys.argv) > 3 else "bf16"
]
VARIANT = sys.argv[4] if len(sys.argv) > 4 else "n"
CONF, IOU = 1e-5, 0.6

net = YoloV5(variant=VARIANT, num_classes=80, img_size=640)
params, stats = net.init(jax.random.PRNGKey(0))
stats = calibrate_bn(
    net, params, stats, lambda i: hash_uniform(9000 + i, (8, 640, 640, 3))
)
meta = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]]), (B, 1))
hw = jnp.tile(jnp.asarray([[640.0, 640.0]]), (B, 1))

for fuse in (False, True):
    y5.C3_FUSE_CV12 = fuse
    name = "fused" if fuse else "plain"

    @jax.jit
    def step(carry, seed):
        prev, acc, nfail = carry
        imgs = hash_uniform(seed, (B, 640, 640, 3))
        nxt, d, v, ok = _detect_pipe_step(
            net, params, stats, prev, imgs, meta, hw, CONF, IOU, dtype=DT
        )
        return (nxt, acc + d.sum(), nfail + (1 - ok.astype(jnp.int32)))

    zero = (_zero_carry(net, B, 640, DT), jnp.zeros(()),
            jnp.zeros((), jnp.int32))
    t0 = time.perf_counter()
    carry = step(zero, 0)
    float(carry[1])
    print(f"{name}: warmup {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for i in range(ITERS):
        carry = step(carry, 1 + i)
    float(carry[1])
    el = time.perf_counter() - t0
    print(
        f"c3 {name}: {el / ITERS * 1e3:7.2f} ms/batch  "
        f"{B * ITERS / el:7.1f} img/s  redos {int(carry[2])}/{ITERS}",
        flush=True,
    )
y5.C3_FUSE_CV12 = False

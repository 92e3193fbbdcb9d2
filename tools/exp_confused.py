"""A/B: conf_fused serving tail vs the unfused tail (round 3).

conf_fused moves the obj*cls multiply and the per-box best-confidence row
max into the trunk's head epilogue (yolov5.decode_level_split fuse_conf) so
the NMS tail skips its full-matrix pass and the obj row gather
(ops/nms.py conf_fused). Detections are bit-identical (proved + tested,
tests/test_nms_split_batch.py::test_conf_fused_matches_unfused); this
measures the throughput delta on the production pipelined step.

Variants (chained-launch, one float() fetch per timing region):
  fused    the production _detect_pipe_step (predict fuse_conf=True)
  unfused  same step built against the pre-fusion tail (predict raw ->
           nms_split_batch(conf_fused=False))

    python tools/exp_confused.py [B] [iters] [dtype]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from edgeml_tpu.models.infer import _detect_pipe_step, _zero_carry
from edgeml_tpu.models.yolov5 import YoloV5, calibrate_bn
from edgeml_tpu.ops.nms import nms_split_batch
from edgeml_tpu.utils.synth import hash_uniform

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 16
DT = {"f32": None, "bf16": jnp.bfloat16}[
    sys.argv[3] if len(sys.argv) > 3 else "bf16"
]
CONF, IOU = 1e-5, 0.6

net = YoloV5(variant="n", num_classes=80, img_size=640)
params, stats = net.init(jax.random.PRNGKey(0))
stats = calibrate_bn(
    net, params, stats, lambda i: hash_uniform(9000 + i, (8, 640, 640, 3))
)
meta = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]]), (B, 1))
hw = jnp.tile(jnp.asarray([[640.0, 640.0]]), (B, 1))


def unfused_pipe_step(prev, images):
    """The pre-fusion serving step: raw (obj, xywh, cls) carry + unfused
    tail — the exact program production ran before conf_fused."""
    ppred, pmeta, phw = prev
    new = net.predict(params, stats, images, dtype=DT)
    obj, xywh, cls = ppred
    dets, valid, ok = nms_split_batch(
        obj, xywh, cls, CONF, IOU, fallback="flag", conf_fused=False
    )
    r, dw, dh = pmeta[:, 0:1], pmeta[:, 1:2], pmeta[:, 2:3]
    h, w = phw[:, 0:1], phw[:, 1:2]
    x1 = jnp.clip((dets[:, :, 0] - dw) / r, 0, w)
    y1 = jnp.clip((dets[:, :, 1] - dh) / r, 0, h)
    x2 = jnp.clip((dets[:, :, 2] - dw) / r, 0, w)
    y2 = jnp.clip((dets[:, :, 3] - dh) / r, 0, h)
    out = jnp.stack(
        [dets[:, :, 5], (x1 + x2) / 2 / w, (y1 + y2) / 2 / h,
         (x2 - x1) / w, (y2 - y1) / h, dets[:, :, 4]], axis=2,
    )
    return (new, meta, hw), out, valid, ok


@jax.jit
def step_unfused(carry, seed):
    prev, acc, nfail = carry
    imgs = hash_uniform(seed, (B, 640, 640, 3))
    nxt, d, v, ok = unfused_pipe_step(prev, imgs)
    return (nxt, acc + d.sum(), nfail + (1 - ok.astype(jnp.int32)))


@jax.jit
def step_fused(carry, seed):
    prev, acc, nfail = carry
    imgs = hash_uniform(seed, (B, 640, 640, 3))
    nxt, d, v, ok = _detect_pipe_step(
        net, params, stats, prev, imgs, meta, hw, CONF, IOU, dtype=DT
    )
    return (nxt, acc + d.sum(), nfail + (1 - ok.astype(jnp.int32)))


for name, step in (("fused", step_fused), ("unfused", step_unfused)):
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
        f"{name}: {el / ITERS * 1e3:7.2f} ms/batch  "
        f"{B * ITERS / el:7.1f} img/s  redos {int(carry[2])}/{ITERS}",
        flush=True,
    )

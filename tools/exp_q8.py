"""int8 vs bf16 vs f32 YOLOv5n serving-trunk throughput on the real chip.

Compares YoloV5.predict (f32 / bf16) against the Q8Yolo int8 walk at the
production shape (B=128, 640): trunk + split head + decode only (no NMS),
isolating the question "does the int8 MXU path beat bf16 on this chip?".

Methodology per CLAUDE.md: chained launches through a scalar accumulator,
on-device hash inputs, ONE value fetch at the end.
"""

import os
import time

import jax
import jax.numpy as jnp

from edgeml_tpu.models.quant import prepare_int8
from edgeml_tpu.models.yolov5 import YoloV5, calibrate_bn
from edgeml_tpu.utils.synth import hash_uniform

B = int(os.environ.get("Q8_BATCH", 128))
ITERS = int(os.environ.get("Q8_ITERS", 16))
SIZE = int(os.environ.get("Q8_SIZE", 640))


def chain(name, fn, iters=ITERS):
    step = jax.jit(fn)
    acc = jnp.zeros((), jnp.float32)
    t0 = time.perf_counter()
    acc = step(acc, 0)
    print(f"{name}: fetch warmup...", flush=True)
    float(acc)
    print(f"{name}: warmup {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for i in range(iters):
        acc = step(acc, 1 + i)
    v = float(acc)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt * 1e3:.2f} ms/batch -> {B / dt:.0f} img/s "
          f"(acc={v:.4g})", flush=True)
    return dt


def main():
    print("devices:", jax.devices(), flush=True)
    net = YoloV5(variant="n", num_classes=80, img_size=SIZE)
    params, stats = net.init(jax.random.PRNGKey(0))
    t0 = time.perf_counter()
    stats = calibrate_bn(
        net, params, stats, lambda i: hash_uniform(9000 + i, (8, SIZE, SIZE, 3))
    )
    jax.block_until_ready(stats)
    print(f"bn calibration: {time.perf_counter() - t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    q8 = prepare_int8(
        net, params, stats,
        lambda i: hash_uniform(9100 + i, (8, SIZE, SIZE, 3)), iters=2,
    )
    q8.scales = jax.tree_util.tree_map(jnp.asarray, q8.scales)
    print(f"int8 prep (fold+calibrate+quantize): "
          f"{time.perf_counter() - t0:.1f}s", flush=True)

    def mk(pred_fn):
        def step(acc, i):
            imgs = hash_uniform(17 + i, (B, SIZE, SIZE, 3))
            obj, xywh, cls = pred_fn(imgs)
            return acc + obj.astype(jnp.float32).sum() * 1e-6 \
                + xywh[0, 0, 0] * 1e-9
        return step

    chain("int8", mk(q8.predict))
    chain("bf16", mk(lambda x: net.predict(params, stats, x,
                                           dtype=jnp.bfloat16)))
    chain("f32", mk(lambda x: net.predict(params, stats, x)))


if __name__ == "__main__":
    main()

"""int8 serving measurement: trunk-only and full pipelined step vs f32/bf16.

Questions:
  1. How fast is the int8 trunk+decode (q8_predict) vs predict(f32/bf16)?
     v5e peaks 394 int8 TOPS vs ~197 bf16 TFLOPs, so the ceiling is 2x on
     the conv walk; dequant epilogues and the f32 box decode dilute that.
  2. Full pipelined serving step: q8 (today: int8 trunk + f32 tail) vs the
     bf16 path (bf16 trunk + keyed bf16 tail). If (1) wins big but (2)
     loses, the lever is emitting bf16 scores from the q8 head.

Methodology per CLAUDE.md: chained launches through a scalar accumulator,
on-device hash images keyed by the loop index, ONE float() fetch per
timing region.

Usage: python tools/exp_q8serve.py [--batch 128] [--iters 16]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--skip-full", action="store_true")
    args = ap.parse_args()

    from edgeml_tpu.models.infer import _detect_pipe_step, _zero_carry
    from edgeml_tpu.models.quant import prepare_int8, q8_predict
    from edgeml_tpu.models.yolov5 import YoloV5, calibrate_bn
    from edgeml_tpu.utils.synth import hash_uniform

    b, iters = args.batch, args.iters
    print("devices:", jax.devices(), flush=True)
    net = YoloV5(variant="n", num_classes=80, img_size=640)
    params, stats = net.init(jax.random.PRNGKey(0))
    t0 = time.perf_counter()
    stats = calibrate_bn(
        net, params, stats, lambda i: hash_uniform(9000 + i, (8, 640, 640, 3))
    )
    jax.block_until_ready(stats)
    print(f"bn calibration: {time.perf_counter() - t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    q8 = prepare_int8(
        net, params, stats,
        lambda i: hash_uniform(7000 + i, (16, 640, 640, 3)), iters=4,
    ).tree
    jax.block_until_ready(q8)
    print(f"int8 prep (calib + quant): {time.perf_counter() - t0:.1f}s",
          flush=True)

    # --- trunk+decode only -------------------------------------------------
    def bench(name, mk):
        step = jax.jit(mk)
        acc = jnp.zeros(())
        t0 = time.perf_counter()
        acc = step(acc, 0)
        float(acc)
        warm = time.perf_counter() - t0
        t0 = time.perf_counter()
        for i in range(iters):
            acc = step(acc, 1 + i)
        float(acc)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name}: warmup {warm:.1f}s, {dt * 1e3:.2f} ms/iter "
              f"-> {b / dt:.0f} img/s", flush=True)
        return dt

    def mk_predict(dt):
        def step(acc, i):
            x = hash_uniform(i, (b, 640, 640, 3))
            o, xy, c = net.predict(params, stats, x, dtype=dt)
            return acc + o.astype(jnp.float32).sum() + xy[0, 0, 0] \
                + c.astype(jnp.float32)[0, 0, 0]
        return step

    def mk_q8(acc_unused=None):
        def step(acc, i):
            x = hash_uniform(i, (b, 640, 640, 3))
            o, xy, c = q8_predict(net, q8, x)
            return acc + o.astype(jnp.float32).sum() + xy[0, 0, 0] \
                + c.astype(jnp.float32)[0, 0, 0]
        return step

    bench("trunk+decode f32", mk_predict(None))
    bench("trunk+decode bf16", mk_predict(jnp.bfloat16))
    bench("trunk+decode int8", mk_q8())

    if args.skip_full:
        return

    # --- full pipelined serving step ---------------------------------------
    meta = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]]), (b, 1))
    hw = jnp.tile(jnp.asarray([[640.0, 640.0]]), (b, 1))

    for name, dt, use_q8 in (
        ("bf16", jnp.bfloat16, False),
        ("f32", None, False),
        ("int8", None, True),
        ("int8-bf16", jnp.bfloat16, True),  # int8 trunk + keyed bf16 tail
    ):
        @jax.jit
        def step(carry, seed, dt=dt, use_q8=use_q8):
            prev, acc, nfail = carry
            imgs = hash_uniform(seed, (b, 640, 640, 3))
            nxt, d, v, ok = _detect_pipe_step(
                net, params, stats, prev, imgs, meta, hw, 1e-5, 0.6,
                dtype=dt, q8=q8 if use_q8 else None,
            )
            return (nxt, acc + d.sum(), nfail + (1 - ok.astype(jnp.int32)))

        # q8 serving keeps the decoded carry even under the raw-tail default
        zero = (_zero_carry(net, b, 640, dt, raw=False if use_q8 else None),
                jnp.zeros(()), jnp.zeros((), jnp.int32))
        t0 = time.perf_counter()
        carry = step(zero, 0)
        float(carry[1])
        print(f"full {name} warmup: {time.perf_counter() - t0:.1f}s",
              flush=True)
        t0 = time.perf_counter()
        for i in range(iters):
            carry = step(carry, 1 + i)
        float(carry[1])
        dt_s = (time.perf_counter() - t0) / iters
        print(f"full pipelined {name}: {dt_s * 1e3:.2f} ms/step -> "
              f"{b / dt_s:.0f} img/s ({int(carry[2])}/{iters} cert fails)",
              flush=True)


if __name__ == "__main__":
    main()

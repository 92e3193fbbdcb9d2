"""Feasibility: int8 MXU rate on this chip (matmul + conv), vs bf16/f32.

Methodology per CLAUDE.md: chained launches through a scalar accumulator,
inputs derived on-device from the loop index, ONE value fetch at the end.
"""

import time

import jax
import jax.numpy as jnp


def bench(name, make_step, iters=32):
    step = jax.jit(make_step)
    acc = jnp.zeros((), jnp.float32)
    t0 = time.perf_counter()
    acc = step(acc, 0)
    float(acc)
    warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(iters):
        acc = step(acc, 1 + i)
    v = float(acc)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: warmup {warm:.1f}s, {dt * 1e3:.3f} ms/iter (acc={v:.3g})")
    return dt


def main():
    print("devices:", jax.devices(), flush=True)

    # --- matmul rate: (2048, 2048) @ (2048, 2048) -----------------------
    n = 2048
    flops = 2 * n * n * n

    def mk_mm(dtype, out_dtype):
        def step(acc, i):
            a = (jnp.ones((n, n), jnp.float32) * (1.0 + i * 1e-6)).astype(dtype)
            b = (jnp.ones((n, n), jnp.float32) * 0.5).astype(dtype)
            c = jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=out_dtype,
            )
            return acc + c[0, 0].astype(jnp.float32) * 1e-9
        return step

    for name, dt_in, dt_out in (
        ("mm int8->int32", jnp.int8, jnp.int32),
        ("mm bf16->f32", jnp.bfloat16, jnp.float32),
    ):
        d = bench(name, mk_mm(dt_in, dt_out))
        print(f"    -> {flops / d / 1e12:.1f} TFLOP/s", flush=True)

    # --- conv rate: a YOLOv5n-representative layer ----------------------
    # 3x3 s1, 64->64 at 80x80, B=128 (mid-trunk shape).
    b, h, c = 128, 80, 64
    cflops = 2 * b * h * h * c * c * 9

    def mk_conv(dtype, out_dtype):
        def step(acc, i):
            x = (jnp.ones((b, h, h, c), jnp.float32) * (1 + i * 1e-6)).astype(dtype)
            w = (jnp.ones((3, 3, c, c), jnp.float32) * 0.01).astype(dtype)
            y = jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=out_dtype,
            )
            return acc + y[0, 0, 0, 0].astype(jnp.float32) * 1e-9
        return step

    for name, dt_in, dt_out in (
        ("conv int8->int32", jnp.int8, jnp.int32),
        ("conv bf16->f32", jnp.bfloat16, jnp.float32),
    ):
        try:
            d = bench(name, mk_conv(dt_in, dt_out))
            print(f"    -> {cflops / d / 1e12:.1f} TFLOP/s", flush=True)
        except Exception as e:
            print(f"{name}: FAILED: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()

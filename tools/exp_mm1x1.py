"""Block-diagonal 1x1-conv hypothesis test (trunk-MFU lever candidate).

YOLOv5n's 1x1 convs have C_in/C_out of 16-64: under a naive MXU tiling
model a (rows, 16) @ (16, 16) implicit GEMM uses 16/128 of the lane dim
AND 16/128 of the contraction depth (~1/64 of peak). Merging bl adjacent
W-pixels into the channel dim is a pure minor-dims RESHAPE (no transpose,
unlike the measured-negative conv2d_s2d_k3s2): (B, H, W, C) ->
(B, H, W/bl, bl*C), with the weights expanded block-diagonally to
(1, 1, bl*C, bl*Cout). The zero blocks contribute exact zeros (f32
accumulation of bf16 products; adding 0 is exact at any order), so the
result is a bit-exact reshape of the baseline. bl x more FLOPs, but up to
bl^2 better MXU tile occupancy.

Arms (B=128 bf16, l2-scale 160x160, INNER chained reps inside one jit):
  a  1x1 16->16 conv baseline
  b  1x1 16->16 blocked bl=4   (64 x 64)
  c  1x1 16->16 blocked bl=8   (128 x 128)
  d  1x1 16->16 as flat dot_general (control: conv-vs-dot lowering)
  e  3x3 16->16 conv (C3 bottleneck cv2 — stage budget reference)
  f  chain 1x1 32->16 then 3x3 16->16 (baseline)
  g  chain with the 1x1 blocked bl=8 + reshape back (does the relayout
     break fusion like the s2d downsampler did?)
  h  1x1 64->32 @80x80 baseline   (l4 cv1 shape)
  i  1x1 64->32 @80x80 blocked bl=4
Chained launches through a scalar accumulator, one float() fetch per arm
(CLAUDE.md measurement rules).

    python tools/exp_mm1x1.py [B] [iters] [inner]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

from edgeml_tpu.models.common import conv2d
from edgeml_tpu.utils.synth import hash_uniform

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 8
INNER = int(sys.argv[3]) if len(sys.argv) > 3 else 16
DT = jnp.bfloat16

rng = np.random.default_rng(0)


def mk_w(k, cin, cout):
    return jnp.asarray(
        rng.normal(0, 0.1, (k, k, cin, cout)).astype(np.float32)
    ).astype(DT)


def block_diag_w(w, bl):
    """(1,1,C,Co) -> (1,1,bl*C, bl*Co) block-diagonal."""
    c, co = w.shape[2], w.shape[3]
    out = jnp.zeros((1, 1, bl * c, bl * co), w.dtype)
    for j in range(bl):
        out = out.at[:, :, j * c : (j + 1) * c, j * co : (j + 1) * co].set(w)
    return out


def blocked_1x1(x, wbd, bl, cout):
    b, h, w, c = x.shape
    y = conv2d(x.reshape(b, h, w // bl, bl * c), wbd, 1)
    return y.reshape(b, h, w, cout)


W16 = mk_w(1, 16, 16)
W16_3 = mk_w(3, 16, 16)
W32_16 = mk_w(1, 32, 16)
W64_32 = mk_w(1, 64, 32)

ARMS = {}


def arm(name, shape, fn):
    ARMS[name] = (shape, fn)


arm("a 1x1 16-16 conv", (160, 160, 16), lambda x: conv2d(x, W16, 1))
arm(
    "b 1x1 16-16 bl=4",
    (160, 160, 16),
    lambda x, w=block_diag_w(W16, 4): blocked_1x1(x, w, 4, 16),
)
arm(
    "c 1x1 16-16 bl=8",
    (160, 160, 16),
    lambda x, w=block_diag_w(W16, 8): blocked_1x1(x, w, 8, 16),
)


def flat_dot(x):
    b, h, w, c = x.shape
    y = jax.lax.dot_general(
        x.reshape(-1, c), W16[0, 0], (((1,), (0,)), ((), ())),
        preferred_element_type=DT,
    )
    return y.reshape(b, h, w, -1)


arm("d 1x1 16-16 dot", (160, 160, 16), flat_dot)
arm("e 3x3 16-16 conv", (160, 160, 16), lambda x: conv2d(x, W16_3, 1))
arm(
    "f chain base",
    (160, 160, 32),
    lambda x: conv2d(conv2d(x, W32_16, 1), W16_3, 1),
)
arm(
    "g chain bl=8",
    (160, 160, 32),
    lambda x, w=block_diag_w(W32_16, 8): conv2d(
        blocked_1x1(x, w, 8, 16), W16_3, 1
    ),
)
arm("h 1x1 64-32 conv", (80, 80, 64), lambda x: conv2d(x, W64_32, 1))
arm(
    "i 1x1 64-32 bl=4",
    (80, 80, 64),
    lambda x, w=block_diag_w(W64_32, 4): blocked_1x1(x, w, 4, 32),
)

# correctness gate (cheap, on whatever backend runs first). The zero
# blocks contribute exact zeros, but conv reduction ORDER is backend/
# shape-dependent, so allow ~1 bf16 ulp (CPU measured 1 ulp at 160^2;
# report the on-chip value for the record).
xx = hash_uniform(7, (2, 160, 160, 16)).astype(DT)
base = conv2d(xx, W16, 1).astype(jnp.float32)
for nm in ("b 1x1 16-16 bl=4", "c 1x1 16-16 bl=8"):
    alt = ARMS[nm][1](xx).astype(jnp.float32)
    md = float(jnp.abs(base - alt).max())
    assert md <= 2e-3 * float(jnp.abs(base).max()), (nm, md)
    print(f"{nm}: maxdiff vs baseline {md:.2e}", flush=True)

arm("z gen+sum only", (160, 160, 16), lambda x: x)

for name, (shape, fn) in ARMS.items():
    h, w, c = shape

    @jax.jit
    def step(acc, seed):
        # one generation per launch; per-rep scalar scale keeps the conv
        # live (not hoisted) while the input stream stays the cheap,
        # arm-invariant cost (subtract the "z" identity arm for net time)
        x0 = hash_uniform(seed, (B, h, w, c)).astype(DT)

        def body(i, a):
            x = x0 * (1.0 + i.astype(DT) * DT(1e-6))
            y = fn(x)
            return a + y.astype(jnp.float32).sum() * 1e-9

        return jax.lax.fori_loop(0, INNER, body, acc)

    t0 = time.perf_counter()
    acc = step(jnp.zeros(()), 0)
    float(acc)
    wu = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(ITERS):
        acc = step(acc, 1 + i)
    acc = float(acc)
    el = time.perf_counter() - t0
    per = el / (ITERS * INNER) * 1e6
    print(
        f"{name:20s}: {per:9.1f} us/op  (warmup {wu:.1f}s, acc {acc:.2f})",
        flush=True,
    )

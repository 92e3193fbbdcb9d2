"""Pallas TPU row-gather kernel — kept as a NEGATIVE RESULT (do not ship).

Hypothesis: XLA's TPU gather moves ~1 element/cycle (serial), so staging the
source in VMEM and copying whole (1, C) rows should be ~C times faster.
Measured reality (v5e, tools/exp_gather6.py, in-context after the YOLOv5
trunk at B=128): this kernel is ~2.3x SLOWER than XLA's gather — Mosaic
lowers dynamic-sublane reads at ~100+ cycles each, and dynamic LANE indexing
does not lower at all (the scale lookup needs a masked 128-lane reduction).

The kernel is exact (bit-identical to jnp row gathers, CPU interpret tests
below) and demonstrates scalar-prefetch-driven chunked gathering; it stays in
tools/ as provenance for the CLAUDE.md cost-model note. The production NMS
tail keeps plain narrow XLA gathers (ops/nms.py _gather_rows).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Per-block VMEM budget (bytes). Blocks are double-buffered by the
# pipeline, and the output block plus the scale chunk also live in VMEM,
# so stay well under half the ~16 MB VMEM.
_BLOCK_BYTES = 7 * 2 ** 20
_UNROLL = 8


def _gather_kernel(idx_ref, src_ref, out_ref, *, chunk, scaled, unroll):
    bi = pl.program_id(0)
    c = pl.program_id(1)
    k = out_ref.shape[0]
    lo = c * chunk
    nchunks = pl.num_programs(1)

    if scaled:
        src_ref, scale_ref = src_ref

    def copy(j):
        i = idx_ref[bi, j] - lo

        def do():
            row = src_ref[i, :]
            if scaled:
                # dynamic lane indexing is not lowerable; select the lane
                # from the 128-wide row with a masked reduction instead
                lanes = scale_ref[pl.ds(i // 128, 1), :]
                lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
                s = jnp.sum(jnp.where(lane == i % 128, lanes, 0))
                row = row * s
            out_ref[j, :] = row

        if nchunks == 1:
            do()
        else:
            pl.when((i >= 0) & (i < chunk))(do)

    def body(j, _):
        for u in range(unroll):
            copy(j * unroll + u)
        return 0

    jax.lax.fori_loop(0, k // unroll, body, 0)
    for j in range(k - k % unroll, k):
        copy(j)


def _kernel_plain(idx_ref, src_ref, out_ref, *, chunk, unroll):
    _gather_kernel(idx_ref, src_ref, out_ref, chunk=chunk, scaled=False,
                   unroll=unroll)


def _kernel_scaled(idx_ref, src_ref, scale_ref, out_ref, *, chunk, unroll):
    _gather_kernel(idx_ref, (src_ref, scale_ref), out_ref, chunk=chunk,
                   scaled=True, unroll=unroll)


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_rows(src: jax.Array, idx: jax.Array, scale: jax.Array | None = None,
                *, interpret: bool | None = None) -> jax.Array:
    """out[b, j, :] = src[b, idx[b, j], :] (* scale[b, idx[b, j]]).

    :param src: (B, N, C) source rows.
    :param idx: (B, K) int32 row indices in [0, N).
    :param scale: optional (B, N); fused per-row multiplier.
    :return: (B, K, C), dtype = src (promoted with scale when given).
    """
    b, n, ch = src.shape
    k = idx.shape[1]
    row_bytes = max(-(-ch // 128) * 128, 128) * src.dtype.itemsize
    nchunks = max(1, -(-(n * row_bytes) // _BLOCK_BYTES))
    # 1024-aligned chunks satisfy every dtype's sublane rule for the 2-D
    # source block AND the (8, 128) rule for the scale viewed as
    # (chunk // 128, 128) lanes.
    chunk = -(-(-(-n // nchunks)) // 1024) * 1024
    nchunks = -(-n // chunk)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    out_dtype = src.dtype if scale is None else jnp.promote_types(
        src.dtype, scale.dtype)
    src = src.astype(out_dtype)

    in_specs = [
        pl.BlockSpec((None, chunk, ch), lambda bi, ci, idx_ref: (bi, ci, 0)),
    ]
    args = [src]
    if scale is not None:
        # (B, N) 1-D-per-image blocks violate the (8, 128) block-shape rule;
        # fold the row axis into (rows, 128) lanes instead.
        np_pad = nchunks * chunk
        scale = scale.astype(out_dtype)
        if np_pad != n:
            scale = jnp.pad(scale, ((0, 0), (0, np_pad - n)))
        scale = scale.reshape(b, np_pad // 128, 128)
        in_specs.append(
            pl.BlockSpec(
                (None, chunk // 128, 128),
                lambda bi, ci, idx_ref: (bi, ci, 0),
            )
        )
        args.append(scale)
        kern = functools.partial(_kernel_scaled, chunk=chunk, unroll=_UNROLL)
    else:
        kern = functools.partial(_kernel_plain, chunk=chunk, unroll=_UNROLL)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, nchunks),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((None, k, ch), lambda bi, ci, idx_ref: (bi, 0, 0)),
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, k, ch), out_dtype),
        interpret=interpret,
    )(idx.astype(jnp.int32), *args)

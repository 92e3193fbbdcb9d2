"""Fused greedy-NMS suppression kernel (Pallas, TPU).

The XLA fixpoint formulation (ops/nms.py greedy_keep_mask) is exact and
batch-friendly, but inside the production serving program its (K, K) IoU /
suppression intermediates cost ~7.7 ms per 128-image batch (measured,
tools/exp_ablate3.py) while the same math standalone costs ~1 ms — the gap
is HBM materialization and scheduling, not FLOPs. This kernel computes the
whole thing per image inside VMEM:

  * builds the transposed suppression matrix supT[j, i] = (iou(j, i) >
    thres) & (j < i) tile-by-tile from split coordinate vectors (f32 ops,
    identical arithmetic to greedy_keep_mask, division included);
  * runs the fixpoint kept <- valid & (kept @ supT == 0) as (1, K) x (K, K)
    MXU matvecs against the VMEM-resident matrix until convergence;
  * writes only the (1, K) survivor mask back to HBM.

HBM traffic per image: ~24 KB in, 4 KB out (vs ~100+ MB of intermediates in
the unfused build). Replaces the reference's torchvision/ultralytics C++ NMS
(SURVEY.md native-code ledger item 2) as the hot-path suppressor; the XLA
formulation stays as the CPU path and cross-check oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.custom_partitioning import custom_partitioning
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import NamedSharding, PartitionSpec as P


def _kernel(off_ref, offt_ref, valid_ref, out_ref, sup_ref, *, iou_thres, tj):
    # Mosaic note: (1, K) boolean vectors fail relayout ("non-singleton
    # logical dimension is replicated"), so everything row-vector-shaped here
    # is arithmetic f32/bf16 0/1 — validity precomputed outside, keep-flag
    # via 1 - min(hit, 1), convergence via a sum.
    k = off_ref.shape[0]
    x1r = offt_ref[0:1, :]  # (1, K) row coordinate vectors
    y1r = offt_ref[1:2, :]
    x2r = offt_ref[2:3, :]
    y2r = offt_ref[3:4, :]
    area_r = jnp.maximum(x2r - x1r, 0.0) * jnp.maximum(y2r - y1r, 0.0)
    for t in range(k // tj):
        s = slice(t * tj, (t + 1) * tj)
        x1c = off_ref[s, 0:1]  # (TJ, 1) column vectors
        y1c = off_ref[s, 1:2]
        x2c = off_ref[s, 2:3]
        y2c = off_ref[s, 3:4]
        ix = jnp.minimum(x2c, x2r) - jnp.maximum(x1c, x1r)  # (TJ, K)
        iy = jnp.minimum(y2c, y2r) - jnp.maximum(y1c, y1r)
        inter = jnp.maximum(ix, 0.0) * jnp.maximum(iy, 0.0)
        area_c = jnp.maximum(x2c - x1c, 0.0) * jnp.maximum(y2c - y1c, 0.0)
        iou = inter / jnp.maximum(area_c + area_r - inter, 1e-12)
        jidx = jax.lax.broadcasted_iota(jnp.int32, (tj, k), 0) + t * tj
        iidx = jax.lax.broadcasted_iota(jnp.int32, (tj, k), 1)
        sup_ref[s, :] = jnp.where(
            (iou > iou_thres) & (jidx < iidx), 1.0, 0.0
        ).astype(jnp.bfloat16)
    valid = valid_ref[:].astype(jnp.bfloat16)  # (1, K) 0/1

    def cond(c):
        return c[1] > 0.0

    def body(c):
        kept, _ = c
        # (1, K) x (K, K) MXU matvec; 0/1 bf16 operands, f32 accumulation —
        # suppressor counts are exact integers.
        hit = jnp.dot(kept, sup_ref[:], preferred_element_type=jnp.float32)
        keep_flag = 1.0 - jnp.minimum(hit, 1.0)  # 1 iff no kept suppressor
        new = valid * keep_flag.astype(jnp.bfloat16)
        changed = jnp.sum((new - kept).astype(jnp.float32) ** 2)
        return new, changed

    kept, _ = jax.lax.while_loop(cond, body, (valid, jnp.float32(1.0)))
    out_ref[:] = kept.astype(jnp.float32)


def _kernel_blocked(off_ref, offt_ref, valid_ref, out_ref, rows_ref,
                    kept_ref, *, iou_thres, blk, tj):
    """Blocked-greedy fused suppressor (K > 1024): the NMS_BLOCK math
    (ops/nms.py greedy_keep_mask, blocked branch) inside one kernel. The
    full (K, K) suppression matrix NEVER materializes — VMEM holds one
    (blk, K) row-block at a time, built tile-by-tile, used for (a) the
    decided-prefix hit matvec and (b) the in-block (blk, blk) fixpoint —
    so both the 16 MB scoped-vmem ceiling and the monolithic-K=2048
    program shape (the remote-compiler crash repro) disappear. Math is
    op-identical to the blocked XLA formulation => bit-identical keeps."""
    k = off_ref.shape[0]
    x1r = offt_ref[0:1, :]  # (1, K) row coordinate vectors
    y1r = offt_ref[1:2, :]
    x2r = offt_ref[2:3, :]
    y2r = offt_ref[3:4, :]
    area_r = jnp.maximum(x2r - x1r, 0.0) * jnp.maximum(y2r - y1r, 0.0)
    valid = valid_ref[:].astype(jnp.bfloat16)  # (1, K) 0/1
    # kept lives in a VMEM scratch written with STATIC slices per block —
    # value-side dynamic_update_slice does not lower on real TPUs (Mosaic
    # NotImplementedError, r5f), while static ref stores do.
    kept_ref[:] = jnp.zeros((1, k), jnp.bfloat16)
    for t in range(k // blk):
        # build this block's sup rows: rows[j, i] = iou(bj, i) & (i < bj),
        # global row index bj = t*blk + j (j suppressed-by i)
        for u in range(blk // tj):
            s = slice(t * blk + u * tj, t * blk + (u + 1) * tj)
            x1c = off_ref[s, 0:1]  # (TJ, 1) column vectors
            y1c = off_ref[s, 1:2]
            x2c = off_ref[s, 2:3]
            y2c = off_ref[s, 3:4]
            ix = jnp.minimum(x2c, x2r) - jnp.maximum(x1c, x1r)  # (TJ, K)
            iy = jnp.minimum(y2c, y2r) - jnp.maximum(y1c, y1r)
            inter = jnp.maximum(ix, 0.0) * jnp.maximum(iy, 0.0)
            area_c = jnp.maximum(x2c - x1c, 0.0) * jnp.maximum(y2c - y1c, 0.0)
            iou = inter / jnp.maximum(area_c + area_r - inter, 1e-12)
            jidx = (jax.lax.broadcasted_iota(jnp.int32, (tj, k), 0)
                    + t * blk + u * tj)
            iidx = jax.lax.broadcasted_iota(jnp.int32, (tj, k), 1)
            rows_ref[u * tj:(u + 1) * tj, :] = jnp.where(
                (iou > iou_thres) & (iidx < jidx), 1.0, 0.0
            ).astype(jnp.bfloat16)
        # decided-prefix hits: kept (1, K) . rows (blk, K) over K -> (1, blk)
        # (undecided/later entries of kept are 0, in-block cols masked by
        # iidx < jidx only count in-block EARLIER rows — still 0 in kept)
        hit_prev = jax.lax.dot_general(
            kept_ref[:], rows_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (1, blk)
        vb = valid[0:1, t * blk:(t + 1) * blk]
        free = vb * (1.0 - jnp.minimum(hit_prev, 1.0)).astype(jnp.bfloat16)
        tile = rows_ref[:, t * blk:(t + 1) * blk]  # (blk_j, blk_i)

        def cond(c):
            return c[1] > 0.0

        def body(c):
            kb, _ = c
            hit = jax.lax.dot_general(
                kb, tile, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            new = free * (1.0 - jnp.minimum(hit, 1.0)).astype(jnp.bfloat16)
            changed = jnp.sum((new - kb).astype(jnp.float32) ** 2)
            return new, changed

        kb, _ = jax.lax.while_loop(cond, body, (free, jnp.float32(1.0)))
        kept_ref[0:1, t * blk:(t + 1) * blk] = kb
    out_ref[:] = kept_ref[:].astype(jnp.float32)


def _pallas_call(off, offt, sc, iou_thres: float, interpret: bool):
    """The raw kernel launch on whatever (local) batch it is handed."""
    b, k, _ = off.shape
    if k > 1024:
        # Blocked-greedy kernel: no (K, K) scratch (the monolithic K=2048
        # program crashed the axon remote compiler at every tj in
        # {64, 128, 256, 512}, HTTP 500 in ~3 s, round 4; before that
        # tj=256 exceeded the 16 MB scoped-vmem budget at 16.52 MB).
        blk = 256
        kern = functools.partial(
            _kernel_blocked, iou_thres=float(iou_thres), blk=blk, tj=128
        )
        scratch = [pltpu.VMEM((blk, k), jnp.bfloat16),
                   pltpu.VMEM((1, k), jnp.bfloat16)]
    else:
        # monolithic kernel, tj=256 — the measured-fast tile at K<=1024
        kern = functools.partial(_kernel, iou_thres=float(iou_thres), tj=256)
        scratch = [pltpu.VMEM((k, k), jnp.bfloat16)]
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((None, k, 4), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 4, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, 1, k), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1, k), jnp.float32),
        scratch_shapes=scratch,
        interpret=interpret,
    )(off, offt, sc)


@functools.lru_cache(maxsize=None)
def _fused_partitioned(iou_thres: float, interpret: bool):
    """custom_partitioning wrapper: Mosaic custom calls have no automatic
    SPMD partitioning rule, so without this a data-parallel mesh serving
    program (models/infer.py run_detection(mesh=...)) could not shard the
    suppressor over the batch axis. The kernel is embarrassingly parallel
    over images (grid=(B,)), so the rule is: batch dim passes through,
    every other dim must be replicated; per-shard lowering is the same
    pallas_call on the local batch."""

    f = custom_partitioning(
        lambda off, offt, sc: _pallas_call(off, offt, sc, iou_thres, interpret)
    )

    def _bspec(arg_shapes):
        spec = arg_shapes[0].sharding.spec
        return spec[0] if len(spec) else None

    def infer(mesh, arg_shapes, result_shape):
        return NamedSharding(mesh, P(_bspec(arg_shapes), None, None))

    def partition(mesh, arg_shapes, result_shape):
        b = _bspec(arg_shapes)
        arg_sh = tuple(NamedSharding(mesh, P(b, None, None)) for _ in arg_shapes)
        out_sh = NamedSharding(mesh, P(b, None, None))

        def lower_fn(off, offt, sc):
            return _pallas_call(off, offt, sc, iou_thres, interpret)

        return mesh, lower_fn, out_sh, arg_sh

    f.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        # batch factor `b` shards; everything else is VMEM-local per image.
        sharding_rule="b k f, b f2 k2, b one k3 -> b one2 k4",
        need_replication_factors=(
            "k", "f", "f2", "k2", "one", "k3", "one2", "k4"
        ),
    )
    return f


@functools.partial(jax.jit, static_argnames=("iou_thres", "interpret"))
def greedy_keep_mask_fused(boxes: jax.Array, scores: jax.Array,
                           iou_thres: float,
                           interpret: bool = False) -> jax.Array:
    """Batched fused greedy-NMS survivor masks.

    :param boxes: (B, K, 4) xyxy (class offsets already applied), each image
        sorted by DESCENDING score; K must be a multiple of 256. K <= 1024
        runs the monolithic VMEM kernel; larger K the blocked-greedy kernel
        (_kernel_blocked — no (K, K) scratch, full matrix streamed once).
    :param scores: (B, K); entries <= 0 never participate.
    :param interpret: run the kernel in the Pallas interpreter (CPU tests).
    :return: (B, K) bool — identical to vmap(greedy_keep_mask).

    Safe under a data-parallel mesh: the launch goes through a
    custom_partitioning rule that shards the image axis and keeps each
    image's (K, K) suppression problem device-local (no collectives).
    """
    b, k, _ = boxes.shape
    assert k % 256 == 0, k
    off = boxes.astype(jnp.float32)
    offt = jnp.swapaxes(off, 1, 2)  # (B, 4, K)
    sc = jnp.where(scores > 0, 1.0, 0.0).astype(jnp.float32)[:, None, :]
    if jax.device_count() > 1:
        out = _fused_partitioned(float(iou_thres), interpret)(off, offt, sc)
    else:
        # single chip: nothing to partition — keep the raw launch on the
        # measured hot path
        out = _pallas_call(off, offt, sc, float(iou_thres), interpret)
    return out[:, 0, :] > 0.0

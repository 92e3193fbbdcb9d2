"""Pallas TPU kernel: fused sequential greedy NMS (cross-check oracle).

Keeps the whole candidate set resident in VMEM — scores, the four box
planes, and the alive mask never leave the chip — and runs the literal
select-max / suppress loop of max_det steps on the VPU. One kernel
invocation per image; vmap over the batch.

Production NMS now lives in ops/nms.py (greedy_keep_mask): the fixpoint
formulation converges to the same greedy result in a handful of (K, K)
matvecs instead of max_det serial steps, so this kernel's role is an
independent sequential implementation that tests compare against
(tests/test_nms_pallas.py).

Falls back to interpreter mode off-TPU (tests run on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .nms import MAX_WH


def _nms_kernel(boxes_ref, scores_ref, out_ref, kept_ref, alive_ref, *, iou_thres: float, max_det: int):
    # boxes_ref: (8, K) f32 — rows [x1, y1, x2, y2, area, pad, pad, pad],
    #            already class-offset. scores_ref: (8, K) with row 0 live.
    # out_ref: (max_det, 8) — [x1, y1, x2, y2, score, pad, pad, pad].
    # All candidate planes stay VMEM-resident across the whole loop; the
    # argmax element is extracted with masked reductions (Mosaic has no
    # dynamic_slice on values).
    k = boxes_ref.shape[1]
    x1 = boxes_ref[0:1, :]
    y1 = boxes_ref[1:2, :]
    x2 = boxes_ref[2:3, :]
    y2 = boxes_ref[3:4, :]
    area = boxes_ref[4:5, :]
    scores = scores_ref[0:1, :]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)
    alive_ref[:] = (scores > 0.0).astype(jnp.float32)
    kept_ref[:] = jnp.zeros_like(kept_ref)

    def body(i, _):
        alive = alive_ref[:] > 0.0
        s = jnp.where(alive, scores, -jnp.inf)
        m = jnp.max(s)
        j = jnp.argmax(s.reshape(1, k), axis=1)[0]
        ok = m > 0.0
        okf = ok.astype(jnp.float32)
        hit = (lane == j).astype(jnp.float32)  # one-hot over lanes

        def at_j(plane):
            return jnp.sum(plane * hit)

        bx1, by1 = at_j(x1), at_j(y1)
        bx2, by2 = at_j(x2), at_j(y2)
        barea = at_j(area)
        zero = m * 0.0
        row = jnp.stack([bx1, by1, bx2, by2, m, zero, zero, zero]) * okf
        out_ref[pl.ds(i, 1), :] = row[None, :]
        kept_ref[:] = kept_ref[:] + hit * okf
        ix1 = jnp.maximum(bx1, x1)
        iy1 = jnp.maximum(by1, y1)
        ix2 = jnp.minimum(bx2, x2)
        iy2 = jnp.minimum(by2, y2)
        inter = jnp.maximum(ix2 - ix1, 0.0) * jnp.maximum(iy2 - iy1, 0.0)
        iou = inter / jnp.maximum(barea + area - inter, 1e-12)
        alive_ref[:] = (alive & (iou <= iou_thres) & ok).astype(jnp.float32)
        return 0

    jax.lax.fori_loop(0, max_det, body, 0)


@functools.partial(jax.custom_jvp, nondiff_argnums=(2, 3))
def _suppress(planes, srow, iou_thres: float, max_det: int):
    """Run the fused kernel. planes: (8, K) box rows; srow: (8, K) score row.
    Returns (out (max_det, 8), kept (1, K) 0/1 mask of surviving rows)."""
    k = planes.shape[1]
    kernel = functools.partial(
        _nms_kernel, iou_thres=float(iou_thres), max_det=int(max_det)
    )
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((max_det, 8), jnp.float32),
            jax.ShapeDtypeStruct((1, k), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((1, k), jnp.float32)],
        interpret=jax.default_backend() != "tpu",
    )(planes, srow)


@_suppress.defjvp
def _suppress_jvp(iou_thres, max_det, primals, tangents):
    # Selection/suppression is piecewise constant in its inputs: the correct
    # tangent is zero (this also keeps pallas_call out of JVP tracing when
    # the surrounding loss graph is differentiated).
    out = _suppress(*primals, iou_thres, max_det)
    return out, jax.tree_util.tree_map(jnp.zeros_like, out)


def suppress_mask(boxes: jax.Array, scores: jax.Array,
                  iou_thres: float, max_keep: int):
    """Greedy-NMS survivors as a (K,) bool mask (RPN proposal filtering).

    boxes: (K, 4) xyxy (already class-offset if needed); scores: (K,), only
    entries > 0 participate.
    """
    k = boxes.shape[0]
    area = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    planes = jnp.zeros((8, k), jnp.float32)
    planes = planes.at[0:4, :].set(boxes.T)
    planes = planes.at[4, :].set(area)
    srow = jnp.zeros((8, k), jnp.float32).at[0, :].set(
        jnp.where(scores > 0, scores, -1.0)
    )
    _, kept = _suppress(planes, srow, float(iou_thres), int(max_keep))
    return kept[0] > 0.0


@functools.partial(jax.jit, static_argnames=("max_det", "iou_thres"))
def nms_pallas(boxes: jax.Array, scores: jax.Array, cls_ids: jax.Array,
               iou_thres: float = 0.5, max_det: int = 300):
    """Greedy class-aware NMS on pre-scored rows via the fused Pallas kernel.

    :param boxes: (K, 4) xyxy; scores: (K,) (entries <= 0 ignored);
        cls_ids: (K,) float class ids.
    :return: (dets (max_det, 6) [x1, y1, x2, y2, score, cls], valid) —
        same contract as ops.nms.nms_rows.
    """
    k = boxes.shape[0]
    off = boxes + cls_ids[:, None] * MAX_WH
    area = (off[:, 2] - off[:, 0]) * (off[:, 3] - off[:, 1])
    planes = jnp.zeros((8, k), jnp.float32)
    planes = planes.at[0:4, :].set(off.T)
    planes = planes.at[4, :].set(area)
    srow = jnp.zeros((8, k), jnp.float32).at[0, :].set(
        jnp.where(scores > 0, scores, -1.0)
    )

    out, _ = _suppress(planes, srow, float(iou_thres), int(max_det))

    # Undo the class offset and recover the class id from the offset box.
    sel = out[:, 4] > 0.0
    cls = jnp.where(sel, jnp.floor(out[:, 0] / MAX_WH + 1e-6), 0.0)
    cls = jnp.clip(cls, 0.0, None)
    dets = jnp.stack(
        [
            out[:, 0] - cls * MAX_WH,
            out[:, 1] - cls * MAX_WH,
            out[:, 2] - cls * MAX_WH,
            out[:, 3] - cls * MAX_WH,
            out[:, 4],
            cls,
        ],
        axis=1,
    )
    dets = jnp.where(sel[:, None], dets, 0.0)
    return dets, sel

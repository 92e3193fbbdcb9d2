"""Raw-logit serving tail: NMS pair selection directly on raw head outputs.

The decoded tail (ops/nms.py nms_split_batch) consumes fully materialized
(obj, xywh, cls) matrices: the trunk sigmoids the whole (B, N, nc) class
matrix and decodes all N boxes to f32 pixels, although the pair pool only
ever reads the top PAIR_G rows per image. sigmoid is strictly monotone —
and rounding preserves order, so max_c round(sigmoid(l_c)) ==
round(sigmoid(max_c l_c)) — which means every ranking and gating decision
can run on raw logits plus per-ROW reductions, deferring the
transcendentals and the f32 box decode to the g gathered rows
(g*(nc+4) elements per image, ~nothing). f32 detections are bit-identical
to the decoded path — the same ops applied to the same values, just to far
fewer of them. bf16 detections keep exact selection/scores/classes, with
box coordinates subject to ~1e-6 normalized drift: XLA's bf16 conv output
rounding is consumer-dependent (a conv feeding astype(f32) and the same
conv consumed as bf16 can lower with different accumulation rounding), so
cross-PROGRAM bit-equality of bf16 box logits is not an XLA guarantee —
within the bf16 serving mode's documented no-exactness contract.
tests/test_nms_raw.py pins both contracts through the full batched entry
points.

TPU economics (CLAUDE.md cost model):
  * the serving step drops the full-matrix sigmoid over (B, N, nc) and the
    (B, N, 4) f32 box-decode arithmetic + HBM write;
  * the bf16 row gather becomes ONE one-hot MXU matmul streaming the
    concatenated [cls | obj | xy | wh] (N, nc+5) payload — raw xy/wh are
    bf16 conv outputs (the f32 cast + bias happen per gathered row), and a
    one-hot matmul passes bf16 payloads through DEFAULT-precision operand
    rounding losslessly, so the separate narrow f32 box gathers of the
    decoded path (which MUST keep boxes f32) disappear;
  * per-row geometry (grid cell, stride, anchor, head bias) is recomputed
    from the flat row index with a handful of (g,)-sized integer ops — no
    (N, k) geometry matrix is ever gathered.

Geometry pytree (yolov5.YoloV5.raw_geometry): (starts (L+1,) i32 cumulative
row offsets per level, widths (L,) i32, strides (L,) f32, table (L*na, 6)
f32 rows [bias_x, bias_y, bias_w, bias_h, anchor_w, anchor_h]).

Reference parity: tail semantics (confidence gating, multi-label pairs,
class-aware greedy suppression) are unchanged — ops/nms.py module docstring
maps them to the reference's torchvision/ultralytics NMS (SURVEY.md
native-code ledger item 2)."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import nms as _nms


def decode_rows(geo, idx, xy_g, wh_g):
    """Decode g gathered raw xy/wh rows to pixel xywh-center f32 boxes.

    Bit-identical to yolov5.decode_level_split's full-matrix decode for the
    same rows: the raw values are cast to f32 and biased exactly as predict
    does full-matrix (conv output -> astype(f32) -> + f32 bias), then the
    same sigmoid/affine ops run in the same order. Geometry comes from the
    flat row index: level by comparing against the cumulative starts, then
    cell = within // na, anchor = within % na, gx = cell % W, gy = cell // W
    (the row order of decode_level_split's (b, H, W, na, ..) reshapes)."""
    starts, widths, strides, table = geo
    na = table.shape[0] // widths.shape[0]
    lvl = jnp.sum(idx[:, None] >= starts[None, 1:], axis=1).astype(jnp.int32)
    within = idx - starts[lvl]
    a = within % na
    cell = within // na
    w = widths[lvl]
    gxy = jnp.stack(
        [(cell % w).astype(jnp.float32), (cell // w).astype(jnp.float32)], -1
    )
    tb = table[lvl * na + a]  # (g, 6) — a 6-wide gather of g rows, ~nothing
    sxy = jax.nn.sigmoid(xy_g.astype(jnp.float32) + tb[:, 0:2])
    xy = (sxy * 2.0 - 0.5 + gxy) * strides[lvl][:, None]
    swh = jax.nn.sigmoid(wh_g.astype(jnp.float32) + tb[:, 2:4])
    wh = (swh * 2.0) ** 2 * tb[:, 4:6]
    return jnp.concatenate([xy, wh], -1)


def decode_full(geo, raw):
    """Materialize the decoded-path (obj, xywh, cls) from a raw-tail batch
    (the exact-fallback / host-redo path — full-matrix work is fine there).
    Values are bit-identical to YoloV5.predict on the same inputs."""
    _score, obj_s, xy_raw, wh_raw, cls_raw = raw
    n = obj_s.shape[-1]
    idx = jax.lax.iota(jnp.int32, n)
    xywh = jax.vmap(lambda x2, w2: decode_rows(geo, idx, x2, w2))(
        xy_raw, wh_raw
    )
    return obj_s, xywh, jax.nn.sigmoid(cls_raw)


RAW_GATHER = "concat"
"""bf16 one-hot gather layout, read at trace time (results identical):
  "concat"  one matmul over the concatenated (N, nc+5) payload;
  "split"   two matmuls sharing the one-hot (cls streams directly, the 5
            narrow columns ride a tiny second operand) — r4f measured it
            ~1.2 ms/128-batch WORSE than concat (the one-hot apparently
            materializes once per matmul instead of fusing twice);
  "narrow"  one-hot matmul for cls only; obj/xy/wh take narrow dynamic
            gathers (5 elements/row);
  "blocked" two-level one-hot: the flat index splits into (block, offset)
            with block size GATHER_BLOCK; a (g, N/blk) one-hot matmul
            against the payload reshaped (N/blk, blk*(nc+5)) pulls each
            candidate's whole block, then a per-row (g, blk) one-hot
            batched contraction picks the offset. Bit-identical to
            "concat" (both levels are single-nonzero 0/1 contractions).
            MEASURED NEGATIVE (r5b exp_gblock, 128x16 bf16): concat
            22.5-22.6 ms vs blocked 26.2/26.9/27.7/29.1 at blk=8/16/32/64
            — the (g, N) one-hot never materializes (XLA fuses the
            iota-compare into the matmul), so blocking only adds a second
            contraction. Kept for operand-pressure regimes (huge nc).
A/B: tools/exp_rawgather.py, tools/exp_gblock.py."""

GATHER_BLOCK = 16
"""Block size for RAW_GATHER="blocked" (trace-time; see the negative
measurement above — 8 was the least-bad of 8/16/32/64)."""


def _gather_rows_raw(box_pre, obj_s, xy, wh, cls):
    """Gather the prefiltered boxes' raw rows. bf16: one-hot MXU matmul(s)
    — every component is bf16, so DEFAULT-precision operand rounding is a
    lossless pass-through (single nonzero per one-hot row; f32 accumulate
    of one product); layout per RAW_GATHER. f32 keeps narrow dynamic
    gathers (matmul rounding would corrupt f32 payloads — CLAUDE.md).
    Returns (cls_g (g, nc), obj_g (g,), xy_g (g, 2), wh_g (g, 2))."""
    if (
        _nms._GATHER_ONEHOT
        and cls.dtype == jnp.bfloat16
        and obj_s.dtype == cls.dtype
        and xy.dtype == cls.dtype
        and wh.dtype == cls.dtype
    ):
        n, nc = cls.shape
        oh = (box_pre[:, None] == jax.lax.iota(jnp.int32, n)[None, :]).astype(
            cls.dtype
        )

        def mm(mat):
            return jax.lax.dot_general(
                oh, mat, (((1,), (0,)), ((), ())),
                preferred_element_type=cls.dtype,
            )

        if RAW_GATHER == "concat":
            rows = mm(jnp.concatenate([cls, obj_s[:, None], xy, wh], axis=1))
            return (
                rows[:, :nc], rows[:, nc], rows[:, nc + 1 : nc + 3],
                rows[:, nc + 3 : nc + 5],
            )
        if RAW_GATHER == "blocked":
            blk = GATHER_BLOCK
            g = box_pre.shape[0]
            m = -(-n // blk)
            payload = jnp.concatenate([cls, obj_s[:, None], xy, wh], axis=1)
            c = payload.shape[1]
            if m * blk != n:
                payload = jnp.pad(payload, ((0, m * blk - n), (0, 0)))
            oh_hi = (
                (box_pre // blk)[:, None] == jax.lax.iota(jnp.int32, m)[None, :]
            ).astype(cls.dtype)
            rows_blk = jax.lax.dot_general(
                oh_hi, payload.reshape(m, blk * c), (((1,), (0,)), ((), ())),
                preferred_element_type=cls.dtype,
            ).reshape(g, blk, c)
            oh_lo = (
                (box_pre % blk)[:, None] == jax.lax.iota(jnp.int32, blk)[None, :]
            ).astype(cls.dtype)
            # offset select as a fused VPU multiply-reduce, NOT a batched
            # (1, blk) x (blk, c) dot: g tiny per-batch matmuls lower
            # terribly on the MXU (suspected cause of the r5b negative).
            # Single nonzero per row => the sum is an exact pass-through.
            rows = jnp.sum(rows_blk * oh_lo[:, :, None], axis=1)
            return (
                rows[:, :nc], rows[:, nc], rows[:, nc + 1 : nc + 3],
                rows[:, nc + 3 : nc + 5],
            )
        if RAW_GATHER == "split":
            small = mm(jnp.concatenate([obj_s[:, None], xy, wh], axis=1))
            return mm(cls), small[:, 0], small[:, 1:3], small[:, 3:5]
        assert RAW_GATHER == "narrow", RAW_GATHER
        return mm(cls), obj_s[box_pre], xy[box_pre], wh[box_pre]
    return cls[box_pre], obj_s[box_pre], xy[box_pre], wh[box_pre]


def select_pairs_raw(score, obj_s, xy, wh, cls, geo, conf_thres, g_rows,
                     t_rows, k, by_key):
    """Per-image fast pair selection on raw rows — the raw-tail counterpart
    of nms._select_pairs_fast, sharing its prefilter and its two-tier
    pool + exactness certificate (nms._prefilter_boxes / nms._pool_rank).
    The only difference is WHERE values materialize: cls_conf and the f32
    boxes are computed from the g gathered raw rows instead of gathered
    from full decoded matrices. score/obj_s arrive precomputed from the
    trunk (yolov5.predict_raw), bit-equal to the decoded path's
    max_c(cls)*obj and sigmoid(obj)."""
    n, nc = cls.shape
    g = min(g_rows, n)
    box_score = jnp.where(
        (obj_s > conf_thres) & (score > conf_thres), score, -1.0
    )
    best_top, box_pre, hid_val = _nms._prefilter_boxes(box_score, g, by_key)
    cls_g, obj_g, xy_g, wh_g = _gather_rows_raw(box_pre, obj_s, xy, wh, cls)
    cls_conf = jax.nn.sigmoid(cls_g) * obj_g[:, None]
    xywh_pre = decode_rows(geo, box_pre, xy_g, wh_g)
    top_scores, row, col, ok = _nms._pool_rank(
        best_top, hid_val, cls_conf, conf_thres, t_rows, k, by_key
    )
    return top_scores, row, col, xywh_pre, ok


@partial(
    jax.jit,
    static_argnames=("max_det", "max_cand", "multi_label", "iou_thres",
                     "fallback", "pool"),
)
def nms_split_batch_raw(
    score: jax.Array,  # (B, N) best-pair confidence (trunk-side row max)
    obj_s: jax.Array,  # (B, N) sigmoid(obj)
    xy: jax.Array,  # (B, N, 2) raw xy head conv output (no bias)
    wh: jax.Array,  # (B, N, 2) raw wh head conv output (no bias)
    cls: jax.Array,  # (B, N, nc) raw class logits (bias applied)
    geo,  # raw_geometry pytree
    conf_thres: float = 0.001,
    iou_thres: float = 0.6,
    max_det: int = 300,
    max_cand: int = 1024,
    multi_label: bool = True,
    fallback: str = "cond",
    pool: bool = True,
) -> tuple:
    """Batched raw-tail NMS — result-identical to nms_split_batch on the
    decoded view of the same logits (fallback/pool semantics match its
    docstring; fallback="flag" returns the extra exactness scalar). The
    exact fallback and the non-multi-label path materialize the decoded
    matrices first (decode_full) and run the decoded-path code, so the two
    entries agree by construction wherever the fast pool is not used."""
    b, n = score.shape
    nc = cls.shape[-1]
    assert fallback in ("cond", "flag"), fallback
    raw = (score, obj_s, xy, wh, cls)
    if not (multi_label and nc > 1):
        obj_f, xywh_f, cls_f = decode_full(geo, raw)
        return _nms.nms_split_batch(
            obj_f, xywh_f, cls_f, conf_thres, iou_thres, max_det=max_det,
            max_cand=max_cand, multi_label=multi_label, fallback=fallback,
            pool=pool,
        )
    t_rows = min(_nms.PAIR_T, nc)
    kb = min(max_cand, n)
    g = min(_nms.PAIR_G, kb)
    k = min(max_cand, kb * nc)
    by_key = _nms._use_keys(cls, n, kb)

    def use_exact(_):
        obj_f, xywh_f, cls_f = decode_full(geo, raw)
        return jax.vmap(
            lambda o1, x1, c1: _nms._rank_pairs_exact(
                o1, x1, c1, conf_thres, max_cand, by_key
            )
        )(obj_f, xywh_f, cls_f)

    if pool:
        top_scores, row, col, xywh_pre, ok = jax.vmap(
            lambda s1, o1, xy1, wh1, c1: select_pairs_raw(
                s1, o1, xy1, wh1, c1, geo, conf_thres, g, t_rows, k, by_key
            )
        )(score, obj_s, xy, wh, cls)

        def use_fast(_):
            bxy = jnp.take_along_axis(xywh_pre, row[..., None], axis=1)
            return top_scores, bxy, col

        all_ok = jnp.all(ok)
        if fallback == "flag":
            top_scores, bxywh, bcol = use_fast(None)
        else:
            top_scores, bxywh, bcol = jax.lax.cond(
                all_ok, use_fast, use_exact, None
            )
    else:
        all_ok = jnp.asarray(True)
        top_scores, bxywh, bcol = use_exact(None)
    cls_idx = bcol.astype(jnp.float32)
    half = bxywh[..., 2:4] * 0.5
    cand_boxes = jnp.concatenate(
        [bxywh[..., :2] - half, bxywh[..., :2] + half], axis=-1
    )
    dets, valid = _nms._emit_batch(
        cand_boxes, top_scores, cls_idx, float(iou_thres), max_det
    )
    if fallback == "flag":
        return dets, valid, all_ok
    return dets, valid

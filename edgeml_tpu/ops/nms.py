"""Batched class-aware non-maximum suppression (fixed shapes, jittable).

The reference's NMS lives inside torchvision/ultralytics C++ (SURVEY.md
native-code ledger item 2). This is the TPU formulation: candidate selection
is one top_k over the (box, class) score matrix; suppression is the exact
greedy result computed as a FIXPOINT instead of a sequential pick-max loop:
with candidates sorted by descending score (the greedy visit order),

    kept[i]  <=>  score[i] > 0  and  no kept j < i with iou(j, i) > thres.

Iterating kept <- valid & ~(S @ kept > 0) from kept = valid (S the strictly
lower-triangular suppression matrix) converges to the unique solution of that
recurrence — i.e. bit-identical greedy NMS — in at most (longest suppression
chain) steps, typically 2-5 for detector outputs. Each step is one (K, K)
matvec on the MXU, so a whole batch suppresses in microseconds where the
sequential formulation needed max_det serial VPU iterations per image
(ops/nms_pallas.py keeps that kernel as a cross-check oracle).

Semantics follow the yolov5 tooling that produced the reference's detection
files: confidence = objectness * class probability, candidates gated by
conf > conf_thres, multi-label (one candidate per (box, class) pair),
class-aware IoU via per-class box offsets, strict-greater suppression at
iou_thres, at most max_det survivors ordered by confidence.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

MAX_WH = 7680.0  # class-offset stride, matches the yolov5 convention


def _iou_one_vs_many(box, boxes):
    """IoU of one xyxy box against (K, 4) boxes."""
    lo = jnp.maximum(box[:2], boxes[:, :2])
    hi = jnp.minimum(box[2:4], boxes[:, 2:4])
    inter = jnp.prod(jnp.maximum(hi - lo, 0.0), axis=-1)
    a = jnp.prod(jnp.maximum(box[2:4] - box[:2], 0.0))
    b = jnp.prod(jnp.maximum(boxes[:, 2:4] - boxes[:, :2], 0.0), axis=-1)
    return inter / jnp.maximum(a + b - inter, 1e-12)


NMS_BLOCK = None
"""Trace-time knob: block size for the blocked-greedy fixpoint in
greedy_keep_mask (None = single global fixpoint). The global fixpoint
re-reads the whole (K, K) suppression matrix every iteration, and its
iteration count equals the longest suppression chain — on dense candidate
sets (RPN proposals over an anchor grid at IoU 0.7) chains run into the
hundreds, so the loop is HBM-bound on K^2 traffic times chain length.
The blocked form decides candidates block-by-block in score order: each
block pays ONE (block, K) matvec against the already-decided prefix, then
a fixpoint confined to its (block, block) tile (VMEM-resident), so the
full matrix is streamed exactly once. Bit-identical by the same
uniqueness induction, per block."""


def greedy_keep_mask(boxes: jax.Array, scores: jax.Array,
                     iou_thres: float, block: int | None = None) -> jax.Array:
    """Exact greedy-NMS survivor mask via the fixpoint formulation.

    :param boxes: (K, 4) xyxy, sorted by DESCENDING score (the greedy visit
        order; ties must already be broken by position, as lax.top_k does).
    :param scores: (K,); entries <= 0 never participate.
    :param iou_thres: strictly-greater IoU suppresses.
    :param block: blocked-greedy block size (default: the NMS_BLOCK knob).
    :return: (K,) bool — True where greedy NMS keeps the candidate.

    kept[i] <=> valid[i] and no kept j < i with iou > thres. The while_loop
    exits only at the fixpoint, which is unique (induction over i), so the
    result is bit-identical to the sequential pick-max loop. Convergence takes
    at most (longest suppression chain) iterations — each one a (K, K) matvec.
    With a block size set, the same fixpoint runs per block against the
    decided prefix (see NMS_BLOCK) — same unique result, one pass over sup.
    """
    k = scores.shape[0]
    # Split-coordinate IoU: every intermediate is a full (K, K) matrix with a
    # 128-lane-friendly minor dim. The packed (K, 1, 2)/(1, K, 2) broadcast
    # form leaves 2-wide minor dims that vectorize poorly on the (8, 128) VPU
    # (measured: the packed sup build is ~2x the split form at K=1024,
    # tools/exp_emit.py). Arithmetic is identical op-for-op (min/max, sub,
    # clamp, mul), so results are bit-identical.
    x1, y1, x2, y2 = (boxes[:, i] for i in range(4))
    ix = jnp.minimum(x2[:, None], x2[None, :]) - jnp.maximum(
        x1[:, None], x1[None, :]
    )
    iy = jnp.minimum(y2[:, None], y2[None, :]) - jnp.maximum(
        y1[:, None], y1[None, :]
    )
    inter = jnp.maximum(ix, 0.0) * jnp.maximum(iy, 0.0)
    area = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)
    iou = inter / jnp.maximum(area[:, None] + area[None, :] - inter, 1e-12)
    row = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    # sup entries are exactly 0/1; int8 storage is lossless and quarters the
    # matrix traffic of every fixpoint pass (the loop's dominant cost, HBM-
    # bound) vs f32. The int8 x int8 matvec accumulates in int32 on the MXU,
    # so counts are exact integers.
    sup = ((iou > iou_thres) & (col < row)).astype(jnp.int8)  # [i, j]: j suppresses i
    valid = scores > 0.0
    if block is None:
        block = NMS_BLOCK

    if not block or block >= k:
        def cond(c):
            _, changed = c
            return changed

        def body(c):
            kept, _ = c
            # MXU matvec: #kept suppressors of i, exact int32 counts
            hit = jnp.matmul(
                sup, kept.astype(jnp.int8), preferred_element_type=jnp.int32
            )
            new = valid & (hit == 0)
            return new, jnp.any(new != kept)

        kept, _ = jax.lax.while_loop(cond, body, (valid, jnp.asarray(True)))
        return kept

    # Blocked greedy: stream sup once; fixpoints stay on (block, block) tiles.
    pad = -k % block
    if pad:
        sup = jnp.pad(sup, ((0, pad), (0, pad)))
        valid = jnp.pad(valid, (0, pad))
    kp = k + pad
    nb = kp // block
    sup_rows = sup.reshape(nb, block, kp)
    # in-block tiles, extracted at trace time (static offsets)
    tiles = jnp.stack(
        [sup_rows[t, :, t * block:(t + 1) * block] for t in range(nb)]
    )  # (nb, block, block)

    def step(kept, xs):
        rows, tile, vb, t = xs  # (block, kp), (block, block), (block,), ()
        # undecided (later-block) entries of kept are False, and in-block
        # cols contribute 0 here too (kept[this block] is still False), so
        # one matvec against the carry counts exactly the decided-prefix hits
        hit_prev = jnp.matmul(
            rows, kept.reshape(-1).astype(jnp.int8),
            preferred_element_type=jnp.int32,
        )
        free = vb & (hit_prev == 0)

        def cond(c):
            return c[1]

        def body(c):
            kb, _ = c
            hit = jnp.matmul(
                tile, kb.astype(jnp.int8), preferred_element_type=jnp.int32
            )
            new = free & (hit == 0)
            return new, jnp.any(new != kb)

        kb, _ = jax.lax.while_loop(cond, body, (free, jnp.asarray(True)))
        return kept.at[t].set(kb), None

    kept0 = jnp.zeros((nb, block), bool)
    kept, _ = jax.lax.scan(
        step, kept0,
        (sup_rows, tiles, valid.reshape(nb, block), jnp.arange(nb)),
    )
    return kept.reshape(-1)[:k]


def suppress_mask(boxes: jax.Array, scores: jax.Array,
                  iou_thres: float, max_keep: int) -> jax.Array:
    """Greedy-NMS survivors of UNSORTED candidates as a (K,) bool mask in the
    original order (RPN proposal filtering). Only scores > 0 participate; at
    most the first max_keep greedy picks survive."""
    k = scores.shape[0]
    order_scores, order = jax.lax.top_k(jnp.where(scores > 0, scores, -1.0), k)
    kept_sorted = greedy_keep_mask(boxes[order], order_scores, float(iou_thres))
    kept_sorted &= (jnp.cumsum(kept_sorted) - 1) < max_keep
    return jnp.zeros((k,), bool).at[order].set(kept_sorted)


@partial(jax.jit, static_argnames=("max_det", "max_cand", "iou_thres"))
def nms_rows(
    boxes: jax.Array,  # (N, 4) xyxy
    scores: jax.Array,  # (N,) — entries <= 0 are ignored
    cls_ids: jax.Array,  # (N,) float class ids (for class-aware offsets)
    iou_thres: float = 0.5,
    max_det: int = 300,
    max_cand: int = 2048,
) -> tuple:
    """Class-aware greedy NMS over pre-scored (box, class) rows.

    Returns (dets (max_det, 6) [x1, y1, x2, y2, score, cls], valid).
    """
    k = min(max_cand, scores.shape[0])
    # chunked exact top_k: Faster R-CNN feeds 90,000 (proposal, class) rows
    # here — inside XLA TopK's measured shape cliff (CLAUDE.md)
    top_scores, top_idx = topk1d(jnp.where(scores > 0, scores, -1.0), k)
    cand_boxes = boxes[top_idx]
    cand_cls = cls_ids[top_idx]
    return _emit(cand_boxes, top_scores, cand_cls, iou_thres, max_det)


def topk1d(x: jax.Array, k: int, chunk: int = 10240):
    """Exact 1-D top_k with chunked evaluation (requires k <= x.shape[0]).

    XLA's TPU TopK lowering has severe shape cliffs (measured on v5e:
    n=81920, k=1024 runs 60x slower than the same data as 8 chunks of 10240).
    This splits x into <=chunk-sized pieces, takes per-chunk top-k (the global
    top-k is a subset of the union), and recursively merges. Bit-identical to
    jax.lax.top_k including tie order: within a chunk, equal values keep
    ascending-index order; across chunks, lower chunks sit earlier in the
    merge array, so ties still resolve to the lowest original index.
    """
    n = x.shape[0]
    if 2 * k > chunk:
        # the per-chunk keep ratio must stay below 1/2 or the recursion
        # cannot shrink (k >= chunk would loop forever)
        chunk = 2 * k
    if n <= max(chunk, 2 * k):
        return jax.lax.top_k(x, k)
    chunks = -(-n // chunk)
    pad = chunks * chunk - n
    if pad:
        # identity = -inf for floats, type minimum for ints (the keyed bf16
        # ranking feeds packed int32 keys; -inf would only reach INT32_MIN
        # through an invalid-cast warning)
        if jnp.issubdtype(x.dtype, jnp.floating):
            fill = -jnp.inf
        else:
            fill = jnp.iinfo(x.dtype).min
        x = jnp.concatenate([x, jnp.full((pad,), fill, x.dtype)])
    kk = min(k, chunk)
    v, i = jax.lax.top_k(x.reshape(chunks, chunk), kk)
    v2, m = topk1d(v.reshape(-1), k, chunk)
    return v2, i.reshape(-1)[m] + (m // kk) * chunk


def _compact(cand_boxes, top_scores, cls_idx, kept, max_det):
    """Compaction of one image's survivors into (max_det, 6) + valid.

    Gathers the first max_det survivors instead of scattering all K candidate
    rows: top_k over (K - i for kept i) yields survivor indices in ascending
    candidate order (= descending score, the output contract), touching
    max_det * 6 elements instead of K * 6 (the serial-tail cost model,
    CLAUDE.md)."""
    k = top_scores.shape[0]
    m = min(max_det, k)
    keep_rank = jnp.where(kept, k - jax.lax.iota(jnp.int32, k), 0)
    rank_val, sel = jax.lax.top_k(keep_rank, m)
    rows = jnp.concatenate(
        [cand_boxes, top_scores[:, None], cls_idx[:, None]], axis=1
    )
    out = rows[sel] * (rank_val[:, None] > 0)
    if m < max_det:
        out = jnp.concatenate(
            [out, jnp.zeros((max_det - m, 6), out.dtype)]
        )
    valid = out[:, 4] > 0.0
    return jnp.where(valid[:, None], out, 0.0), valid


def _emit(cand_boxes, top_scores, cls_idx, iou_thres, max_det):
    """Shared NMS tail: fixpoint suppression + compaction into (max_det, 6)."""
    off = cand_boxes + cls_idx[:, None] * MAX_WH
    kept = greedy_keep_mask(off, top_scores, float(iou_thres))
    return _compact(cand_boxes, top_scores, cls_idx, kept, max_det)


FORCE_FUSED_INTERPRET = False
"""Test knob: route _emit_batch through the fused Pallas suppressor in
interpreter mode even on CPU, so the CPU suite (including the multichip
dryrun's 8-device host mesh) exercises the exact program — pallas_call,
custom_partitioning rule and all — that TPU serving runs."""


FUSED_MAX_K = 2048
"""Largest K routed to the fused Pallas suppressor (trace-time; tools set
1024/0 for A/Bs against the XLA fixpoint). K <= 1024 is the monolithic
VMEM kernel; (1024, 2048] the blocked-greedy kernel."""


def _emit_batch(cand_boxes, top_scores, cls_idx, iou_thres, max_det):
    """Batched _emit over (B, K, ...) candidates.

    On TPU-like backends the suppression fixpoint runs in the fused Pallas
    kernel (ops/nms_fused.py) — bit-identical to vmap(greedy_keep_mask)
    (verified exhaustively on-device, tools/exp_emit3.py: 0 mismatches) and
    ~2x cheaper in-program (the XLA build materializes (K, K) intermediates
    in HBM; the kernel keeps them in VMEM — 30.8 -> 27.4 ms serving step at
    B=128, tools/exp_ablate3.py stage 8). CPU keeps the XLA formulation, so
    the CPU reference path is untouched. Under a data-parallel mesh the
    kernel shards over images via its custom_partitioning rule."""
    k = top_scores.shape[-1]
    force = FORCE_FUSED_INTERPRET
    # K <= 1024 runs the monolithic VMEM kernel; K in (1024, 2048] the
    # blocked-greedy kernel (round 5, nms_fused._kernel_blocked): no (K, K)
    # scratch, so it avoids both the 16 MB scoped-vmem ceiling and the
    # monolithic-K=2048 remote-compiler crash (HTTP 500 at every tj,
    # round 4). The K=2048 callers (SSDLite/RetinaNet postprocess,
    # max_cand=2048) ride it; larger K takes the XLA fixpoint below.
    if (jax.default_backend() != "cpu" or force) and k % 256 == 0 \
            and k <= FUSED_MAX_K:
        from .nms_fused import greedy_keep_mask_fused

        off = cand_boxes + cls_idx[..., None] * MAX_WH
        kept = greedy_keep_mask_fused(off, top_scores, float(iou_thres),
                                      interpret=force)
        return jax.vmap(
            lambda cb, ts, ci, kp: _compact(cb, ts, ci, kp, max_det)
        )(cand_boxes, top_scores, cls_idx, kept)
    return jax.vmap(
        lambda cb, ts, ci: _emit(cb, ts, ci, float(iou_thres), max_det)
    )(cand_boxes, top_scores, cls_idx)


@partial(
    jax.jit,
    static_argnames=("max_det", "max_cand", "multi_label", "iou_thres",
                     "conf_fused"),
)
def nms_split(
    obj: jax.Array,  # (N,) objectness, sigmoid space
    xywh: jax.Array,  # (N, 4) pixel xywh-center boxes
    cls: jax.Array,  # (N, nc) per-class probabilities, sigmoid space
    conf_thres: float = 0.001,
    iou_thres: float = 0.6,
    max_det: int = 300,
    max_cand: int = 1024,
    multi_label: bool = True,
    conf_fused: bool = False,
) -> tuple:
    """NMS over split decode components (YoloV5.predict output; vmap over
    images). Same semantics and return contract as non_max_suppression —
    candidate confidence = obj * cls gated at conf_thres — but every input is
    contiguous, so the objectness top_k and the candidate gathers avoid the
    strided minor-dim reads that dominate the packed-pred formulation on TPU.

    conf_fused=True: the inputs come from predict(fuse_conf=True) — obj is
    the precomputed per-box best confidence max_c(obj*cls_c) and cls is the
    pre-multiplied confidence matrix. Multi-label results are bit-identical
    to the unfused path; the single-label branch breaks bf16 score TIES by
    confidence-matrix argmax instead of class-probability argmax (exact
    arithmetic is unaffected).

    :return: (dets (max_det, 6) [x1, y1, x2, y2, conf, cls], valid (max_det,)).
    """
    n, nc = cls.shape
    if multi_label and nc > 1:
        top_scores, bxywh, col = _rank_pairs_exact(
            obj, xywh, cls, conf_thres, max_cand,
            _use_keys(cls, n, min(max_cand, n)), fused=conf_fused,
        )
        cls_idx = col.astype(jnp.float32)
    else:
        if conf_fused:
            best_conf = obj  # already max_c(obj*cls_c)
            scores = jnp.where(best_conf > conf_thres, best_conf, -1.0)
        else:
            best_conf = jnp.max(cls, axis=1) * obj  # (N,) fused elementwise
            scores = jnp.where(
                (obj > conf_thres) & (best_conf > conf_thres), best_conf, -1.0
            )
        best_cls = jnp.argmax(cls, axis=1)
        k = min(max_cand, n)
        top_scores, box_pre = topk1d(scores, k)
        cls_idx = best_cls[box_pre].astype(jnp.float32)
        bxywh = xywh[box_pre]
    half = bxywh[:, 2:4] * 0.5
    cand_boxes = jnp.concatenate(
        [bxywh[:, :2] - half, bxywh[:, :2] + half], axis=1
    )
    return _emit(cand_boxes, top_scores, cls_idx, iou_thres, max_det)


# Route the cls (and obj, when bf16) row gather through a one-hot MXU
# matmul instead of a dynamic gather. Only applies to bf16 payloads
# (DEFAULT-precision matmuls round operands to bfloat16 — lossless there,
# corrupting for f32; boxes ALWAYS stay on narrow gathers). Default ON:
# measured v5e round 4 (tools/exp_gather7.py, B=128 bf16): narrow gathers
# 23.90 ms/batch vs one-hot cls 21.88 vs one-hot cls+obj 20.79 — the
# (G, N) @ (N, nc) matmul streams the cls matrix at HBM bandwidth while
# the dynamic gather pays ~1 cycle/element on the VPU. Read at trace time.
_GATHER_ONEHOT = True


def _gather_rows(box_pre, xywh, obj, cls):
    """Gather (xywh, obj, cls) rows for the selected boxes as separate
    NARROW dynamic gathers. obj=None (the conf_fused path: cls is already
    the obj*cls confidence matrix) skips the obj gather entirely — one of
    the three serial gathers gone. Exactness note: a one-hot f32 matmul looks like
    an exact gather but is NOT on TPU — matmul operands round to bfloat16 at
    default precision (box coordinates near 640 lose whole pixels), and only
    Precision.HIGHEST is bit-exact, at which point it no longer beats the
    dynamic-gather lowering (measured: narrow gathers 57.4 ms vs HIGHEST
    one-hot 58.7 ms per 128-image batch). For the bf16 cls matrix the
    rounding IS lossless (payload already bf16, one-hot is 0/1), so that
    gather may route through the MXU (_GATHER_ONEHOT).

    Packing note (measured negative results, tools/exp_tail3/4.py at B=128):
    bitcasting the (N, nc) bf16 matrix to (N, nc/2) f32 HERE is 5 ms SLOWER
    (the standalone repack materializes a second full-size tensor), and
    emitting the packed layout from the trunk instead cost +4.6 ms there
    while the 40-wide f32 gather saved nothing over the 80-wide bf16 one.
    Plain narrow gathers are the fast path."""
    if _GATHER_ONEHOT and cls.dtype == jnp.bfloat16:
        n, nc = cls.shape
        oh = (box_pre[:, None] == jax.lax.iota(jnp.int32, n)[None, :]).astype(
            cls.dtype
        )
        if obj is not None and obj.dtype == cls.dtype:
            # Fold obj in as one more matmul column (measured: another
            # -1.1 ms/128-batch over the cls-only matmul — the concat fuses
            # into the operand stream; a separate narrow obj gather would
            # pay its own ~16 cycles/row serial pass).
            both = jax.lax.dot_general(
                oh, jnp.concatenate([cls, obj[:, None]], axis=1),
                (((1,), (0,)), ((), ())),
                preferred_element_type=cls.dtype,
            )
            return xywh[box_pre], both[:, nc], both[:, :nc]
        cls_rows = jax.lax.dot_general(
            oh, cls, (((1,), (0,)), ((), ())),
            preferred_element_type=cls.dtype,
        )
    else:
        cls_rows = cls[box_pre]
    return xywh[box_pre], None if obj is None else obj[box_pre], cls_rows


def _pack17(x):
    """int32 ranking keys for a 1-D array of bfloat16 scores in (0, 1]:

        key = (bitcast16(score) << 17) - index

    Real scores (> 0) have bit patterns in (0, 0x3F80] (14 bits), index
    < x.size <= 2^17, so keys are unique and order exactly by the canonical
    reference order (score desc, index asc); non-positive entries map to
    key = -index <= 0, below every real key. The keys make every ranking
    tie-PROOF: XLA's TPU TopK is not tie-stable, and bf16 ties are common
    (8-bit mantissa — the calibrated serving workload shows 60+ way tie
    clusters at the 1024th pair score), so value-ranked top_k on TPU
    resolves ties arbitrarily while CPU resolves them ascending. Ranking
    keys instead pins ALL paths (fast pool, exact fallback, per-image
    reference) to the same canonical order on every platform.
    """
    u = jnp.where(
        x > 0,
        jax.lax.bitcast_convert_type(x, jnp.uint16).astype(jnp.int32),
        0,
    )
    return (u << 17) - jax.lax.iota(jnp.int32, x.shape[0])


def _unpack17(keys, idx):
    """Recover bfloat16 scores from _pack17 keys + their original indices
    (key + index == score_bits << 17); non-real keys (<= 0) map to -1.0,
    matching the value-ranking masks."""
    u = ((keys + idx) >> 17).astype(jnp.uint16)
    s = jax.lax.bitcast_convert_type(u, jnp.bfloat16)
    return jnp.where(keys > 0, s, jnp.asarray(-1.0, jnp.bfloat16))


def _use_keys(cls, n, kb):
    """Key ranking applies when scores are bf16 (tie clusters are the rule)
    and both index spaces fit the 17-bit field. The production YOLO shape
    (n=25200, kb*nc=81,920) fits; larger grids fall back to value ranking
    (ties there remain subject to the TPU tie-order caveat)."""
    nc = cls.shape[-1]
    return (cls.dtype == jnp.bfloat16 and n <= (1 << 17)
            and kb * nc <= (1 << 17))


def _rank_pairs_exact(o, x, c, conf_thres, max_cand, by_key, fused=False):
    """EXACT two-stage pair selection for one image: pre-filter boxes by
    their BEST pair confidence max_c(obj*cls_c), then rank all kb*nc pairs.
    Every box contributing a pair above the k-th pair confidence t
    contributes (at least) its own best pair above t, and those are
    distinct per box — so at most k boxes rank above t, and the top
    max_cand boxes by best-pair confidence contain every top-max_cand
    pair. (Pre-filtering by obj alone — the original scheme — is NOT
    exact: many high-obj/low-cls boxes can crowd out a lower-obj box
    holding the single best pair.)

    by_key: rank packed integer keys instead of raw values (bf16 inputs —
    see _pack17); bit-identical on CPU, tie-deterministic on TPU.

    fused: the conf_fused contract — o is the PRECOMPUTED row max of c and
    c is already the obj*cls confidence matrix (trunk-side epilogue,
    yolov5.decode_level_split fuse_conf). Skips the full-matrix max pass,
    the obj gather, and the per-row multiply; bit-identical to the unfused
    path (the obj > conf_thres gate is implied by conf <= obj).

    Returns (top_scores (k,), bxywh (k, 4), col (k,) int).
    """
    n, nc = c.shape
    kb = min(max_cand, n)
    if fused:
        box_score = jnp.where(o > conf_thres, o, -1.0)
    else:
        best = jnp.max(c, axis=1) * o  # (N,) fused elementwise
        box_score = jnp.where(
            (o > conf_thres) & (best > conf_thres), best, -1.0
        )
    # At the YOLO 640 size (n=25200) a DIRECT lax.top_k measures faster
    # than chunking (15.7 vs 17.0 ms in-pipeline, tools/exp_round3.py) —
    # the TopK cliff does not bite at this n. Larger n (e.g. 1280-input
    # grids) stay on the chunked path.
    chunk = n if n <= 25600 else 10240
    if by_key:
        bt_keys, box_pre = topk1d(_pack17(box_score), kb, chunk=chunk)
        best_top = _unpack17(bt_keys, box_pre)
    else:
        best_top, box_pre = topk1d(box_score, kb, chunk=chunk)
    xywh_pre, obj_pre, cls_rows = _gather_rows(
        box_pre, x, None if fused else o, c
    )
    cls_conf = cls_rows if fused else cls_rows * obj_pre[:, None]
    flat = jnp.where(
        (best_top[:, None] > 0) & (cls_conf > conf_thres), cls_conf, -1.0
    ).reshape(-1)
    k = min(max_cand, flat.shape[0])
    # chunk=4096 measured fastest for the (max_cand*nc,) pair ranking
    # shape on v5e (47.1 ms pipeline vs 47.8 at the 10240 default,
    # tools/exp_tail2.py); both are exact.
    if by_key:
        tk_keys, top_idx = topk1d(_pack17(flat), k, chunk=4096)
        top_scores = _unpack17(tk_keys, top_idx)
    else:
        top_scores, top_idx = topk1d(flat, k, chunk=4096)
    return top_scores, xywh_pre[top_idx // nc], top_idx % nc


PAIR_T = 16  # per-box class candidates for tail boxes (when B1 < G)
# Head boxes whose FULL class rows enter the pool. Default = PAIR_G: the
# FULL pool — every gathered row contributes all nc pairs, the tier-2
# per-row top_k disappears, and the in-pool certificate is trivially True
# (only the hidden-row check remains). Measured v5e round 4
# (tools/exp_poolfull.py, 128x12 raw tail): full pool 22.84 ms/batch vs
# two-tier 23.50 (+2.9%), 0 redos — one (g*nc = 30,720) keyed top_k beats
# the per-row (256, 80)->16 top_k + (14,336) top_k pair (XLA TopK cost is
# shape-cliffy, not linear). Two-tier machinery kept for B1 < G configs.
PAIR_B1 = 384
# Boxes whose rows are gathered at all (tier 1 + tier 2). The row gather is
# the tail's dominant serial cost (~9.3 ms of the 31 ms serving step at
# G=512, tools/exp_ablate3.py stage 2), and only max 284 / mean 153 of the
# top-1024 boxes ever held a top-1024 pair over 2560 calibrated images
# (both dtypes) — 384 keeps a ~100-box margin over the observed max while
# cutting the gathered elements another 25%. Exactness is certificate-
# protected regardless (a failure falls back to the exact full ranking).
PAIR_G = 384


def _select_pairs_fast(o, x, c, conf_thres, g_rows, t_rows, k, by_key,
                       fused=False):
    """Per-image fast pair selection: box prefilter by best-pair confidence
    (exact, as in nms_split), then gather only the top g_rows boxes' class
    rows and rank a TWO-TIER pool instead of all kb*nc pairs:

      tier 1: the top PAIR_B1 boxes contribute their FULL class rows —
              covers the concentrated regime (random-init weights put the
              whole top-1024 into ~14 boxes of 80 classes each, measured);
      tier 2: boxes PAIR_B1..g_rows contribute their per-row top-PAIR_T —
              covers the spread regime (~1 top pair per box).

    The row gather is the tail's dominant serial cost (~1 element/cycle,
    CLAUDE.md cost model): at the production shape only max 284 / mean 153
    of the top-1024 boxes ever hold a pair above the k-th pair score
    (measured over 2560 calibrated random-weight images, both dtypes), so
    g_rows=PAIR_G (384) cuts the gathered elements ~2.7x, and the pool
    shrinks to B1*nc + (G-B1)*T = 14.3k of the 82k pairs.

    Exactness certificate, two parts, both exact counts (vectorized
    compare-reduces), with (t, f*) the k-th selected pair's (score, flat
    index) — an element ranks strictly above it iff score > t or
    (score == t and flat < f*):

      * in-pool: #{gathered pairs above the (t, f*) boundary} == kk - 1.
        Every pool element above the boundary is selected, and the pool
        contributes exactly kk - 1 of them, so equality holds iff nothing
        hidden (a tier-2 row's pairs beyond its top-T) ranks above;
      * hidden rows: best_top[g] <= t — a hidden TIE at t is harmless
        since hidden rows sit after every gathered row in the canonical
        order, so only a strictly greater score displaces. (When t <= 0
        the pool ran dry; then exactness needs every real gathered pair
        in the pool and no real hidden boxes: best_top[g] <= 0.)

    An earlier per-row check (any tier-2 row's (T+1)-th value >= t) was
    sound but conservative: in the calibrated random-weight regime its
    margins sat within ~8% and whole batches fell back on near-misses
    that hid nothing. The count form with T=16 measured ZERO failures
    over 2560 images while T=8 failed ~2% of images (1-4 per 128-batch).

    Tie handling (by_key, decided by _use_keys): the reference order is
    (score desc, flat (row, col) asc). On CPU lax.top_k is tie-stable
    (ascending index), and the pool layout is flat-order-consistent, so
    value ranking reproduces the reference order. On TPU XLA's TopK is
    NOT tie-stable (measured: with bf16 tie clusters of 60+ at the k-th
    score — 8-bit mantissa — every calibrated 128-batch differed from the
    flat ranking in tie order). With by_key every ranking here (box
    prefilter, per-row top-T, pool top-k) runs on _pack17 keys — unique,
    canonical order on every platform, matching _rank_pairs_exact's keyed
    ranking — and scores are recovered algebraically from the selected
    keys (score_bits = (key + flat) >> 17): no auxiliary value arrays or
    per-element gathers (a pool_v[sel] gather of 1024 single-element rows
    costs ~16 cycles/row). The f32 path keeps plain value ranking: exact
    f32 score ties are vanishingly rare (0 in 1280 calibrated images),
    the boundary certificate catches any hidden one, and the hidden-row
    check stays STRICT (without canonical order a tie at rank g cannot be
    attributed to either side).

    fused: the conf_fused contract (see _rank_pairs_exact) — o is the
    precomputed row max of c, c is already the confidence matrix.

    Returns (top_scores (k,), row (k,), col (k,), xywh_pre (g, 4),
    ok scalar bool). Row/col index into the g gathered rows.
    """
    n, nc = c.shape
    g = min(g_rows, n)
    if fused:
        box_score = jnp.where(o > conf_thres, o, -1.0)
    else:
        best = jnp.max(c, axis=1) * o
        box_score = jnp.where(
            (o > conf_thres) & (best > conf_thres), best, -1.0
        )
    best_top, box_pre, hid_val = _prefilter_boxes(box_score, g, by_key)
    xywh_pre, obj_pre, cls_rows = _gather_rows(
        box_pre, x, None if fused else o, c
    )
    cls_conf = cls_rows if fused else cls_rows * obj_pre[:, None]
    top_scores, row, col, ok = _pool_rank(
        best_top, hid_val, cls_conf, conf_thres, t_rows, k, by_key
    )
    return top_scores, row, col, xywh_pre, ok


def _prefilter_boxes(box_score, g, by_key):
    """Top-g box prefilter by best-pair confidence (+ one extra row for the
    hidden-row certificate). Returns (best_top (g,), box_pre (g,) int,
    hid_val scalar or None). Shared by _select_pairs_fast and the raw-tail
    variant (ops.nms_raw.select_pairs_raw)."""
    n = box_score.shape[0]
    need = min(g + 1, n)  # one extra for the hidden-row certificate
    chunk = n if n <= 25600 else 10240
    if by_key:
        bt_keys, box_pre = topk1d(_pack17(box_score), need, chunk=chunk)
        best_top = _unpack17(bt_keys, box_pre)
    else:
        best_top, box_pre = topk1d(box_score, need, chunk=chunk)
    hid_val = best_top[g] if need > g else None
    return best_top[:g], box_pre[:g], hid_val


POOL_TOPK_CHUNK = None
"""If set (int), route _pool_rank's pool ranking through the exact chunked
topk1d instead of one lax.top_k — XLA's TopK has shape cliffs at k=1024
(CLAUDE.md); exp_rawablate r4e measured the pool-rank stage at +3.6 ms per
128-batch, making the (14336,) k=1024 TopK a suspect. Trace-time flag;
None pending TPU measurement (tools/exp_pooltopk.py)."""

POOL_SELECT = "topk"
"""Pool-ranking selector for the KEYED (bf16) path. The (30,720,)->1024
lax.top_k is ~3 ms of the 23 ms B=128 serving step (r4i exp_rawablate) —
far off XLA TopK's usual ~1-2 cycles/element — so these exact partial-select
alternatives exist as trace-time knobs. MEASURED NEGATIVE (r5a
tools/exp_poolsel.py, B=128 x16): topk 22.4-22.5 ms | threshold 25.8 |
scatter 39.0 — the threshold compaction's (30,720, 1024) one-hot is ~8 GB
of HBM traffic per batch, dwarfing the saved TopK. "topk" stays the
default; the alternatives remain for small-k regimes:

  * "topk"      — one lax.top_k (round-4 default);
  * "threshold" — binary-search the exact k-th key (32 fully-parallel
                  compare-count passes over the unique _pack17 keys), then
                  compact the exactly-k survivors by a byte-split one-hot
                  MXU matmul and sort the k results;
  * "scatter"   — same threshold, compaction via a k-slot scatter.

Both alternatives are bit-identical to lax.top_k on _pack17 keys (unique
by construction, so the k-th value threshold selects exactly k elements
and tie order is moot) — fuzz-pinned by tests/test_nms_split_batch.py. They
apply only when by_key (keys embed the pool index in the low 17 bits,
which the compaction path recovers algebraically instead of carrying an
index payload)."""


def _cumsum01_mm(mask):
    """Inclusive cumsum of a 1-D 0/1 int mask as two levels of triangular
    MXU matmuls (ops/map_kernel.py MM_CUMSUM precedent: 0/1 operands are
    exact under the MXU's bf16 operand rounding, block sums <= 128 are
    bf16-exact, and f32 accumulation of <2^24 integers is exact)."""
    n = mask.shape[0]
    blk = 128
    pad = -n % blk
    xp = jnp.pad(mask.astype(jnp.bfloat16), (0, pad)).reshape(-1, blk)
    tri = (
        jax.lax.iota(jnp.int32, blk)[:, None]
        <= jax.lax.iota(jnp.int32, blk)[None, :]
    ).astype(jnp.bfloat16)
    within = jax.lax.dot_general(
        xp, tri, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (nb, blk) inclusive within-block counts
    sums = within[:, -1]  # (nb,) block sums, <= 128 each (bf16-exact)
    nb = sums.shape[0]
    pb = -nb % blk
    sp = jnp.pad(sums.astype(jnp.bfloat16), (0, pb))[None, :]
    nbp = sp.shape[1]
    tri2 = (
        jax.lax.iota(jnp.int32, nbp)[:, None]
        < jax.lax.iota(jnp.int32, nbp)[None, :]
    ).astype(jnp.bfloat16)  # strict: EXCLUSIVE block offsets
    offs = jax.lax.dot_general(
        sp, tri2, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )[0, :nb]
    out = (within + offs[:, None]).reshape(-1)[:n]
    return out.astype(jnp.int32)


def _kth_largest_u32(uk, k):
    """The k-th largest of a 1-D array of UNIQUE uint32 values, by 32
    compare-count halvings (each a fully-lane-parallel VPU pass — no sort,
    no TopK). Returns the exact value (count(uk >= t) == k)."""

    def body(_, lohi):
        lo, hi = lohi
        span = hi - lo
        mid = lo + (span >> jnp.uint32(1)) + (span & jnp.uint32(1))  # ceil
        ok = jnp.sum((uk >= mid).astype(jnp.int32)) >= k
        return (
            jnp.where(ok, mid, lo),
            jnp.where(ok, hi, mid - jnp.uint32(1)),
        )

    lo = jnp.asarray(0, jnp.uint32)
    hi = jnp.asarray(0xFFFFFFFF, jnp.uint32)
    lo, _ = jax.lax.fori_loop(0, 32, body, (lo, hi))
    return lo


def _topk_keys_threshold(keys, k, mode):
    """Exact top-k (values sorted desc, ties impossible) of unique int32
    _pack17 keys via threshold partial select — see POOL_SELECT. Returns
    the sorted keys only; callers recover the embedded index from the low
    17 bits ((-key) & 0x1FFFF)."""
    uk = keys.astype(jnp.uint32) ^ jnp.uint32(0x80000000)  # order-preserving
    t = _kth_largest_u32(uk, k)
    mask = uk >= t  # exactly k elements (keys unique)
    ranks = _cumsum01_mm(mask) - 1  # index-order position among survivors
    if mode == "scatter":
        slots = jnp.where(mask, ranks, k)
        sel_u = (
            jnp.zeros((k,), jnp.uint32).at[slots].set(uk, mode="drop")
        )
    else:  # one-hot byte-split MXU compaction
        oh = (
            mask[:, None]
            & (ranks[:, None] == jax.lax.iota(jnp.int32, k)[None, :])
        ).astype(jnp.bfloat16)
        sh = jnp.arange(4, dtype=jnp.uint32) * 8
        bts = ((uk[:, None] >> sh[None, :]) & jnp.uint32(0xFF)).astype(
            jnp.bfloat16
        )  # (n, 4) byte planes, each value <= 255 (bf16-exact)
        comp = jax.lax.dot_general(
            oh, bts, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (k, 4): each entry one exact byte (single nonzero per column)
        b = comp.astype(jnp.uint32)
        sel_u = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16) | (b[:, 3] << 24)
    sel_sorted = jnp.sort(sel_u)[::-1]
    return (sel_sorted ^ jnp.uint32(0x80000000)).astype(jnp.int32)


def _pool_rank(best_top, hid_val, cls_conf, conf_thres, t_rows, k, by_key):
    """Two-tier pool ranking + exactness certificate over the g gathered
    rows (the body of _select_pairs_fast after the row gather — see its
    docstring for the tier layout, the certificate proof, and the keyed
    tie handling). Factored out so ops.nms_raw.select_pairs_raw (raw-logit
    rows, sigmoid applied post-gather) shares the exact same machinery.

    Returns (top_scores (k,), row (k,), col (k,), ok scalar bool)."""
    g, nc = cls_conf.shape
    b1 = min(PAIR_B1, g)
    masked = jnp.where(
        (best_top[:, None] > 0) & (cls_conf > conf_thres), cls_conf, -1.0
    )
    flat_i = jax.lax.iota(jnp.int32, g * nc).reshape(g, nc)
    if by_key:
        keys = _pack17(masked.reshape(-1)).reshape(g, nc)
    else:
        keys = masked
    full = t_rows >= nc or b1 >= g
    if full:
        pool_k = keys.reshape(-1)
        pool_col = None  # tier-2 absent; col = pool index % nc
    else:
        v, i = jax.lax.top_k(keys[b1:], t_rows)  # non-full: t_rows < nc
        pool_k = jnp.concatenate([keys[:b1].reshape(-1), v.reshape(-1)])
        pool_col = i.reshape(-1)  # tier-2 column lookup
    kk = min(k, pool_k.shape[0])
    if by_key and POOL_SELECT != "topk" and kk < pool_k.shape[0]:
        # threshold partial select: keys embed the ORIGINAL g*nc flat index
        # in the low 17 bits (true for tier-2 entries too — their keys were
        # packed before the per-row top_k), so row/col come straight from
        # the selected keys and the tiered pool_col lookup disappears.
        top_keys = _topk_keys_threshold(pool_k, kk, POOL_SELECT)
        flat_sel = (-top_keys) & ((1 << 17) - 1)
        row = flat_sel // nc
        col = flat_sel % nc
    else:
        if POOL_TOPK_CHUNK and pool_k.shape[0] > POOL_TOPK_CHUNK:
            top_keys, sel = topk1d(pool_k, kk, chunk=POOL_TOPK_CHUNK)
        else:
            top_keys, sel = jax.lax.top_k(pool_k, kk)
        if full:
            row = sel // nc
            col = sel % nc
        else:
            tier2 = sel - b1 * nc  # >= 0 only for tier-2 entries
            row = jnp.where(tier2 < 0, sel // nc, b1 + tier2 // t_rows)
            col = jnp.where(
                tier2 < 0, sel % nc, pool_col[jnp.maximum(tier2, 0)]
            )
    if by_key:
        # Recover scores from the keys: key + flat == score_bits << 17.
        u_sel = (top_keys + row * nc + col) >> 17
        top_scores = jax.lax.bitcast_convert_type(
            u_sel.astype(jnp.uint16), jnp.bfloat16
        )
        # keys of real pairs are >= 2^17 - g*nc > 0; masked pairs <= 0
        top_scores = jnp.where(top_keys > 0, top_scores, -1.0)
    else:
        top_scores = top_keys
    t_k = top_scores[kk - 1]
    if full:
        ok = jnp.asarray(True)  # pool == gathered matrix: selection exact
    else:
        # Boundary-count certificate (see docstring). For the dry pool
        # (t_k <= 0: fewer than kk real pairs) exactness only needs every
        # REAL gathered pair in the pool — which pad entries are selected
        # is immaterial (emit masks score <= 0 to zero rows).
        if by_key:
            above = jnp.sum(keys > top_keys[kk - 1])
        else:
            f_star = row[kk - 1] * nc + col[kk - 1]
            above = jnp.sum(
                (masked > t_k) | ((masked == t_k) & (flat_i < f_star))
            )
        ok = jnp.where(
            t_k > 0,
            above == kk - 1,
            jnp.sum(keys > 0) == jnp.sum(pool_k > 0),
        )
    if hid_val is not None:
        # Hidden-row certificate (g < n) — see docstring. In the key path a
        # hidden tie at t_k is provably harmless (canonical order puts hidden
        # rows last); the value path cannot attribute a rank-g tie, so it
        # stays strict there.
        hid_ok = hid_val <= t_k if by_key else hid_val < t_k
        ok = ok & jnp.where(t_k > 0, hid_ok, hid_val <= 0)
    if kk < k:  # pad to the exact-branch width (tiny-n inputs)
        pad = k - kk
        top_scores = jnp.concatenate(
            [top_scores, jnp.full((pad,), -1.0, top_scores.dtype)]
        )
        row = jnp.concatenate([row, jnp.zeros((pad,), row.dtype)])
        col = jnp.concatenate([col, jnp.zeros((pad,), col.dtype)])
    return top_scores, row, col, ok


@partial(
    jax.jit,
    static_argnames=("max_det", "max_cand", "multi_label", "iou_thres",
                     "fallback", "pool", "conf_fused"),
)
def nms_split_batch(
    obj: jax.Array,  # (B, N)
    xywh: jax.Array,  # (B, N, 4)
    cls: jax.Array,  # (B, N, nc)
    conf_thres: float = 0.001,
    iou_thres: float = 0.6,
    max_det: int = 300,
    max_cand: int = 1024,
    multi_label: bool = True,
    fallback: str = "cond",
    pool: bool = True,
    conf_fused: bool = False,
) -> tuple:
    """Batched nms_split with the fast pair-selection pool.

    fallback="cond" (default): identical results to vmap(nms_split) — the
    fast pool is used only when its exactness certificate holds for EVERY
    image in the batch; otherwise one batch-level lax.cond re-ranks all
    pairs exactly. The cond sits above the vmap (a per-image cond would
    degrade to select and run both branches), but an XLA conditional is a
    scheduling barrier costing ~8 ms per 128-batch EVEN on the fast branch
    (tools/exp_tail4.py), so the hot serving loop uses:

    fallback="flag": returns (dets, valid, ok) where ok is a scalar bool —
    True means the results are exact; False means the caller must redo this
    batch with fallback="cond" (models/infer.py run_detection does this
    host-side, off the hot path).

    pool=False: skip the fast pool entirely — exact full-width pair ranking
    per image plus the batched (fused on TPU) suppressor, no cond and no
    certificate. Same results; the right mode for callers whose N/nc shapes
    don't match the YOLO-tuned pool constants (SSD/RetinaNet postprocess).

    conf_fused=True: inputs are (best, xywh, conf) from
    predict(fuse_conf=True) — see nms_split. Multi-label results are
    bit-identical to the unfused inputs; the tail drops its full-matrix
    best-confidence pass and the per-box obj gather.
    """
    b, n = obj.shape
    nc = cls.shape[-1]
    assert fallback in ("cond", "flag"), fallback
    if multi_label and nc > 1:
        t_rows = min(PAIR_T, nc)
        kb = min(max_cand, n)
        g = min(PAIR_G, kb)
        k = min(max_cand, kb * nc)
        by_key = _use_keys(cls, n, kb)

        def use_exact(_):
            # Full-width exact ranking (the contract: top-k pairs over the
            # top-kb boxes by best-pair confidence) — recomputed from the
            # raw inputs since the fast path gathers only g <= kb rows;
            # the SAME code as nms_split's multi-label branch, so the two
            # agree by construction (including the keyed tie order).
            return jax.vmap(
                lambda o1, x1, c1: _rank_pairs_exact(
                    o1, x1, c1, conf_thres, max_cand, by_key,
                    fused=conf_fused,
                )
            )(obj, xywh, cls)

        if pool:
            top_scores, row, col, xywh_pre, ok = jax.vmap(
                lambda o, x, c: _select_pairs_fast(
                    o, x, c, conf_thres, g, t_rows, k, by_key,
                    fused=conf_fused,
                )
            )(obj, xywh, cls)

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
        dets, valid = _emit_batch(
            cand_boxes, top_scores, cls_idx, float(iou_thres), max_det
        )
    else:
        dets, valid = jax.vmap(
            lambda o, x, c: nms_split(
                o, x, c, conf_thres, iou_thres,
                max_det=max_det, max_cand=max_cand, multi_label=multi_label,
                conf_fused=conf_fused,
            )
        )(obj, xywh, cls)
        all_ok = jnp.asarray(True)
    if fallback == "flag":
        return dets, valid, all_ok
    return dets, valid


@partial(
    jax.jit,
    static_argnames=("max_det", "max_cand", "multi_label", "iou_thres"),
)
def non_max_suppression(
    pred: jax.Array,
    conf_thres: float = 0.001,
    iou_thres: float = 0.6,
    max_det: int = 300,
    max_cand: int = 1024,
    multi_label: bool = True,
) -> tuple:
    """NMS for one image's decoded predictions.

    :param pred: (N, 5 + nc) rows [x, y, w, h, obj, cls...] in pixels
        (xywh-center, the decode() output).
    :param conf_thres: candidate confidence gate.
    :param iou_thres: suppression IoU (strictly greater suppresses).
    :param max_det: survivors returned.
    :param max_cand: candidate pool entering suppression (top by confidence).
    :param multi_label: one candidate per (box, class) over the gate, like
        yolov5 val; False keeps only each box's best class.
    :return: (dets (max_det, 6) [x1, y1, x2, y2, conf, cls], valid (max_det,)).

    vmap over images for batches.
    """
    n, no = pred.shape
    nc = no - 5
    obj = pred[:, 4]
    boxes_xy = pred[:, :2]
    boxes_wh = pred[:, 2:4]
    half = boxes_wh * 0.5
    xyxy = jnp.concatenate([boxes_xy - half, boxes_xy + half], axis=1)

    gate = obj > conf_thres
    if multi_label and nc > 1:
        # Two-stage candidate selection: a (box, class)-pair top_k over the
        # full N*nc score matrix is the dominant cost at YOLO sizes
        # (25200 x 80 = 2M entries). Pre-filter boxes by their BEST pair
        # confidence (exact — see nms_split), then rank pairs inside the
        # reduced (max_cand, nc) matrix.
        kb = min(max_cand, n)
        cls_all = pred[:, 5:] * obj[:, None]  # (N, nc)
        best = jnp.max(cls_all, axis=1)
        box_score = jnp.where(gate & (best > conf_thres), best, -1.0)
        best_top, box_pre = topk1d(box_score, kb)
        cls_conf = cls_all[box_pre]  # (kb, nc)
        scores_flat = jnp.where(
            (best_top[:, None] > 0) & (cls_conf > conf_thres), cls_conf, -1.0
        ).reshape(-1)
        k = min(max_cand, scores_flat.shape[0])
        top_scores, top_idx = topk1d(scores_flat, k)
        box_idx = box_pre[top_idx // nc]
        cls_idx = (top_idx % nc).astype(jnp.float32)
    else:
        cls_conf = pred[:, 5:] * obj[:, None]  # (N, nc)
        best_cls = jnp.argmax(cls_conf, axis=1)
        best_conf = jnp.max(cls_conf, axis=1)
        scores = jnp.where(gate & (best_conf > conf_thres), best_conf, -1.0)
        k = min(max_cand, n)
        top_scores, box_idx = topk1d(scores, k)
        cls_idx = best_cls[box_idx].astype(jnp.float32)

    cand_boxes = xyxy[box_idx]
    return _emit(cand_boxes, top_scores, cls_idx, iou_thres, max_det)

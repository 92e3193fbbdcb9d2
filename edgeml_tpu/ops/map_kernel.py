"""Batched dataset-mAP kernel over a fixed detection pool (JAX, TPU-first).

The reference computes dataset mAP (`ap_per_class`, /root/reference/lib/metrics.py:89-148)
thousands of times over *overlapping subsets of the same detections*:
  * reward.py's ORIE Monte-Carlo: 2 mAP evaluations per image over a random
    ensemble of other images (reward.py:16-52) — 10k evaluations for COCO-val;
  * test.py: one full-dataset mAP per offloading ratio, where each image
    contributes either its weak or its strong detections (test.py:27-43).

Both are the same computation: **mAP of a masked subset of a fixed pool**.
This module exploits that. All detections of the dataset (weak and strong
streams of every image) are preprocessed ONCE on the host into per-class,
confidence-sorted, padded arrays (`DetectionPool`). A single jitted kernel,
`map_from_masks`, then maps per-image inclusion masks -> mAP:

  - a masked detection simply never advances the per-class TP/FP cumsums, so
    masked-out rows duplicate the previous precision-recall point and drop out
    of the 101-point interpolation exactly;
  - per-class label counts come from one (num_img,) x (num_img, C) matmul
    against a precomputed label histogram (MXU work, no label concatenation);
  - the whole thing vmaps over thousands of mask vectors (ensemble samples or
    offloading ratios) with zero re-sorting — the confidence order of any
    subset of a sorted pool is the sorted order.

Numerical semantics (101-point COCO interpolation, precision envelope,
`eps=1e-16` recall denominator, classes skipped when unrepresented) replicate
/root/reference/lib/metrics.py:89-148 to float tolerance; oracle parity is
enforced in tests/test_map_kernel.py.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

EPS = 1e-16  # matches the reference's ap_per_class eps


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class DetectionPool:
    """Fixed, per-class confidence-sorted detection pool for a whole dataset.

    Built once on the host from per-image detection tuples; every subsequent
    mAP evaluation is a pure function of per-image inclusion masks.

    Shapes: C = number of classes with at least one detection or label,
    K = max detections of any single class (weak + strong streams combined),
    T = number of IoU thresholds, N = number of images.
    """

    tp: jax.Array  # (C, K, T) bool — TP flags in conf-descending order
    img: jax.Array  # (C, K) int32 — source image of each detection
    strong: jax.Array  # (C, K) bool — True if from the strong detector stream
    valid: jax.Array  # (C, K) bool — padding mask
    hist: jax.Array  # (N, C) float32 — per-image label-class histogram
    class_ids: tuple  # (C,) static — original class id of each row

    def tree_flatten(self):
        # class_ids is aux data and must be hashable/comparable for the jit
        # cache — keep it a tuple, never an ndarray.
        return (self.tp, self.img, self.strong, self.valid, self.hist), (self.class_ids,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, aux[0])

    @property
    def num_images(self) -> int:
        return self.hist.shape[0]

    @property
    def num_iou_thresholds(self) -> int:
        return self.tp.shape[2]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class BucketedPool:
    """A DetectionPool split into per-class-count buckets.

    Per-draw mAP work over a plain pool is C x K with K = the MAX per-class
    detection count — but class counts are heavy-tailed (COCO 'person'
    dominates), so most of the (C, K) tile is padding: at COCO-val-5k scale
    the measured waste is ~4x (K=2688 vs a ~650 mean count). Splitting the
    classes into a few buckets, each padded only to ITS max count (rounded
    to the 128-lane tile), cuts sum_b C_b*K_b without changing any per-class
    AP: every class keeps exactly its rows in the same confidence order, and
    the dataset mean just accumulates per-bucket partial sums (float
    reassociation only — parity pinned by tests/test_map_kernel.py).

    Built by build_pool(buckets=...); consumed transparently by
    map_from_masks / map_per_threshold / orie_map_pair / dataset_map.
    """

    pools: tuple  # tuple[DetectionPool, ...]

    def tree_flatten(self):
        return (self.pools,), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0])

    @property
    def num_images(self) -> int:
        return self.pools[0].num_images

    @property
    def num_iou_thresholds(self) -> int:
        return self.pools[0].num_iou_thresholds


def _bucket_splits(counts: np.ndarray, buckets: int) -> list[np.ndarray]:
    """Partition class indices into <= `buckets` groups minimizing
    sum_b C_b * ceil128(max count in b). Classes sorted by count descending;
    contiguous prefixes are optimal for this cost (a bucket's K is its
    largest member), so exhaustive split-point search over the sorted order
    suffices (C <= ~100: trivial)."""
    order = np.argsort(-counts, kind="stable")
    sc = counts[order]
    c = len(sc)
    r128 = lambda k: max(-(-int(k) // 128) * 128, 128)
    cost_seg = lambda i, j: (j - i) * r128(sc[i])  # [i, j) — sc[i] is max

    best: dict[tuple[int, int], tuple[int, list[int]]] = {}

    def solve(i, b):  # min cost covering [i, c) with <= b segments
        if i >= c:
            return 0, []
        if b == 1:
            return cost_seg(i, c), [c]
        if (i, b) in best:
            return best[(i, b)]
        res = None
        # descending j: on cost ties prefer the LONGEST first segment, i.e.
        # the fewest actual splits (tiny pools otherwise split for no gain)
        for j in range(c, i, -1):
            sub, cuts = solve(j, b - 1)
            tot = cost_seg(i, j) + sub
            if res is None or tot < res[0]:
                res = (tot, [j] + cuts)
        best[(i, b)] = res
        return res

    _, cuts = solve(0, max(buckets, 1))
    out, start = [], 0
    for j in cuts:
        if j > start:
            out.append(order[start:j])
        start = j
    return out


def build_pool(
    weak_data, strong_data, labels, num_classes: int | None = None,
    buckets: int | None = None,
):
    """Host-side construction of a DetectionPool.

    :param weak_data: list over images of (tp (n, T) bool, conf (n,), cls (n,))
        — the same processed-output triples the reference's `set_data` emits
        (/root/reference/lib/data.py:46-84).
    :param strong_data: same, for the strong detector.
    :param labels: list over images of (m,) integer label-class arrays
        (possibly empty).
    :param num_classes: optional total class count; inferred if omitted.
    :param buckets: max class-count buckets (see BucketedPool). None takes
        the module default POOL_BUCKETS; 1 forces a single flat pool.
    :return: a DetectionPool (or BucketedPool) on the default device.
    """
    if buckets is None:
        buckets = POOL_BUCKETS
    n_img = len(labels)
    assert len(weak_data) == n_img and len(strong_data) == n_img

    all_cls: list[np.ndarray] = []
    for tp, conf, cls in list(weak_data) + list(strong_data):
        all_cls.append(np.asarray(cls, dtype=np.int64).reshape(-1))
    for l in labels:
        all_cls.append(np.asarray(l, dtype=np.int64).reshape(-1))
    observed = np.unique(np.concatenate(all_cls)) if all_cls else np.array([], np.int64)
    if num_classes is not None:
        class_ids = np.arange(num_classes, dtype=np.int64)
    else:
        class_ids = observed
    cls_pos = {int(c): i for i, c in enumerate(class_ids)}
    C = max(len(class_ids), 1)

    n_thresh = 1
    for tp, _, _ in list(weak_data) + list(strong_data):
        tp = np.asarray(tp)
        if tp.size:
            n_thresh = tp.shape[1]
            break

    # Flatten both streams into one row table.
    rows_cls, rows_conf, rows_tp, rows_img, rows_strong = [], [], [], [], []
    for is_strong, stream in ((False, weak_data), (True, strong_data)):
        for i, (tp, conf, cls) in enumerate(stream):
            cls = np.asarray(cls, dtype=np.int64).reshape(-1)
            if cls.size == 0:
                continue
            tp = np.asarray(tp, dtype=bool).reshape(cls.size, -1)
            rows_cls.append(np.array([cls_pos[int(c)] for c in cls], np.int64))
            rows_conf.append(np.asarray(conf, np.float64).reshape(-1))
            rows_tp.append(tp)
            rows_img.append(np.full(cls.size, i, np.int32))
            rows_strong.append(np.full(cls.size, is_strong, bool))

    if rows_cls:
        f_cls = np.concatenate(rows_cls)
        f_conf = np.concatenate(rows_conf)
        f_tp = np.concatenate(rows_tp)
        f_img = np.concatenate(rows_img)
        f_strong = np.concatenate(rows_strong)
    else:
        f_cls = np.zeros(0, np.int64)
        f_conf = np.zeros(0)
        f_tp = np.zeros((0, n_thresh), bool)
        f_img = np.zeros(0, np.int32)
        f_strong = np.zeros(0, bool)

    counts = np.bincount(f_cls, minlength=C)
    K = max(int(counts.max()) if counts.size else 1, 1)
    # Round the lane axis up to the VPU lane width (128) — aligned tiles on
    # TPU, and far fewer distinct shapes hitting the jit cache.
    K = -(-K // 128) * 128

    tp_a = np.zeros((C, K, n_thresh), bool)
    img_a = np.zeros((C, K), np.int32)
    strong_a = np.zeros((C, K), bool)
    valid_a = np.zeros((C, K), bool)
    for c in range(C):
        sel = np.nonzero(f_cls == c)[0]
        if sel.size == 0:
            continue
        # Confidence-descending; stable so row order breaks exact ties the
        # same way run-to-run (the reference's per-sample quicksort leaves
        # exact-tie order unspecified).
        order = sel[np.argsort(-f_conf[sel], kind="stable")]
        k = order.size
        tp_a[c, :k] = f_tp[order]
        img_a[c, :k] = f_img[order]
        strong_a[c, :k] = f_strong[order]
        valid_a[c, :k] = True

    hist = np.zeros((n_img, C), np.float32)
    for i, l in enumerate(labels):
        l = np.asarray(l, dtype=np.int64).reshape(-1)
        for c in l:
            hist[i, cls_pos[int(c)]] += 1.0

    def mk(cls_sel, k_cap):
        return DetectionPool(
            tp=jnp.asarray(tp_a[cls_sel, :k_cap]),
            img=jnp.asarray(img_a[cls_sel, :k_cap]),
            strong=jnp.asarray(strong_a[cls_sel, :k_cap]),
            valid=jnp.asarray(valid_a[cls_sel, :k_cap]),
            hist=jnp.asarray(hist[:, cls_sel]),
            class_ids=tuple(int(class_ids[c]) for c in cls_sel),
        )

    if buckets is not None and buckets > 1 and C > 1:
        groups = _bucket_splits(counts.astype(np.int64), buckets)
        if len(groups) > 1:
            pools = tuple(
                mk(g, min(max(-(-int(counts[g].max()) // 128) * 128, 128), K))
                for g in groups
            )
            return BucketedPool(pools)

    return DetectionPool(
        tp=jnp.asarray(tp_a),
        img=jnp.asarray(img_a),
        strong=jnp.asarray(strong_a),
        valid=jnp.asarray(valid_a),
        hist=jnp.asarray(hist),
        class_ids=tuple(int(c) for c in class_ids),
    )


def ap_interp101(tpc: jax.Array, fpc: jax.Array, n_labels: jax.Array) -> jax.Array:
    """AP (101-point COCO interpolation) from masked TP/FP cumsums.

    :param tpc: (K,) cumulative true positives along the conf-sorted pool axis
        (masked-out rows repeat the previous value).
    :param fpc: (K,) cumulative false positives, same convention.
    :param n_labels: scalar number of ground-truth objects of this class.
    :return: scalar AP, matching the reference's `compute_ap(..., 'interp')`
        (/root/reference/lib/metrics.py:127-148) including the [0,1]/[1,0]
        sentinels and the precision envelope.
    """
    n_pred = tpc + fpc  # (K,) cumulative prediction count
    precision = tpc / jnp.maximum(n_pred, EPS)
    # Masked-out rows never advance the cumsums, so their (recall, precision)
    # repeats the previous real point exactly. The reverse running max then
    # forward-fills the precision envelope through them for free: a masked row
    # between points k and k+1 sees max(prec_k, env_{k+1}) = env_k.
    env = jax.lax.cummax(precision, axis=0, reverse=True)
    # Rows before the first real point (n_pred == 0) sit at recall 0 and must
    # carry the leading sentinel precision 1.0 so the (0,1) -> (r1, env1) ramp
    # of np.interp survives duplicated x values (np.interp takes the LAST
    # duplicate as the left neighbour of an interval).
    y_curve = jnp.where(n_pred > 0, env, 1.0)

    # The reference evaluates np.interp of the envelope curve at the f64 grid
    # k/100 and trapz-integrates (metrics.py:141-143). Two tricks make the
    # same 101 values exact AND fast on TPU:
    #
    # 1. SCALED INTEGER recall axis: recall ties (tpc/n_labels == k/100) hit
    #    np.interp's exact-duplicate branch in f64, which f32 division cannot
    #    reproduce. Comparing 100*tpc against k*n_labels instead keeps every
    #    comparison on exact integers below 2^24.
    # 2. CLOSED-FORM SEGMENT SUMS instead of per-grid-point search: each
    #    consecutive-row segment [x_j, x_{j+1}) of the curve owns the grid
    #    points ceil(x_j/nl) <= k < ceil(x_{j+1}/nl), whose interpolated
    #    values form an arithmetic series — O(K) elementwise work total,
    #    no searchsorted, no scatter. Left-closed intervals reproduce
    #    np.interp's duplicate-x semantics (the LAST duplicate is the left
    #    neighbour, the FIRST duplicate the right one), and the grid point
    #    k=100 coincides with the trailing (1, 0) sentinel, hence y_100 = 0.
    nl = jnp.maximum(n_labels, 1.0)  # guard the n_labels==0 row; zeroed below
    zero = jnp.zeros((1,), tpc.dtype)
    one = jnp.ones((1,), tpc.dtype)
    x = jnp.concatenate([zero, tpc * 100.0, nl[None] * 100.0])  # (K+2,)
    y = jnp.concatenate([one, y_curve, zero])

    x0, x1 = x[:-1], x[1:]
    y0, y1 = y[:-1], y[1:]
    klo = jnp.ceil(x0 / nl)
    khi = jnp.minimum(jnp.ceil(x1 / nl), 100.0)
    m = jnp.maximum(khi - klo, 0.0)  # grid points inside [x_j, x_{j+1})
    has = (m > 0.0) & (x1 > x0)
    slope = jnp.where(has, (y1 - y0) / jnp.maximum(x1 - x0, 1.0), 0.0)
    sum_k = (klo + khi - 1.0) * m * 0.5  # sum of k over the segment
    seg = y0 * m + slope * (nl * sum_k - x0 * m)
    total = jnp.sum(jnp.where(m > 0.0, seg, 0.0))
    # y at grid point 0 (for the trapezoid end correction): the unique
    # segment with klo == 0 and m > 0 contains it.
    owns0 = (klo == 0.0) & (m > 0.0)
    y_at_0 = jnp.sum(jnp.where(owns0, y0 - slope * x0, 0.0))
    ap = (total - 0.5 * y_at_0) * 0.01
    # Reference skips classes with no predictions (ap_per_class:110-111).
    return jnp.where(n_pred[-1] > 0, ap, 0.0)


@partial(jax.jit, static_argnames=())
def map_from_masks(
    pool: DetectionPool,
    weak_sel: jax.Array,
    strong_sel: jax.Array,
    label_sel: jax.Array,
) -> jax.Array:
    """Dataset mAP for one subset selection. vmap over mask batches for many.

    :param pool: the fixed detection pool.
    :param weak_sel: (N,) bool — images contributing their weak detections.
    :param strong_sel: (N,) bool — images contributing their strong detections.
    :param label_sel: (N,) bool — images contributing their ground-truth labels.
    :return: scalar mAP = mean AP over (classes with labels) x (IoU thresholds),
        NaN when no selected image has labels (the reference maps NaN -> 0 at
        the reward level, reward.py:86).
    """
    sum_ap, n_has = _ap_sums(pool, weak_sel, strong_sel, label_sel)
    denom = n_has * sum_ap.shape[0]
    return jnp.sum(sum_ap) / denom  # NaN when denom == 0


def map_per_threshold(
    pool: DetectionPool,
    weak_sel: jax.Array,
    strong_sel: jax.Array,
    label_sel: jax.Array,
) -> jax.Array:
    """Per-IoU-threshold mAP (T,) for one subset selection — the (C, T) AP
    matrix is computed once; no per-threshold pool re-slicing needed."""
    sum_ap, n_has = _ap_sums(pool, weak_sel, strong_sel, label_sel)
    return sum_ap / n_has


def _ap_sums(pool, weak_sel, strong_sel, label_sel):
    """(sum over classes of AP*has (T,), number of labelled classes) for one
    subset selection. BucketedPool: per-bucket partial sums accumulate —
    the same per-class terms, reassociated."""
    if isinstance(pool, BucketedPool):
        parts = [
            _ap_sums(p, weak_sel, strong_sel, label_sel) for p in pool.pools
        ]
        return (
            jnp.sum(jnp.stack([p[0] for p in parts]), axis=0),
            jnp.sum(jnp.stack([p[1] for p in parts])),
        )
    ap, has_labels = _ap_matrix(pool, weak_sel, strong_sel, label_sel)
    return jnp.sum(ap * has_labels[:, None], axis=0), jnp.sum(has_labels)


def _ap_matrix(pool, weak_sel, strong_sel, label_sel):
    """(AP (C, T), has_labels (C,)) for one subset selection."""
    dtype = jnp.float32
    nt = jnp.matmul(label_sel.astype(dtype), pool.hist, preferred_element_type=dtype)  # (C,)
    sel = jnp.where(pool.strong, strong_sel[pool.img], weak_sel[pool.img])
    return _ap_from_sel(pool, sel, nt), (nt > 0).astype(dtype)


POOL_BUCKETS = 1
"""Default class-count bucketing for build_pool (see BucketedPool): 1 =
one flat (C, K) pool; b > 1 = up to b per-class-count buckets, cutting the
per-draw mAP work from C*K_max toward the true detection mass (~4x less
padding at COCO-val-5k scale, where K_max=2688 is set by 'person' alone).
Read at pool-BUILD time (host), not trace time. A/B: tools/exp_bucket.py."""

MM_CUMSUM = "blocked"
"""Route _ap_from_sel's per-draw cumsums through triangular MXU matmuls
instead of the VPU lane scan. Bit-exact (operands are 0/1 — exact in the
MXU's bf16 operand rounding — and every partial sum is an integer < 2^24
accumulated in f32, so summation order cannot matter). Full-matmul form
measured +8.8% over the scan (r4 tools/exp_orie2.py stage 3c vs 3: 27.18
vs 29.56 ms/512-draw batch); default "blocked" since r5i (tools/
exp_cumblk.py): neutral at the N=2048 bench scale (16,132 vs 16,028 img/s)
and +10% at COCO-val-5k scale (7,400 vs 6,716 — the O(K^2) triangular
term was the measured scale cliff), bit-exact on-device at both. Read at
trace time: flip + clear_cache of jitted callers (reward.orie._orie_batch,
map_from_masks).

Values: True — one (K, K) triangular matmul (O(K^2) FLOPs per row);
"blocked" — two-level blocked form (within-block (blk, blk) triangular +
block-offset pass): O(K*blk) FLOPs per row, a ~K/blk FLOP cut that grows
with the pool (K=2688 at COCO-val-5k scale vs 1152 at the N=2048 bench
scale — the measured ORIE scale cliff is exactly this K^2 term). Exact
for the same integer reasons, per level (block sums <= blk=128 are exact
bf16 integers). False — VPU lane scan. A/B: tools/exp_cumblk.py."""


def _cumsum01_blocked(x: jax.Array, blk: int = 128) -> jax.Array:
    """Inclusive 0/1 cumsum along the last axis via two exact levels:
    within-block triangular matmuls + a block-offset pass (see MM_CUMSUM
    "blocked"). Requires K % blk == 0 (build_pool rounds K to 128)."""
    k = x.shape[-1]
    assert k % blk == 0, (k, blk)
    nb = k // blk
    flat = x.reshape(-1, nb, blk).astype(jnp.bfloat16)
    tri = (
        jax.lax.iota(jnp.int32, blk)[:, None]
        <= jax.lax.iota(jnp.int32, blk)[None, :]
    ).astype(jnp.bfloat16)
    within = jax.lax.dot_general(
        flat, tri, (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (rows, nb, blk) inclusive within-block counts
    sums = within[..., -1]  # (rows, nb) block sums <= blk (bf16-exact)
    tri2 = (
        jax.lax.iota(jnp.int32, nb)[:, None]
        < jax.lax.iota(jnp.int32, nb)[None, :]
    ).astype(jnp.bfloat16)  # STRICT: exclusive block offsets
    offs = jax.lax.dot_general(
        sums.astype(jnp.bfloat16), tri2, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (rows, nb)
    return (within + offs[..., None]).reshape(x.shape)

MM_LM_ROWS = False
"""Route orie_map_pair's per-draw (C, K) mask gather through a one-hot
matmul against the constant image-membership matrix. Exact for the same
0/1-operand reason. Default OFF: measured v5e round 4 (tools/exp_orie2.py
stage 2m vs 2: 8.37 vs 6.92 ms; 3m vs 3: 30.91 vs 29.56 ms) — the one-hot
build costs more than the gather saves at the production shape, and the
(C*K, N) constant would approach ~2 GB at COCO-val 5k scale. Same
trace-time caveat as MM_CUMSUM."""


def _cumsum01_lastaxis(x: jax.Array) -> jax.Array:
    """Inclusive cumsum along the last axis of a 0/1-valued f32 array as one
    (rows, K) @ (K, K) upper-triangular matmul — exact integer counts (see
    MM_CUMSUM), MXU instead of the log2(K)-pass VPU shifted-add scan."""
    k = x.shape[-1]
    tri = (
        jax.lax.iota(jnp.int32, k)[:, None] <= jax.lax.iota(jnp.int32, k)[None, :]
    ).astype(jnp.bfloat16)
    flat = x.reshape(-1, k).astype(jnp.bfloat16)
    out = jax.lax.dot_general(
        flat, tri, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    return out.reshape(x.shape)


def _ap_from_sel(pool, sel, nt):
    """AP (C, T) from an already-gathered per-detection inclusion mask.

    Layout note: the pool stores tp as (C, K, T) (T = IoU thresholds, often
    1), but every cumsum/interp pass here runs along K — keeping K in the
    MINOR (lane) axis matters on TPU, where a (K, 1) minor pair tiles into
    (8, 128) blocks that are 99% padding. The transpose to (C, T, K) is a
    loop constant (the pool is closed over, not batched), so vmapped callers
    (the ORIE Monte-Carlo batch) pay it once, not per draw."""
    dtype = jnp.float32
    m = (sel & pool.valid).astype(dtype)  # (C, K)
    tp_t = jnp.moveaxis(pool.tp, 2, 1)  # (C, T, K)

    if MM_CUMSUM:
        cs = (_cumsum01_blocked if MM_CUMSUM == "blocked"
              else _cumsum01_lastaxis)
        inc = tp_t.astype(dtype) * m[:, None, :]  # (C, T, K) 0/1
        tpc = cs(inc)
        npred = cs(m)  # (C, K)
        fpc = npred[:, None, :] - tpc
        per_t = jax.vmap(ap_interp101, in_axes=(0, 0, None))
        return jax.vmap(per_t)(tpc, fpc, nt)  # (C, T)

    def per_class(tp_tk, m_c, nt_c):
        # tp_tk: (T, K); m_c: (K,); nt_c: scalar
        inc = tp_tk.astype(dtype) * m_c[None, :]
        tpc = jnp.cumsum(inc, axis=1)  # (T, K) — scan along lanes
        npred = jnp.cumsum(m_c)  # (K,)
        fpc = npred[None, :] - tpc
        return jax.vmap(lambda t, f: ap_interp101(t, f, nt_c))(tpc, fpc)

    return jax.vmap(per_class)(tp_t, m, nt)  # (C, T)


def orie_map_pair(pool: DetectionPool, in_ens: jax.Array, target: jax.Array):
    """(weak_map, strong_map) for one ORIE draw, sharing the per-detection
    mask gather and the label histogram between the two evaluations.

    Equivalent to
        map_from_masks(pool, lmask, zeros, lmask),
        map_from_masks(pool, in_ens, is_target, lmask)
    with lmask = in_ens | is_target — but `is_target` rows are a comparison
    against the constant pool.img array (no gather), so the pair costs ONE
    (C, K) mask gather and ONE (N,) x (N, C) histogram matmul instead of
    four and two.

    :param in_ens: (N,) bool — ensemble membership. The target is treated as
        excluded regardless: both selections mask with `~is_target` (free
        under XLA fusion), so a caller accidentally passing a mask containing
        the target still gets the contract semantics (ensemble = in_ens
        minus target), not a corrupted strong-eval weak selection.
    :param target: scalar int — the target image index.
    """
    if isinstance(pool, BucketedPool):
        parts = [_pair_sums(p, in_ens, target) for p in pool.pools]
        wsum = jnp.sum(jnp.stack([p[0] for p in parts]))
        ssum = jnp.sum(jnp.stack([p[1] for p in parts]))
        hsum = jnp.sum(jnp.stack([p[2] for p in parts]))
        denom = hsum * pool.num_iou_thresholds
        return wsum / denom, ssum / denom
    wsum, ssum, hsum = _pair_sums(pool, in_ens, target)
    denom = hsum * pool.tp.shape[2]
    return wsum / denom, ssum / denom


def _pair_sums(pool: DetectionPool, in_ens: jax.Array, target: jax.Array):
    """(sum_C,T ap_weak*has, sum_C,T ap_strong*has, sum has) for one draw —
    the bucket-combinable core of orie_map_pair."""
    dtype = jnp.float32
    lmask = in_ens | (jnp.arange(pool.num_images) == target)
    nt = jnp.matmul(lmask.astype(dtype), pool.hist, preferred_element_type=dtype)
    if MM_LM_ROWS:
        # One-hot matmul instead of the gather: vmapped callers batch the
        # (1, N) @ (N, C*K) dots into one (B, N) @ (N, C*K) — the constant
        # membership matrix streams at MXU rate once per draw BATCH, where
        # the gather pays its per-element cost per draw. Outputs are exactly
        # 0/1 (one 1 per column of the membership matrix).
        img_flat = pool.img.reshape(-1)  # (C*K,) constant
        onehot = (
            img_flat[None, :] == jnp.arange(pool.num_images)[:, None]
        ).astype(jnp.bfloat16)
        v = jax.lax.dot_general(
            lmask.astype(jnp.bfloat16)[None, :], onehot,
            (((1,), (0,)), ((), ())), preferred_element_type=dtype,
        )[0]
        lm_rows = (v > 0.5).reshape(pool.img.shape)
    else:
        lm_rows = lmask[pool.img]  # (C, K) — the single gather
    is_t = pool.img == target  # (C, K) compare vs a constant array
    # weak eval: weak_sel = lmask, strong_sel = 0
    sel_weak = lm_rows & ~pool.strong
    # strong eval: weak_sel = in_ens = lmask & ~is_target, strong_sel = is_target
    sel_strong = jnp.where(pool.strong, is_t, lm_rows & ~is_t)
    has = (nt > 0).astype(dtype)

    def ap_sum(sel):
        ap = _ap_from_sel(pool, sel, nt)
        return jnp.sum(ap * has[:, None])

    return ap_sum(sel_weak), ap_sum(sel_strong), jnp.sum(has)


def dataset_map(pool: DetectionPool, offload_mask: jax.Array) -> jax.Array:
    """mAP when `offload_mask[i]` images use strong detections, others weak.

    This is the inner evaluation of the reference's test.py:40-42.
    """
    n = pool.num_images
    ones = jnp.ones((n,), bool)
    return map_from_masks(pool, ~offload_mask, offload_mask, ones)

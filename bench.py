"""Headline benchmark: ORIE reward throughput (images/sec), TPU vs reference.

Reproduces the reference's hot path (/root/reference/reward.py:16-52: per
image, sample a 1000-image ensemble and evaluate dataset mAP twice) on a
synthetic COCO-scale workload, and compares:

  * baseline: a faithful NumPy/ThreadPoolExecutor implementation of the
    reference algorithm (re-derived, same math: per-sample concatenation,
    confidence sort, per-class PR curves, 101-point interpolated AP),
    measured on a subset and extrapolated (it is >100x slower);
  * ours: the batched DetectionPool kernel on the default JAX device
    (the real TPU chip under the driver; warmup excluded so the one-time
    XLA compile is not billed to steady-state throughput).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Diagnostics go to stderr.
"""

import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

# Workload shape (COCO-val-like): override via env for experiments.
N_IMG = int(os.environ.get("BENCH_N_IMG", 2048))
N_CLS = int(os.environ.get("BENCH_N_CLS", 80))
DETS_PER_IMG = int(os.environ.get("BENCH_DETS", 16))
LABELS_PER_IMG = int(os.environ.get("BENCH_LABELS", 8))
NUM_ENSEMBLE = int(os.environ.get("BENCH_ENSEMBLE", 1000))
BASELINE_SUBSET = int(os.environ.get("BENCH_BASELINE_SUBSET", 24))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_workload(rng, n_img=None):
    """set_data-format triples with matching-consistent TP flags."""
    weak, strong, labels = [], [], []
    for _ in range(N_IMG if n_img is None else n_img):
        m = rng.integers(max(LABELS_PER_IMG // 2, 1), LABELS_PER_IMG * 2 + 1)
        lab = rng.integers(0, N_CLS, size=m)
        labels.append(lab)
        for out, skill in ((weak, 0.35), (strong, 0.6)):
            n = rng.integers(max(DETS_PER_IMG // 2, 1), DETS_PER_IMG * 2 + 1)
            cls = rng.integers(0, N_CLS, size=n)
            tp = rng.random((n, 1)) < skill
            for c in np.unique(cls):
                cap = int(np.sum(lab == c))
                rows = np.nonzero(cls == c)[0]
                hot = rows[tp[rows, 0]]
                if len(hot) > cap:
                    tp[hot[cap:], 0] = False
            out.append((tp, rng.random(n), cls))
    return weak, strong, labels


# --- Reference-equivalent NumPy baseline (re-derived from the math spec) ----


def np_ap_table(tp, conf, cls, target_cls):
    order = np.argsort(-conf)
    tp, cls = tp[order], cls[order]
    classes, counts = np.unique(target_cls, return_counts=True)
    ap = np.zeros((len(classes), tp.shape[1]))
    grid = np.linspace(0, 1, 101)
    for ci, c in enumerate(classes):
        sel = cls == c
        if not sel.any():
            continue
        for t in range(tp.shape[1]):
            f = tp[sel, t].astype(float)
            tpc, fpc = np.cumsum(f), np.cumsum(1 - f)
            rec = tpc / (counts[ci] + 1e-16)
            pre = tpc / (tpc + fpc)
            xs = np.concatenate(([0.0], rec, [1.0]))
            ys = np.concatenate(([1.0], pre, [0.0]))
            ys = np.flip(np.maximum.accumulate(np.flip(ys)))
            ap[ci, t] = np.trapezoid(np.interp(grid, xs, ys), grid)
    return ap


def np_orie_one(i, weak, strong, labels, num_ensemble, rng):
    n = len(labels)
    e = min(num_ensemble, n - 1)
    pool_idx = np.arange(n - 1)
    if i < n - 1:
        pool_idx[i:] += 1
    ens = rng.permutation(pool_idx)[:e]
    tgt = np.concatenate([labels[s] for s in ens] + [labels[i]])
    parts = [weak[s] for s in ens]
    weak_all = parts + [weak[i]]
    strong_all = parts + [strong[i]]
    maps = []
    for dets in (weak_all, strong_all):
        tp = np.concatenate([d[0] for d in dets])
        conf = np.concatenate([d[1] for d in dets])
        cls = np.concatenate([d[2] for d in dets])
        maps.append(np.mean(np_ap_table(tp, conf, cls, tgt)))
    return (maps[1] - maps[0]) * (e + 1)


def run_baseline(weak, strong, labels):
    rng = np.random.default_rng(0)
    idx = list(range(BASELINE_SUBSET))
    start = time.perf_counter()
    with ThreadPoolExecutor() as pool:  # the reference's fan-out (reward.py:78)
        list(
            pool.map(
                lambda i: np_orie_one(i, weak, strong, labels, NUM_ENSEMBLE, rng),
                idx,
            )
        )
    elapsed = time.perf_counter() - start
    ips = BASELINE_SUBSET / elapsed
    log(
        f"baseline (NumPy/TPE, {BASELINE_SUBSET} imgs): {elapsed:.2f}s "
        f"-> {ips:.2f} img/s"
    )
    return ips


def run_ours(weak, strong, labels, tag=""):
    """Median-of-BENCH_ORIE_REPS throughput (default 3): run-to-run spread
    across sessions was a 40% band (PERF.md headline row, chip-state), so a
    single timed run is not a trustworthy headline. Returns
    (median img/s, sorted per-run list)."""
    from edgeml_tpu.ops.map_kernel import build_pool
    from edgeml_tpu.reward import orie_rewards

    import jax

    n_img = len(labels)
    log(f"devices: {jax.devices()}")
    t0 = time.perf_counter()
    pool = build_pool(weak, strong, labels)
    log(
        f"pool build{tag} (host prep): {time.perf_counter() - t0:.2f}s, "
        f"shape C={pool.tp.shape[0]} K={pool.tp.shape[1]}"
    )

    batch = os.environ.get("BENCH_ORIE_BATCH")
    batch = int(batch) if batch else None

    # Warm up: compile the batched kernel (one-time, cached).
    t0 = time.perf_counter()
    orie_rewards(weak, strong, labels, NUM_ENSEMBLE, seed=0, pool=pool, batch=batch)
    log(f"warmup{tag} incl. compile: {time.perf_counter() - t0:.2f}s")

    reps = int(os.environ.get("BENCH_ORIE_REPS", 3))
    runs = []
    for rep in range(reps):
        t0 = time.perf_counter()
        r = orie_rewards(weak, strong, labels, NUM_ENSEMBLE, seed=1 + rep,
                         pool=pool, batch=batch)
        elapsed = time.perf_counter() - t0
        runs.append(round(n_img / elapsed, 1))
        log(f"ours{tag} ({n_img} imgs, rep {rep}): {elapsed:.2f}s -> "
            f"{runs[-1]:.1f} img/s (reward mean {r.mean():.4f})")
    runs.sort()
    med = runs[len(runs) // 2]
    log(f"ours{tag} median of {reps}: {med:.1f} img/s (spread {runs})")
    return med, runs


def run_yolo(variant=None, b=None, iters=None, int8=None):
    """YOLOv5 640 end-to-end serving throughput (backbone + split decode +
    class-aware NMS at conf 1e-5, i.e. a full 1024-candidate pool per image).

    Methodology: launches are CHAINED through a scalar accumulator so each
    step's completion gates the next — async dispatch or relay-side caching
    of identical (program, args) pairs cannot inflate the number. Images are
    generated on device from the loop index for the same reason.
    """
    import jax
    import jax.numpy as jnp

    from edgeml_tpu.models.infer import _detect_pipe_step, _zero_carry
    from edgeml_tpu.models.yolov5 import YoloV5

    if b is None:
        b = int(os.environ.get("BENCH_YOLO_BATCH", 128))
    if iters is None:
        iters = int(os.environ.get("BENCH_YOLO_ITERS", 10))
    # BENCH_YOLO_VARIANT=m measures the reference's STRONG detector instead
    # (wider channels -> higher trunk MFU; the headline metric stays n).
    if variant is None:
        variant = os.environ.get("BENCH_YOLO_VARIANT", "n")
    net = YoloV5(variant=variant, num_classes=80, img_size=640)
    params, stats = net.init(jax.random.PRNGKey(0))
    meta = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]]), (b, 1))
    hw = jnp.tile(jnp.asarray([[640.0, 640.0]]), (b, 1))

    from edgeml_tpu.utils.synth import hash_uniform

    # BN calibration: raw random-init weights leave the head with ~zero
    # input (activations decay ~40x/stage), scoring every candidate at its
    # bias constant — a degenerate NMS workload of massive exact ties.
    # Calibrated stats give O(1) activations and a realistic spread score
    # distribution (see models/yolov5.py calibrate_bn).
    from edgeml_tpu.models.yolov5 import calibrate_bn

    t0 = time.perf_counter()
    stats = calibrate_bn(
        net, params, stats, lambda i: hash_uniform(9000 + i, (8, 640, 640, 3))
    )
    jax.block_until_ready(stats)
    log(f"bn calibration (6 train-mode passes): {time.perf_counter() - t0:.1f}s")

    def fresh_images(seed):
        """Per-step synthetic images from a cheap on-device hash: threefry
        (jax.random.uniform) costs ~8 ms per (128, 640, 640, 3) batch on
        v5e — 15% of the serving step — which would bill RNG, not the
        detector, to the throughput number. Fresh per-iteration values
        still defeat relay-side result caching."""
        x = hash_uniform(seed, (b, 640, 640, 3))
        if os.environ.get("BENCH_YOLO_U8", "0") == "1":
            # the uint8 deployment input interface (models/infer.py):
            # quantize in-program — NOTE this understates the u8 win
            # (in-jit generation can fuse); tools/exp_u8serve.py measures
            # the honest arg-crossing version.
            x = (x * 255.0).astype(jnp.uint8)
        return x

    variants = [("f32", None, None), ("bf16", jnp.bfloat16, None)]
    if int8 is None:
        int8 = os.environ.get("BENCH_YOLO_INT8", "1") == "1"
    if int8:
        # int8 post-training-quantized trunk + keyed bf16 NMS tail (the
        # --int8 --bf16 serving mode, models/quant.py).
        from edgeml_tpu.models.quant import prepare_int8

        t0 = time.perf_counter()
        q8tree = prepare_int8(
            net, params, stats,
            lambda i: hash_uniform(7000 + i, (16, 640, 640, 3)), iters=2,
        ).tree
        float(jnp.sum(jax.tree_util.tree_leaves(q8tree)[0].astype(jnp.float32)))
        log(f"int8 prep (calibration + weight quant): "
            f"{time.perf_counter() - t0:.1f}s")
        variants.append(("int8", jnp.bfloat16, q8tree))

    out = {}
    for name, dt, q8 in variants:
        # the production serving loop: software-pipelined steps (this
        # batch's trunk + previous batch's NMS tail in one program). The
        # step's NMS is the fast pair-selection pool; per-step exactness-
        # certificate failures are counted, and each one is billed the
        # measured cost of the host-side exact redo (run_detection's
        # protocol for a failed batch) so the reported number is the
        # throughput of the EXACT pipeline, not the optimistic fast path.
        @jax.jit
        def step(carry, seed, dt=dt, q8=q8):
            prev, acc, nfail = carry
            imgs = fresh_images(seed)
            nxt, d, v, ok = _detect_pipe_step(
                net, params, stats, prev, imgs, meta, hw, 1e-5, 0.6,
                dtype=dt, q8=q8,
            )
            return (nxt, acc + d.sum(), nfail + (1 - ok.astype(jnp.int32)))

        # q8 serving keeps the decoded carry even under the raw-tail default
        zero = (_zero_carry(net, b, 640, dt, raw=False if q8 else None),
                jnp.zeros(()), jnp.zeros((), jnp.int32))
        t0 = time.perf_counter()
        carry = step(zero, 0)
        # float() fetches, NOT block_until_ready: on the axon backend block
        # is a no-op for many programs (measured: a 134M-element launch
        # "blocks" in 30 us); only a value fetch provably forces completion.
        float(carry[1])
        log(f"yolo {name} warmup incl. compile: {time.perf_counter() - t0:.1f}s")
        t0 = time.perf_counter()
        for i in range(iters):
            carry = step(carry, 1 + i)
        float(carry[1])
        elapsed = time.perf_counter() - t0
        nfail = int(carry[2])
        redo_s = 0.0
        if nfail:
            from edgeml_tpu.models.infer import exact_redo

            held = carry[0]  # (pred, meta, hw) of the last batch
            float(exact_redo(held, 1e-5, 0.6)[0].sum())  # compile + force
            tr = time.perf_counter()
            float(exact_redo(held, 1e-5, 0.6)[0].sum())
            redo_s = time.perf_counter() - tr
            log(f"yolo {name}: {nfail}/{iters} certificate failures, "
                f"billing {redo_s * 1e3:.1f} ms exact redo each")
        total = elapsed + nfail * redo_s
        ips = b * iters / total
        log(f"yolov5{variant} inference {name} (B={b}): {ips:.0f} img/s "
            f"({nfail}/{iters} steps redone exactly)")
        out[name] = round(ips, 1)
        out[name + "_redo_steps"] = nfail
    return out


def run_families():
    """Anchor-family serving throughput (SSDLite320-MNv3, RetinaNet-R50-FPNv2,
    Faster R-CNN-R50-FPNv2) — the reference's torch_models/detect.py model
    list (/root/reference/torch_models/detect.py:15-42) at B=16, random
    weights, chained-launch + value-fetch methodology (see run_yolo).

    f32 for all three (CLAUDE.md: SSD f32 convs already run at bf16 MXU
    speed at DEFAULT precision) plus the bf16 backbone knob for RetinaNet,
    where it is a measured win."""
    import jax
    import jax.numpy as jnp

    from edgeml_tpu.models.infer import _detect_generic
    from edgeml_tpu.utils.synth import hash_uniform

    b = int(os.environ.get("BENCH_FAM_BATCH", 16))
    iters = int(os.environ.get("BENCH_FAM_ITERS", 6))
    out = {}

    def one(tag, net, params, stats, size, dt, q8=None):
        @jax.jit
        def step(acc, seed):
            imgs = hash_uniform(seed, (b, size, size, 3))
            dets, valid = _detect_generic(
                net, params, stats, imgs, 0.05, 0.5, dtype=dt, q8=q8
            )
            return acc + dets.sum() * 1e-9 + valid.sum() * 1e-9

        t0 = time.perf_counter()
        acc = step(jnp.zeros(()), 0)
        float(acc)  # value fetch — axon block_until_ready is a no-op
        log(f"{tag} warmup incl. compile: {time.perf_counter() - t0:.1f}s")
        t0 = time.perf_counter()
        for i in range(iters):
            acc = step(acc, 1 + i)
        float(acc)
        ips = b * iters / (time.perf_counter() - t0)
        log(f"{tag} (B={b}): {ips:.1f} img/s")
        out[tag] = round(ips, 1)

    def guarded(tag, *args):
        # One family's compile failure must not void the whole bench record
        # (round 4: the SSD program lost the remote-compile lottery once and
        # took the train metrics down with it).
        try:
            one(tag, *args)
        except Exception as e:  # noqa: BLE001 — record and continue
            log(f"{tag} FAILED: {type(e).__name__}: {str(e)[:300]}")
            out[tag] = None

    from edgeml_tpu.models.ssdlite import SSDLite

    net = SSDLite(num_classes=91)
    params, stats = net.init(jax.random.PRNGKey(0))
    guarded("ssdlite_f32", net, params, stats, net.image_size, None)
    # bf16 expected ~neutral (f32 convs already run at bf16 MXU speed at
    # DEFAULT precision) — recorded anyway: the serving knob exists for
    # every family and the row belongs in the record.
    guarded("ssdlite_bf16", net, params, stats, net.image_size, jnp.bfloat16)
    # int8 PTQ (models/quant_ssd.py): the MXU runs int8 contractions at ~2x
    # bf16 rate with half the operand bandwidth — the edge-serving knob,
    # now for the reference's default weak model too.
    try:
        from edgeml_tpu.models.quant_ssd import prepare_int8_ssd

        t0 = time.perf_counter()
        # iters=1: the two prep programs (calib walk + quantize) paid a
        # 19-minute remote compile at iters=2 (r5e); one batch halves the
        # unrolled calib program and the .jax_cache amortizes re-runs.
        q8ssd = prepare_int8_ssd(
            net, params, stats,
            lambda i: hash_uniform(6000 + i, (8, net.image_size,
                                              net.image_size, 3)),
            iters=1,
        ).tree
        float(jnp.sum(
            jax.tree_util.tree_leaves(q8ssd)[0].astype(jnp.float32)))
        log(f"ssdlite int8 prep: {time.perf_counter() - t0:.1f}s")
        guarded("ssdlite_int8", net, params, stats, net.image_size, None,
                q8ssd)
    except Exception as e:  # noqa: BLE001 — record and continue
        log(f"ssdlite_int8 prep FAILED: {type(e).__name__}: {str(e)[:300]}")
        out["ssdlite_int8"] = None

    from edgeml_tpu.models.retinanet import RetinaNet

    net = RetinaNet(num_classes=91)
    params = net.init(jax.random.PRNGKey(0))
    guarded("retinanet_f32", net, params, None, net.image_size, None)
    guarded("retinanet_bf16", net, params, None, net.image_size, jnp.bfloat16)

    from edgeml_tpu.models.faster_rcnn import FasterRCNN

    net = FasterRCNN(num_classes=91)
    params = net.init(jax.random.PRNGKey(0))
    guarded("faster_rcnn_f32", net, params, None, net.image_size, None)
    # bf16 pays double after the patch-gather RoIAlign (r4j): the gathers
    # read a bf16 pyramid (half the bytes of the dominant stage) AND the
    # box head matmuls hit MXU bf16 peak.
    guarded("faster_rcnn_bf16", net, params, None, net.image_size,
            jnp.bfloat16)
    return out


def run_train():
    """YOLOv5n 640 training-step throughput (fwd + bwd + SGD), f32 and bf16
    (the AMP-equivalent path, models/train.py make_train_step dtype knob).
    Same chained-launch methodology as run_yolo: the parameter state itself
    is the chain — step i+1 consumes step i's updated params."""
    import jax
    import jax.numpy as jnp

    from edgeml_tpu.models.train import TrainConfig, make_train_step
    from edgeml_tpu.models.yolov5 import YoloV5
    from edgeml_tpu.utils.synth import hash_uniform

    b = int(os.environ.get("BENCH_TRAIN_BATCH", 64))
    iters = int(os.environ.get("BENCH_TRAIN_ITERS", 8))
    nt = 32
    net = YoloV5(variant="n", num_classes=80, img_size=640)
    params, stats = net.init(jax.random.PRNGKey(0))
    cfg = TrainConfig()
    tr = hash_uniform(123, (b, nt, 4)) * 0.4 + 0.2
    targets = jnp.concatenate(
        [jnp.zeros((b, nt, 1)), tr[..., :2], tr[..., 2:] * 0.3 + 0.05], axis=-1
    )
    tvalid = jnp.ones((b, nt), bool)

    out = {}
    for name, dt in (("f32", None), ("bf16", jnp.bfloat16)):
        opt, step = make_train_step(net, cfg, dtype=dt)
        opt_state = opt.init(params)

        @jax.jit
        def run_one(carry, seed, step=step):
            p, s, o, acc = carry
            imgs = hash_uniform(seed, (b, 640, 640, 3))
            p, s, o, loss, _ = step(p, s, o, imgs, targets, tvalid, 0.001)
            return (p, s, o, acc + loss)

        carry = (params, stats, opt_state, jnp.zeros(()))
        t0 = time.perf_counter()
        carry = run_one(carry, 0)
        float(carry[3])  # value fetch — see run_yolo note on axon block
        log(f"train {name} warmup incl. compile: {time.perf_counter() - t0:.1f}s")
        t0 = time.perf_counter()
        for i in range(iters):
            carry = run_one(carry, 1 + i)
        float(carry[3])
        ips = b * iters / (time.perf_counter() - t0)
        log(f"yolov5n TRAIN {name} (B={b}): {ips:.0f} img/s")
        out[name] = round(ips, 1)

    # Anchor-family training throughput (the reference's PRIMARY trainer is
    # the torchvision-family loop, train.py:120-139) — SSDLite320, the
    # reference's default weak model, via make_family_train_step.
    try:
        from edgeml_tpu.models.engine import make_family_train_step
        from edgeml_tpu.models.ssdlite import SSDLite

        fb = int(os.environ.get("BENCH_FAMTRAIN_BATCH", 64))
        snet = SSDLite(num_classes=91)
        sparams, sstats = snet.init(jax.random.PRNGKey(0))
        sopt, sstep = make_family_train_step(snet, TrainConfig())
        sopt_state = sopt.init(sparams)
        s_size = snet.image_size
        str_ = hash_uniform(321, (fb, nt, 4)) * 0.4 + 0.2
        stargets = jnp.concatenate(
            [jnp.ones((fb, nt, 1)), str_[..., :2], str_[..., 2:] * 0.3 + 0.05],
            axis=-1,
        )
        svalid = jnp.ones((fb, nt), bool)
        skey = jax.random.PRNGKey(0)

        @jax.jit
        def run_fam(carry, seed):
            p, s, o, acc = carry
            imgs = hash_uniform(seed, (fb, s_size, s_size, 3))
            p, s, o, loss, _ = sstep(p, s, o, imgs, stargets, svalid, 0.001,
                                     skey)
            return (p, s, o, acc + loss)

        carry = (sparams, sstats, sopt_state, jnp.zeros(()))
        t0 = time.perf_counter()
        carry = run_fam(carry, 0)
        float(carry[3])
        log(f"ssdlite train warmup incl. compile: "
            f"{time.perf_counter() - t0:.1f}s")
        t0 = time.perf_counter()
        for i in range(iters):
            carry = run_fam(carry, 1 + i)
        float(carry[3])
        ips = fb * iters / (time.perf_counter() - t0)
        log(f"ssdlite320 TRAIN f32 (B={fb}): {ips:.0f} img/s")
        out["ssdlite_f32"] = round(ips, 1)
    except Exception as e:  # noqa: BLE001 — record and continue
        log(f"ssdlite train FAILED: {type(e).__name__}: {str(e)[:300]}")
        out["ssdlite_f32"] = None
    return out


def main():
    rng = np.random.default_rng(7)
    log(
        f"workload: {N_IMG} imgs, {N_CLS} classes, ~{DETS_PER_IMG} dets/img, "
        f"E={NUM_ENSEMBLE}"
    )
    weak, strong, labels = make_workload(rng)
    baseline_ips = run_baseline(weak, strong, labels)
    ours_ips, ours_runs = run_ours(weak, strong, labels)
    def section(skip_var, fn):
        # A section's failure (remote-compile 500s happen — CLAUDE.md
        # flakiness notes) must not void the other sections' record: the
        # driver keeps whatever JSON line we manage to print.
        if os.environ.get(skip_var, "0") == "1":
            return {}
        try:
            return fn()
        except Exception as e:  # noqa: BLE001
            log(f"section {skip_var[11:]} FAILED: "
                f"{type(e).__name__}: {str(e)[:300]}")
            return {}

    # The true COCO-val scale (BASELINE.md names 5k images; the headline
    # N=2048 and this 5k row are BOTH reported every round so vs_baseline
    # never silently mixes denominators again). The 5k pool is K=2688 —
    # past the measured scale cliff (PERF.md r4b: 6,592 img/s vs 15,927).
    orie5k = section("BENCH_SKIP_ORIE5K", lambda: dict(zip(
        ("med", "runs"),
        run_ours(*make_workload(np.random.default_rng(11), 5000), tag=" 5k"),
    )))

    yolo = section("BENCH_SKIP_YOLO", run_yolo)
    # the reference's STRONG detector (yolov5m, yolov5_scripts.md:17);
    # B=64 (the m activations are ~2.4x n's). int8 ON: unlike the narrow n
    # trunk, PTQ WINS on m (measured r4: 1,325 int8 vs 1,228 bf16 img/s —
    # quantization pays where the MXU is busy).
    strongdet = section("BENCH_SKIP_STRONG", lambda: run_yolo(
        variant="m",
        b=int(os.environ.get("BENCH_STRONG_BATCH", 64)),
        iters=int(os.environ.get("BENCH_STRONG_ITERS", 8)),
        int8=os.environ.get("BENCH_STRONG_INT8", "1") == "1",
    ))
    fams = section("BENCH_SKIP_FAMILIES", run_families)
    train = section("BENCH_SKIP_TRAIN", run_train)
    print(
        json.dumps(
            {
                "metric": "orie_reward_throughput",
                "value": round(ours_ips, 2),
                "unit": "images/sec (E=1000, COCO-val-scale synthetic)",
                "vs_baseline": round(ours_ips / baseline_ips, 2),
                "orie_median_of_3": round(ours_ips, 2),
                "orie_runs_imgs_per_sec": ours_runs,
                "orie_imgs_per_sec_cocoval5k": orie5k.get("med"),
                "orie_runs_cocoval5k": orie5k.get("runs"),
                "yolov5n_infer_imgs_per_sec_f32": yolo.get("f32"),
                "yolov5n_infer_imgs_per_sec_bf16": yolo.get("bf16"),
                "yolov5n_infer_imgs_per_sec_int8": yolo.get("int8"),
                "yolov5n_infer_round1_imgs_per_sec": 300.0,
                "yolov5m_infer_imgs_per_sec_f32": strongdet.get("f32"),
                "yolov5m_infer_imgs_per_sec_bf16": strongdet.get("bf16"),
                "yolov5m_infer_imgs_per_sec_int8": strongdet.get("int8"),
                "ssdlite_infer_imgs_per_sec_f32": fams.get("ssdlite_f32"),
                "ssdlite_infer_imgs_per_sec_bf16": fams.get("ssdlite_bf16"),
                "ssdlite_infer_imgs_per_sec_int8": fams.get("ssdlite_int8"),
                "retinanet_infer_imgs_per_sec_f32": fams.get("retinanet_f32"),
                "retinanet_infer_imgs_per_sec_bf16": fams.get("retinanet_bf16"),
                "faster_rcnn_infer_imgs_per_sec_f32": fams.get(
                    "faster_rcnn_f32"
                ),
                "faster_rcnn_infer_imgs_per_sec_bf16": fams.get(
                    "faster_rcnn_bf16"
                ),
                "yolov5n_train_imgs_per_sec_f32": train.get("f32"),
                "yolov5n_train_imgs_per_sec_bf16": train.get("bf16"),
                "ssdlite_train_imgs_per_sec_f32": train.get("ssdlite_f32"),
            }
        )
    )


if __name__ == "__main__":
    main()

"""POOL_BUCKETS A/B on ORIE reward throughput at both scales.

The 5k-scale ORIE cost is linear in the pool tile C*K (exp_cumblk put the
blocked cumsum at the expected linear scaling), and K = the MAX per-class
count (2688 at 5k — set by 'person' alone) while most classes have far
fewer rows: class-count bucketing (map_kernel.BucketedPool) pads each
bucket only to ITS max. This measures buckets=1/2/3/4 at N=2048 and 5000,
MM_CUMSUM="blocked" (the r5i winner), and checks reward parity across
bucket counts (<=3e-5 — float reassociation of per-class sums only).

    python tools/exp_bucket.py [n_imgs...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import edgeml_tpu.ops.map_kernel as mk
from edgeml_tpu.ops.map_kernel import build_pool
from edgeml_tpu.reward import orie_rewards
from edgeml_tpu.reward.orie import _orie_batch

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from bench import make_workload  # noqa: E402 — synthetic COCO-like triples

NS = [int(a) for a in (sys.argv[1:] or ["2048", "5000"])]
mk.MM_CUMSUM = "blocked"

for n_img in NS:
    weak, strong, labels = make_workload(np.random.default_rng(7), n_img)
    ref = None
    for b in (1, 2, 3, 4):
        pool = build_pool(weak, strong, labels, buckets=b)
        subs = pool.pools if hasattr(pool, "pools") else (pool,)
        tile = sum(p.tp.shape[0] * p.tp.shape[1] for p in subs)
        desc = "+".join(f"{p.tp.shape[0]}x{p.tp.shape[1]}" for p in subs)
        _orie_batch.clear_cache()
        t0 = time.perf_counter()
        orie_rewards(weak, strong, labels, 1000, seed=0, pool=pool)
        wu = time.perf_counter() - t0
        t0 = time.perf_counter()
        r = orie_rewards(weak, strong, labels, 1000, seed=1, pool=pool)
        el = time.perf_counter() - t0
        if ref is None:
            ref = r
        md = float(np.abs(r - ref).max())
        print(
            f"  N={n_img} buckets={b}: {el:6.2f}s  {n_img / el:8.1f} img/s"
            f"  tile {tile:7d} ({desc})  warmup {wu:.1f}s"
            f"  |dr|max {md:.2e}",
            flush=True,
        )
        assert md <= 3e-5, md
mk.MM_CUMSUM = True
_orie_batch.clear_cache()

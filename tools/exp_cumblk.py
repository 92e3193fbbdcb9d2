"""MM_CUMSUM blocked-vs-full A/B on ORIE reward throughput at BOTH scales
(N=2048 bench scale, K=1152; N=5000 COCO-val scale, K=2688 — the measured
scale cliff). The full triangular cumsum is O(K^2) FLOPs per pool row and
dominates the draw at large K; the two-level blocked form is O(K*128),
bit-exact (tests/test_map_kernel.py::test_mm_variants_bit_exact).

    python tools/exp_cumblk.py [n_imgs...]
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

for n_img in NS:
    weak, strong, labels = make_workload(np.random.default_rng(7), n_img)
    pool = build_pool(weak, strong, labels)
    print(f"N={n_img}: pool C={pool.tp.shape[0]} K={pool.tp.shape[1]}",
          flush=True)
    for mode in (True, "blocked", True):
        mk.MM_CUMSUM = mode
        _orie_batch.clear_cache()  # trace-time flag
        t0 = time.perf_counter()
        orie_rewards(weak, strong, labels, 1000, seed=0, pool=pool)
        print(f"  N={n_img} mode={mode}: warmup "
              f"{time.perf_counter() - t0:.1f}s", flush=True)
        t0 = time.perf_counter()
        r = orie_rewards(weak, strong, labels, 1000, seed=1, pool=pool)
        el = time.perf_counter() - t0
        print(f"  N={n_img} mode={str(mode):8s}: {el:6.2f}s  "
              f"{n_img / el:8.1f} img/s  (reward mean {r.mean():.4f})",
              flush=True)
mk.MM_CUMSUM = True
_orie_batch.clear_cache()

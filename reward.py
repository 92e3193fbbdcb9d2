"""Calculate the offloading reward value for each image in a dataset.

CLI-compatible rebuild of /root/reference/reward.py (same positional args,
--method/--num-ensemble flags, and orie{E}.npz / dcsb.npz output with
`reward` and `time` keys). The computation runs as a batched JAX kernel on
the accelerator instead of a CPU thread pool; see edgeml_tpu/reward/orie.py.

Extra flags beyond the reference: --seed (the reference's ensemble sampling is
unseeded and nondeterministic; ours is deterministic given the seed),
--verbose (per-image reward printing, which the reference always does),
--map-range, and --batch (kernel launch width / compile-latency knob). With
more than one visible device the image axis is sharded over an auto-built
data-parallel mesh (SURVEY.md section 5.7).
"""

import argparse
import os
from pathlib import Path

import numpy as np

from edgeml_tpu.data import set_data
from edgeml_tpu.reward import compute_rewards


def main(opts):
    iouv = np.linspace(0.5, 0.95, 10) if getattr(opts, "map_range", False) else None
    weak_data, strong_data, labels = set_data(
        opts.weak_dir, opts.strong_dir, opts.label_dir, iouv=iouv
    )
    reward, execution_time = compute_rewards(
        weak_data,
        strong_data,
        labels,
        method=opts.method,
        num_ensemble=opts.num_ensemble,
        seed=opts.seed,
        verbose=opts.verbose,
        batch=getattr(opts, "batch", None),
    )
    print(
        f"Program takes {execution_time:.1f} seconds "
        f"({execution_time / 60:.1f}m/{execution_time / 3600:.2f}h)."
    )
    Path(opts.save_dir).mkdir(parents=True, exist_ok=True)
    file_name = (
        f"orie{opts.num_ensemble}.npz" if opts.method == "orie" else "dcsb.npz"
    )
    np.savez(os.path.join(opts.save_dir, file_name), reward=reward, time=execution_time)


def getargs():
    """Parse command line arguments."""
    args = argparse.ArgumentParser()
    args.add_argument('weak_dir', help="Per-image detection files of the weak (edge) detector.")
    args.add_argument('strong_dir', help="Per-image detection files of the strong (cloud) detector.")
    args.add_argument('label_dir', help="Per-image ground-truth label files.")
    args.add_argument('save_dir', help="Output directory for the reward .npz file.")
    args.add_argument('--method', type=str, default="orie", choices=['orie', 'dcsb'],
                      help="Reward definition to compute.")
    args.add_argument('--num-ensemble', type=int, default=1000,
                      help="Monte-Carlo ensemble size for 'orie' (0 computes plain ORI).")
    args.add_argument('--seed', type=int, default=0,
                      help="Seed for the ensemble sampling RNG (deterministic, unlike the reference).")
    args.add_argument('--verbose', action='store_true', help="Print per-image rewards.")
    args.add_argument('--map-range', action='store_true',
                      help="Score with mAP@0.5:0.95 instead of mAP@0.5 (the reference's "
                           "commented alternative, lib/data.py:62).")
    args.add_argument('--batch', type=int, default=None,
                      help="Images per kernel launch (default: sized from device memory, "
                           "cap 512). Lower to 256 when one-time compile latency matters "
                           "more than throughput.")
    return args.parse_args()


if __name__ == '__main__':
    main(getargs())

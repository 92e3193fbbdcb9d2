"""Test the performance of reward estimation(s): realized mAP vs offloading ratio.

CLI-compatible rebuild of /root/reference/test.py (same positional args,
--estimates flag, and test_map.npy output of shape (n_estimates, 11)).
All 11 ratio evaluations run as one vmapped dataset-mAP kernel on the
accelerator; see edgeml_tpu/eval.py.
"""

import argparse
import os
from pathlib import Path

import numpy as np

from edgeml_tpu.data import set_data
from edgeml_tpu.eval import test_map


def main(opts):
    iouv = np.linspace(0.5, 0.95, 10) if getattr(opts, "map_range", False) else None
    weak_data, strong_data, labels = set_data(
        opts.weak_dir, opts.strong_dir, opts.label_dir, iouv=iouv
    )
    dataset_split = np.load(opts.split_path)
    estimates = []
    if isinstance(opts.estimates, list):
        estimates = opts.estimates
    elif opts.estimates is not None:
        estimates = [opts.estimates]
    map_result = test_map(weak_data, strong_data, labels, estimates, dataset_split)
    Path(opts.save_dir).mkdir(parents=True, exist_ok=True)
    np.save(os.path.join(opts.save_dir, "test_map.npy"), map_result)


def getargs():
    """Parse command line arguments."""
    args = argparse.ArgumentParser()
    args.add_argument('weak_dir', help="Per-image detection files of the weak detector.")
    args.add_argument('strong_dir', help="Per-image detection files of the strong detector.")
    args.add_argument('label_dir', help="Per-image ground-truth label files.")
    args.add_argument('split_path', help="Cross-validation split .npy (from dataset_split.py).")
    args.add_argument('save_dir', help="Output directory for test_map.npy.")
    args.add_argument('--estimates', nargs='+', type=str,
                      help="One or more estimate{k}.npz directories to evaluate.")
    args.add_argument('--map-range', action='store_true',
                      help="Score with mAP@0.5:0.95 instead of mAP@0.5.")
    return args.parse_args()


if __name__ == '__main__':
    main(getargs())

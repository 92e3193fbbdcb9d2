"""Baseline offloading methods (Adaptive Feeding SVM and DCSB thresholds).

CLI-compatible rebuild of /root/reference/baseline.py (same args, same
binarized-reward protocol, same estimate{k}.npz and wts{k}.pickle outputs,
including the positive-weight subdirectory for AF). The classifiers run in
JAX; see edgeml_tpu/estimators/baselines.py.
"""

import argparse
import os

import numpy as np

import edgeml_tpu.utils as ut
from edgeml_tpu.data import load_data, load_feature, list_image_names
from edgeml_tpu.estimators import SaveOpt, fit_af, fit_dcsb
from edgeml_tpu.estimators.baselines import _pad_boxes  # noqa: F401 (re-export)


def get_area(bbox_coord):
    """Areas of xyxy boxes (baseline.py:155-158)."""
    return (bbox_coord[:, 2] - bbox_coord[:, 0]) * (bbox_coord[:, 3] - bbox_coord[:, 1])


def main(opts):
    reward_data = np.load(opts.reward_path)["reward"]
    # Binarize rewards: both baselines are binary offload classifiers.
    thresh = 0
    reward_data = np.where(reward_data > thresh, 1, 0)
    data_split = np.load(opts.split_path)
    assert len(reward_data) == data_split.shape[1], \
        "Inconsistent number of data points from the dataset and the split."

    save_opts = SaveOpt()
    if opts.baseline == "af":
        feature_data = load_feature(opts.data_dir, 24, pool=False)
        save_opts.model_dir = (
            os.path.join(opts.model_dir, f"{opts.positive_weight}")
            if opts.model_dir
            else ""
        )
        label_num = None
    else:
        img_names = list_image_names(opts.label_dir)
        weak_data = load_data(opts.data_dir, img_names, True)
        feature_data = [
            (np.array([]), np.array([])) if len(wd) == 0 else (wd[2], get_area(wd[1]))
            for wd in weak_data
        ]
        labels = load_data(opts.label_dir, img_names)
        label_num = np.array(
            [0 if len(l) == 0 else len(l[0]) for l in labels], dtype=int
        )
        save_opts.model_dir = opts.model_dir
    assert len(feature_data) == len(reward_data), \
        "Inconsistent number of feature maps and offloading rewards."

    for cv_idx, val_mask in enumerate(data_split):
        train_feature = [f for f, v in zip(feature_data, val_mask) if not v]
        val_feature = [f for f, v in zip(feature_data, val_mask) if v]
        train_reward = reward_data[np.logical_not(val_mask)]
        val_reward = reward_data[val_mask]
        print(
            f"==============================Cross Validation Fold {cv_idx + 1}"
            "=============================="
        )
        save_opts.model_idx = cv_idx + 1
        data = (train_feature, val_feature, train_reward, val_reward)
        if opts.baseline == "af":
            result = fit_af(data, opts.positive_weight, save_opts)
            ut.save_result(
                os.path.join(opts.save_dir, f"{opts.positive_weight}"), result, cv_idx
            )
        else:
            train_label = label_num[np.logical_not(val_mask)]
            result = fit_dcsb(data, train_label, save_opts)
            ut.save_result(opts.save_dir, result, cv_idx)


def getargs():
    """Parse command line arguments."""
    args = argparse.ArgumentParser()
    args.add_argument('data_dir',
                      help="Inputs for the chosen baseline: the stage-24 feature tree for 'af', "
                           "the weak detector's raw detection files for 'dcsb'.")
    args.add_argument('reward_path', help="Reward .npz produced by reward.py.")
    args.add_argument('split_path', help="Cross-validation split .npy.")
    args.add_argument('save_dir', help="Output directory for estimate{k}.npz files.")
    args.add_argument('--baseline', type=str, default="af", choices=['af', 'dcsb'],
                      help="Baseline method: Adaptive Feeding SVM or DCSB thresholds.")
    args.add_argument('--positive_weight', type=float, default=3.0,
                      help="Class weight of the offload-positive class ('af' only).")
    args.add_argument('--label_dir', type=str, default='',
                      help="Ground-truth label files, needed for 'dcsb' calibration.")
    args.add_argument('--model_dir', type=str, default='',
                      help="Where to save/load per-fold wts{k}.pickle files.")
    return args.parse_args()


if __name__ == '__main__':
    main(getargs())

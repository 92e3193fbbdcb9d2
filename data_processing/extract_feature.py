"""Extract features from detection output (Adaptive-Feeding standard).

CLI-compatible rebuild of /root/reference/data_processing/extract_feature.py
(same args; same {img}/stage24_output_features.npy output of length
num_class + 5k).
"""

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from edgeml_tpu.data import extract_output_feature


def main(opts):
    num_class = 20 if opts.dataset == "voc" else 80
    img_names = ['.'.join(f.split('.')[:-1]) for f in sorted(os.listdir(opts.label_dir))]
    for img_name in img_names:
        Path(os.path.join(opts.save_dir, img_name)).mkdir(parents=True, exist_ok=True)
    new_names = sorted(
        f for f in os.listdir(opts.save_dir)
        if not os.path.isfile(os.path.join(opts.save_dir, f))
    )
    assert len(img_names) == len(new_names) and all(
        i == n for i, n in zip(img_names, new_names)
    ), "Save directory contains unexpected image sub-directories."
    extract_output_feature(opts.output_dir, opts.save_dir, num_class, opts.k)


def getargs():
    """Parse command line arguments."""
    args = argparse.ArgumentParser()
    args.add_argument('output_dir', help="Weak-detector per-image detection files.")
    args.add_argument('save_dir', help="Feature-tree root ({img}/stage24_output_features.npy).")
    args.add_argument('label_dir', help="Label files defining the image universe.")
    args.add_argument('--k', type=int, default=25, help="Number of top boxes per feature vector.")
    args.add_argument('--dataset', type=str, default="coco", help="'coco' (80 classes) or 'voc' (20).")
    return args.parse_args()


if __name__ == '__main__':
    main(getargs())

"""Split the (validation) dataset of VOC/COCO into K folds for cross validation.

CLI-compatible rebuild of /root/reference/data_processing/dataset_split.py
(same args, bitwise-identical split .npy for a given image count — the
RandomState(0) shuffle is reproduced exactly so split files interchange).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from edgeml_tpu.dataprep import split_dataset


def main(opts):
    num_img = len(os.listdir(opts.img_dir))
    split_dataset(num_img, opts.num_split, opts.save_path)


def getargs():
    """Parse command line arguments."""
    args = argparse.ArgumentParser()
    args.add_argument('img_dir', help="Image directory whose file count sizes the split.")
    args.add_argument('save_path', help="Output .npy path for the fold masks.")
    args.add_argument('--num-split', type=int, default=5, help="Number of cross-validation folds.")
    return args.parse_args()


if __name__ == '__main__':
    main(getargs())

"""Parse the annotations in object detection datasets into standard .txt files.

CLI-compatible rebuild of /root/reference/data_processing/label.py (same args
and output format). COCO parsing uses stdlib json instead of the pycocotools
C extension.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from edgeml_tpu.dataprep import coco_label, voc_label


def main(opts):
    if opts.dataset == 'coco':
        coco_label(opts.data_dir, opts.save_dir)
    else:
        voc_label(opts.data_dir, opts.save_dir)


def getargs():
    """Parse command line arguments."""
    args = argparse.ArgumentParser()
    args.add_argument('data_dir', help="Dataset root (COCO with annotations/, or VOC with VOCdevkit/).")
    args.add_argument('save_dir', help="Output root for per-split label directories.")
    args.add_argument('--dataset', type=str, default="coco", help="Annotation format: 'coco' or 'voc'.")
    return args.parse_args()


if __name__ == '__main__':
    main(getargs())

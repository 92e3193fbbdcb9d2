"""K-fold dataset splitter.

Bitwise-compatible with the reference splitter
(/root/reference/data_processing/dataset_split.py:8-30): the split is defined
by a NumPy `RandomState(seed)` Fisher-Yates shuffle, so it stays host-side
NumPy ON PURPOSE — split files must be interchangeable between frameworks
(SURVEY.md section 7.6).
"""

from __future__ import annotations

import numpy as np


def split_dataset(n_img: int, n_split: int, save_path: str | None = None, seed: int = 0):
    """Split n_img images into n_split boolean fold masks (n_split, n_img).

    Fold s contains the shuffled indices [s::n_split]; masks are disjoint and
    partition the dataset. Saved as .npy when save_path is given.
    """
    assert n_split >= 1, "Please split the dataset into at least 2 folds."
    assert n_img >= n_split, "Please set a smaller number of splits."
    rstate = np.random.RandomState(seed)
    order = np.arange(n_img)
    rstate.shuffle(order)
    split = np.zeros((n_split, n_img), dtype=bool)
    for s in range(n_split):
        split[s, order[s::n_split]] = True
    if save_path is not None:
        np.save(save_path, split)
    return split

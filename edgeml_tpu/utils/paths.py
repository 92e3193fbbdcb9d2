"""Result/model saving-path conventions (parity with /root/reference/lib/utils.py)."""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np


def parse_path(path: str) -> tuple[str, str]:
    """Derive the '{name}_best' / '{name}_last' sibling directories.

    Parity with /root/reference/lib/utils.py:8-22 (empty input -> empty pair)
    for relative paths. Deliberate divergence: the reference's split/rejoin
    drops the leading separator of absolute paths (writing to a CWD-relative
    location); here absolute paths stay absolute.
    """
    if path == "":
        return "", ""
    head, name = os.path.split(os.path.normpath(path))
    return os.path.join(head, name + "_best"), os.path.join(head, name + "_last")


def save_result(path: str, result: dict, index: int) -> None:
    """Save per-fold estimates as estimate{index+1}.npz (lib/utils.py:25-29)."""
    Path(path).mkdir(parents=True, exist_ok=True)
    np.savez(os.path.join(path, f"estimate{index + 1}.npz"), **result)

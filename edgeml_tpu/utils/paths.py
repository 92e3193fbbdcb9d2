"""Result/model saving-path conventions (parity with /root/reference/lib/utils.py)."""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np


def parse_path(path: str) -> tuple[str, str]:
    """Derive the '{name}_best' / '{name}_last' sibling directories.

    Parity with /root/reference/lib/utils.py:8-22 (empty input -> empty pair).
    """
    if path == "":
        return "", ""
    parts = os.path.normpath(path).split(os.sep)
    name = parts[-1]
    best = os.path.join(*parts[:-1], name + "_best") if len(parts) > 1 else name + "_best"
    last = os.path.join(*parts[:-1], name + "_last") if len(parts) > 1 else name + "_last"
    return best, last


def save_result(path: str, result: dict, index: int) -> None:
    """Save per-fold estimates as estimate{index+1}.npz (lib/utils.py:25-29)."""
    Path(path).mkdir(parents=True, exist_ok=True)
    np.savez(os.path.join(path, f"estimate{index + 1}.npz"), **result)

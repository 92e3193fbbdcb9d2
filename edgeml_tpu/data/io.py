"""On-disk format contract and dataset assembly (SURVEY.md section 2.9).

Implements the reference's data layer (/root/reference/lib/data.py) against the
exact same file formats so artifacts are interchangeable:
  * labels:      {img}.txt rows "cls x y w h" (normalized xywh-center)
  * detections:  {img}.txt or {img}.npy rows "cls x y w h conf"
  * features:    {img}/stage{S}_{Name}_features.npy  (C, H, W)
  * output feat: {img}/stage24_output_features.npy   (num_class + 5k,)

The compute differs from the reference: instead of a Python loop calling the
matcher per image (lib/data.py:63-83), `set_data` pads the whole dataset to
fixed shapes once and runs ONE vmapped `box_correct` over all images on the
accelerator.
"""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.metrics import box_correct

# Stage names of YOLOv5 detectors, used in feature-map file names
# (mirrors /root/reference/lib/data.py:99-100 and the yolov5 model yaml).
V5_STAGE_NAMES = [
    "Conv", "Conv", "C3", "Conv", "C3", "Conv", "C3", "Conv", "C3", "SPPF",
    "Conv", "Upsample", "Concat", "C3", "Conv", "Upsample", "Concat", "C3",
    "Conv", "Concat", "C3", "Conv", "Concat", "C3", "output",
]


def list_image_names(label_dir: str) -> list[str]:
    """Sorted image-name universe, extensions stripped (lib/data.py:54-56)."""
    names = sorted(os.listdir(label_dir))
    return [".".join(n.split(".")[:-1]) for n in names]


def _xywh2xyxy_np(x: np.ndarray) -> np.ndarray:
    out = np.empty_like(x)
    out[:, 0] = x[:, 0] - x[:, 2] / 2
    out[:, 1] = x[:, 1] - x[:, 3] / 2
    out[:, 2] = x[:, 0] + x[:, 2] / 2
    out[:, 3] = x[:, 1] + x[:, 3] / 2
    return out


def _read_rows(file_path: str):
    """Read one per-image file: .txt (space-separated) preferred, else .npy."""
    if os.path.isfile(file_path + ".txt"):
        with open(file_path + ".txt", "r") as f:
            rows = [line.strip().split(" ") for line in f if line.strip()]
        if not rows:
            return None
        return np.array(rows, dtype=float)
    if os.path.isfile(file_path + ".npy"):
        arr = np.load(file_path + ".npy")
        if len(arr) == 0:
            return None
        return np.asarray(arr, dtype=float)
    return None


def load_data(path: str, files: Sequence[str], with_conf: bool = False):
    """Load per-image box files into (cls, xyxy boxes[, conf]) tuples.

    Format parity with /root/reference/lib/data.py:11-43: rows are
    "cls x y w h [conf]" in normalized xywh-center; empty/missing files yield
    an empty tuple. Text files are parsed by the native threaded reader
    (native/fastio.cpp) when available; .npy files and any file the native
    parser rejects go through the Python path.
    """
    cols = 6 if with_conf else 5
    txt_paths, txt_pos = [], []
    for i, file in enumerate(files):
        fp = os.path.join(path, file) + ".txt"
        if os.path.isfile(fp):
            txt_paths.append(fp)
            txt_pos.append(i)
    native = None
    if txt_paths:
        from . import fastio

        native = fastio.load_txt_boxes(txt_paths, cols)
    native_by_idx = {}
    if native is not None:
        for pos, arr in zip(txt_pos, native):
            native_by_idx[pos] = arr

    data = []
    for i, file in enumerate(files):
        arr = native_by_idx.get(i)
        if arr is not None and len(arr) == 0:
            data.append(())
            continue
        if arr is None:
            arr = _read_rows(os.path.join(path, file))
            if arr is None:
                data.append(())
                continue
        arr = np.asarray(arr, float)
        cls = arr[:, 0].astype(int)
        boxes = _xywh2xyxy_np(arr[:, 1:5])
        if with_conf:
            data.append((cls, boxes, arr[:, -1]))
        else:
            data.append((cls, boxes))
    return data


def _batched_correct(det_list, lab_list, iouv: np.ndarray, chunk: int = 512):
    """Run box_correct over a whole dataset in fixed-shape vmapped chunks.

    det_list: list of (cls, boxes, conf) or () per image.
    lab_list: list of (cls, boxes) or () per image.
    Returns list of (n_i, t) bool arrays.
    """
    n_img = len(det_list)
    maxd = max([len(d[0]) for d in det_list if len(d) > 0] + [1])
    maxl = max([len(l[0]) for l in lab_list if len(l) > 0] + [1])

    db = np.zeros((n_img, maxd, 4), np.float32)
    dc = np.full((n_img, maxd), -1, np.int32)
    dv = np.zeros((n_img, maxd), bool)
    lb = np.zeros((n_img, maxl, 4), np.float32)
    lc = np.full((n_img, maxl), -2, np.int32)
    lv = np.zeros((n_img, maxl), bool)
    for i, (d, l) in enumerate(zip(det_list, lab_list)):
        if len(d) > 0:
            k = len(d[0])
            db[i, :k], dc[i, :k], dv[i, :k] = d[1], d[0], True
        if len(l) > 0:
            k = len(l[0])
            lb[i, :k], lc[i, :k], lv[i, :k] = l[1], l[0], True

    fn = jax.jit(jax.vmap(box_correct, in_axes=(0, 0, 0, 0, 0, 0, None)))
    iouv_j = jnp.asarray(iouv, jnp.float32)
    outs = []
    for s in range(0, n_img, chunk):
        e = min(s + chunk, n_img)
        outs.append(
            np.asarray(
                fn(db[s:e], dc[s:e], dv[s:e], lb[s:e], lc[s:e], lv[s:e], iouv_j)
            )
        )
    tp = np.concatenate(outs) if outs else np.zeros((0, maxd, len(iouv)), bool)

    result = []
    for i, d in enumerate(det_list):
        k = len(d[0]) if len(d) > 0 else 0
        result.append(tp[i, :k])
    return result


def set_data(weak: str, strong: str, label: str, iouv: np.ndarray | None = None):
    """Assemble per-image TP-correctness triples for both detector streams.

    Behavioral parity with /root/reference/lib/data.py:46-84: returns
    (weak_data, strong_data, labels) where each *_data[i] is
    (correct (n_i, t) bool, conf (n_i,), cls (n_i,)) and labels[i] is the
    (m_i,) class vector (empty array when the image has no labels — in which
    case all detections are incorrect).

    :param iouv: IoU thresholds; defaults to [0.5] (mAP@0.5). Pass
        np.linspace(0.5, 0.95, 10) for mAP@0.5:0.95 (the reference's commented
        alternative, lib/data.py:62).
    """
    if iouv is None:
        iouv = np.array([0.5])
    img_names = list_image_names(label)
    weak_raw = load_data(weak, img_names, True)
    strong_raw = load_data(strong, img_names, True)
    labels_raw = load_data(label, img_names)

    # Images without labels produce all-false TP rows; feed the matcher an
    # empty label set for them (validity masks handle it).
    lab_for_match = [l if len(l) > 0 else () for l in labels_raw]
    weak_tp = _batched_correct(weak_raw, lab_for_match, iouv)
    strong_tp = _batched_correct(strong_raw, lab_for_match, iouv)

    weak_data, strong_data, labels = [], [], []
    for i in range(len(img_names)):
        for raw, tp, out in (
            (weak_raw[i], weak_tp[i], weak_data),
            (strong_raw[i], strong_tp[i], strong_data),
        ):
            if len(raw) > 0:
                out.append((tp.astype(bool), raw[2], raw[0]))
            else:
                out.append(
                    (np.zeros((0, len(iouv)), bool), np.array([]), np.array([]))
                )
        labels.append(labels_raw[i][0] if len(labels_raw[i]) > 0 else np.array([]))
    return weak_data, strong_data, labels


def load_feature(
    path: str,
    stage: int,
    pool: bool = True,
    batch_size: int = 128,
    func: str = "avg",
    size: int = 8,
):
    """Load per-image feature maps, optionally ROI-resized to (size, size).

    Format parity with /root/reference/lib/data.py:87-124. The reference calls
    torchvision's CUDA/C++ roi_align/roi_pool after square-padding each map
    (lib/data.py:104-117); here the resize is our JAX ROI kernel
    (edgeml_tpu.ops.roi) run batched on the accelerator.
    """
    from ..ops.roi import roi_resize_batch

    images = sorted(
        f for f in os.listdir(path) if not os.path.isfile(os.path.join(path, f))
    )

    def fpath(img_name):
        return os.path.join(
            path, img_name, f"stage{stage}_{V5_STAGE_NAMES[stage]}_features.npy"
        )

    if not pool:
        return [np.load(fpath(img)) for img in images]

    out = []
    for s in range(0, len(images), batch_size):
        batch_names = images[s : s + batch_size]
        feats, sizes = [], []
        for img in batch_names:
            fm = np.load(fpath(img))  # (C, H, W)
            c, h, w = fm.shape
            side = max(h, w)
            padded = np.zeros((c, side, side), fm.dtype)
            padded[:, :h, :w] = fm
            feats.append(padded)
            sizes.append((h, w))
        out.append(
            roi_resize_batch(np.stack(feats), np.array(sizes, np.float32), size, func)
        )
    return np.concatenate(out) if out else np.zeros((0,))


def extract_output_feature(
    output_path: str, feature_path: str, num_class: int, k: int = 25
):
    """Adaptive-Feeding-style output features from top-k detections.

    Format parity with /root/reference/lib/data.py:127-160: a vector of length
    num_class + 5k = class histogram of the first k rows + the flattened first
    k (x, y, w, h, conf) rows, saved as {img}/stage24_output_features.npy.
    Rows are taken in FILE ORDER (not re-sorted by confidence), matching the
    reference.
    """
    img_names = sorted(
        f
        for f in os.listdir(feature_path)
        if not os.path.isfile(os.path.join(feature_path, f))
    )
    for img in img_names:
        feature = np.zeros((num_class + 5 * k,), float)
        arr = _read_rows(os.path.join(output_path, img))
        if arr is not None:
            arr = arr[:k]
            for c in arr[:, 0].astype(int):
                feature[c] += 1
            flat = arr[:, 1:].flatten()
            feature[num_class : num_class + flat.size] = flat
        np.save(
            os.path.join(feature_path, img, "stage24_output_features.npy"), feature
        )

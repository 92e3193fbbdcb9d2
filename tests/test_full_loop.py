"""Full-framework integration: detectors -> rewards -> estimator -> policy.

The complete offloading loop with REAL detector inference (random-weight
YOLOv5n as 'weak', YOLOv5s as 'strong' so their outputs differ), exercising:
detect CLI -> on-disk detections -> set_data -> ORIE rewards -> split ->
output features -> LR estimator -> test-stage mAP-vs-ratio evaluation.
"""

import os
import sys
import types

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tpu_models"))


@pytest.mark.slow
def test_detector_to_policy_loop(tmp_path):
    rng = np.random.default_rng(0)
    img_dir = tmp_path / "images"
    lab_dir = tmp_path / "labels"
    img_dir.mkdir()
    lab_dir.mkdir()
    n_img = 6
    for i in range(n_img):
        np.save(img_dir / f"im{i}.npy", rng.random((96, 96, 3)).astype(np.float32))
        rows = []
        for _ in range(rng.integers(1, 4)):
            c = rng.integers(0, 80)
            x, y = rng.uniform(0.3, 0.7, 2)
            w, h = rng.uniform(0.1, 0.3, 2)
            rows.append(f"{c} {x:.4f} {y:.4f} {w:.4f} {h:.4f}")
        (lab_dir / f"im{i}.txt").write_text("\n".join(rows) + "\n")

    # 1. detection outputs from two real (random-weight) detectors
    import detect as detect_cli

    for model, out in (("yolov5n", "weak"), ("yolov5s", "strong")):
        detect_cli.main(
            types.SimpleNamespace(
                img_dir=str(img_dir),
                save_dir=str(tmp_path / out),
                dataset="coco",
                model=model,
                model_path="",
                batch_size=3,
                conf_thres=0.01,
                iou_thres=0.45,
                format="npy",
            )
        )
    assert len(os.listdir(tmp_path / "weak")) == n_img

    # 2. rewards
    import reward as reward_cli

    reward_cli.main(
        types.SimpleNamespace(
            weak_dir=str(tmp_path / "weak"),
            strong_dir=str(tmp_path / "strong"),
            label_dir=str(lab_dir),
            save_dir=str(tmp_path / "rewards"),
            method="orie",
            num_ensemble=3,
            seed=0,
            verbose=False,
        )
    )
    r = np.load(tmp_path / "rewards" / "orie3.npz")["reward"]
    assert r.shape == (n_img,) and np.isfinite(r).all()

    # 3. split + output features + estimator + policy evaluation
    from edgeml_tpu.dataprep import split_dataset

    split_path = str(tmp_path / "split.npy")
    split_dataset(n_img, 2, split_path)

    import data_processing.extract_feature as ef_cli

    ef_cli.main(
        types.SimpleNamespace(
            output_dir=str(tmp_path / "weak"),
            save_dir=str(tmp_path / "features"),
            label_dir=str(lab_dir),
            k=5,
            dataset="coco",
        )
    )

    import regression as reg_cli

    reg_cli.main(
        types.SimpleNamespace(
            data_dir=str(tmp_path / "features"),
            reward_path=str(tmp_path / "rewards" / "orie3.npz"),
            split_path=split_path,
            save_dir=str(tmp_path / "est"),
            normalize=False,
            weight=False,
            stage=24,
            resize=0,
            model="LR",
            model_dir="",
        )
    )

    import test as test_cli

    test_cli.main(
        types.SimpleNamespace(
            weak_dir=str(tmp_path / "weak"),
            strong_dir=str(tmp_path / "strong"),
            label_dir=str(lab_dir),
            split_path=split_path,
            save_dir=str(tmp_path / "eval"),
            estimates=[str(tmp_path / "est")],
        )
    )
    curve = np.load(tmp_path / "eval" / "test_map.npy")
    assert curve.shape == (1, 11)
    assert np.isfinite(curve).all()
    # ratio 0 offloads ~nothing; ratio 1 offloads ~everything -> the curve's
    # endpoints bracket the all-weak / all-strong dataset mAPs
    from edgeml_tpu.data import set_data
    from edgeml_tpu.ops.map_kernel import build_pool, dataset_map
    import jax.numpy as jnp

    weak, strong, labels = set_data(
        str(tmp_path / "weak"), str(tmp_path / "strong"), str(lab_dir)
    )
    pool = build_pool(weak, strong, labels)
    all_weak = float(dataset_map(pool, jnp.zeros(n_img, bool)))
    assert curve[0, 0] == pytest.approx(all_weak, abs=1e-4)

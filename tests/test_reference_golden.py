"""Golden parity: our CLIs vs the ACTUAL reference scripts, run as subprocesses
on a shared on-disk dataset.

The reference's reward.py / test.py are NumPy-only (the torchvision import in
lib/data.py:4 is unused on these paths), so they run in this image with a
torchvision stub injected on PYTHONPATH. With --num-ensemble n-1 the ORIE
ensemble is the deterministic full complement set (sampling a permutation of
all n-1 other images changes nothing: mAP is over the union), so reward values
are directly comparable with no RNG coupling.

Covers VERDICT.md round-1 item 3: converts "parity vs our own oracle" into
"parity vs the reference implementation" (/root/reference/reward.py:16-52,
test.py:27-43).
"""

import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REF = "/root/reference"
REPO = str(Path(__file__).resolve().parents[1])


def _write_stub_torchvision(tmp_path):
    stub = tmp_path / "stub"
    (stub / "torchvision").mkdir(parents=True)
    (stub / "torchvision" / "__init__.py").write_text("from . import ops\n")
    (stub / "torchvision" / "ops" / "__init__.py").parent.mkdir(exist_ok=True)
    (stub / "torchvision" / "ops").mkdir(exist_ok=True)
    (stub / "torchvision" / "ops" / "__init__.py").write_text(
        "def roi_align(*a, **k):\n    raise NotImplementedError\n"
        "def roi_pool(*a, **k):\n    raise NotImplementedError\n"
    )
    return stub


def _run(cmd, cwd, extra_path=None):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    if extra_path:
        env["PYTHONPATH"] = os.pathsep.join(
            [str(extra_path), env.get("PYTHONPATH", "")]
        )
    proc = subprocess.run(
        [sys.executable] + cmd, cwd=cwd, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        timeout=900,
    )
    assert proc.returncode == 0, f"{cmd} failed:\n{proc.stdout[-3000:]}"
    return proc.stdout


def _make_dataset(tmp_path, n_img=12, n_cls=4, seed=5):
    """YOLO-format txt labels + weak/strong detections, with edge cases:
    one unlabeled image, one image with no detections."""
    rng = np.random.default_rng(seed)
    dirs = {}
    for name in ("labels", "weak", "strong"):
        d = tmp_path / name
        d.mkdir()
        dirs[name] = d
    for i in range(n_img):
        stem = f"im{i:03d}"
        n_lab = 0 if i == 3 else int(rng.integers(1, 6))
        rows = []
        for _ in range(n_lab):
            c = rng.integers(0, n_cls)
            x, y = rng.uniform(0.2, 0.8, 2)
            w, h = rng.uniform(0.05, 0.3, 2)
            rows.append((c, x, y, w, h))
        with open(dirs["labels"] / f"{stem}.txt", "w") as f:
            for c, x, y, w, h in rows:
                f.write(f"{c} {x:.6f} {y:.6f} {w:.6f} {h:.6f}\n")
        for det_name, jitter, miss in (("weak", 0.08, 0.5), ("strong", 0.02, 0.15)):
            det_rows = []
            if i != 7:  # image 7: no detections at all
                for c, x, y, w, h in rows:
                    if rng.random() < miss:
                        continue
                    det_rows.append(
                        (
                            c,
                            np.clip(x + rng.normal(0, jitter), 0.05, 0.95),
                            np.clip(y + rng.normal(0, jitter), 0.05, 0.95),
                            max(w + rng.normal(0, jitter), 0.02),
                            max(h + rng.normal(0, jitter), 0.02),
                            rng.uniform(0.2, 0.95),
                        )
                    )
                for _ in range(rng.integers(0, 3)):  # false positives
                    det_rows.append(
                        (
                            rng.integers(0, n_cls),
                            *rng.uniform(0.2, 0.8, 2),
                            *rng.uniform(0.05, 0.2, 2),
                            rng.uniform(0.05, 0.9),
                        )
                    )
            with open(dirs[det_name] / f"{stem}.txt", "w") as f:
                for r in det_rows:
                    # class as int, like yolov5 --save-txt (the reference's
                    # extract_output_feature parses it with int())
                    f.write(
                        f"{int(r[0])} "
                        + " ".join(f"{v:.6f}" for v in r[1:]) + "\n"
                    )
    return dirs


@pytest.fixture(scope="module")
def golden(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("golden")
    stub = _write_stub_torchvision(tmp)
    dirs = _make_dataset(tmp)
    return tmp, stub, dirs


@pytest.mark.parametrize("method,flag", [("orie", "--num-ensemble"), ("dcsb", None)])
def test_reward_cli_matches_reference(golden, method, flag):
    tmp, stub, dirs = golden
    n_img = len(os.listdir(dirs["labels"]))
    args = [
        str(dirs["weak"]), str(dirs["strong"]), str(dirs["labels"]),
        "--method", method,
    ]
    if flag:
        args += [flag, str(n_img - 1)]  # full ensemble => deterministic
    ref_out = tmp / f"ref_{method}"
    our_out = tmp / f"our_{method}"
    _run(["reward.py"] + [args[0], args[1], args[2], str(ref_out)] + args[3:],
         cwd=REF, extra_path=stub)
    _run(["reward.py"] + [args[0], args[1], args[2], str(our_out)] + args[3:],
         cwd=REPO)
    fname = f"orie{n_img - 1}.npz" if method == "orie" else "dcsb.npz"
    ref = np.load(ref_out / fname)
    ours = np.load(our_out / fname)
    assert set(ref.files) <= set(ours.files)
    if method == "dcsb":
        assert np.array_equal(ref["reward"], ours["reward"])
    else:
        np.testing.assert_allclose(
            ours["reward"], ref["reward"], atol=1e-5, rtol=0
        )
    assert float(ours["time"]) > 0


def test_eval_cli_matches_reference(golden):
    tmp, stub, dirs = golden
    n_img = len(os.listdir(dirs["labels"]))
    rng = np.random.default_rng(11)
    # 3-fold row-disjoint split masks
    order = rng.permutation(n_img)
    split = np.zeros((3, n_img), bool)
    for k in range(3):
        split[k, order[k::3]] = True
    split_path = tmp / "split.npy"
    np.save(split_path, split)
    # synthetic estimate dirs (two estimators)
    est_dirs = []
    for e in range(2):
        d = tmp / f"est{e}"
        d.mkdir()
        for k in range(3):
            n_tr = int((~split[k]).sum())
            n_va = int(split[k].sum())
            np.savez(
                d / f"estimate{k + 1}.npz",  # 1-indexed (lib/utils.py:28)
                train_est=rng.normal(0, 1, n_tr),
                val_est=rng.normal(0, 1, n_va),
                train_time=0.0,
                val_time=0.0,
            )
        est_dirs.append(str(d))
    common = [
        str(dirs["weak"]), str(dirs["strong"]), str(dirs["labels"]),
        str(split_path),
    ]
    ref_out = tmp / "ref_eval"
    our_out = tmp / "our_eval"
    _run(["test.py"] + common + [str(ref_out), "--estimates"] + est_dirs,
         cwd=REF, extra_path=stub)
    _run(["test.py"] + common + [str(our_out), "--estimates"] + est_dirs,
         cwd=REPO)
    ref = np.load(ref_out / "test_map.npy")
    ours = np.load(our_out / "test_map.npy")
    assert ref.shape == ours.shape == (2, 11)
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=0)


@pytest.fixture(scope="module")
def estimator_fixtures(golden):
    """Shared features/rewards/split produced by BOTH extract CLIs."""
    tmp, stub, dirs = golden
    n_img = len(os.listdir(dirs["labels"]))
    # features: run reference and our extract_feature on the same weak dets
    ref_feat = tmp / "ref_feat"
    our_feat = tmp / "our_feat"
    _run(
        ["data_processing/extract_feature.py", str(dirs["weak"]), str(ref_feat),
         str(dirs["labels"]), "--k", "5", "--dataset", "coco"],
        cwd=REF, extra_path=f"{stub}{os.pathsep}{REF}",
    )
    _run(
        ["data_processing/extract_feature.py", str(dirs["weak"]), str(our_feat),
         str(dirs["labels"]), "--k", "5", "--dataset", "coco"],
        cwd=REPO,
    )
    # rewards + split
    rng = np.random.default_rng(3)
    rew_path = tmp / "rewards.npz"
    np.savez(rew_path, reward=rng.normal(0.1, 1.0, n_img), time=0.0)
    order = rng.permutation(n_img)
    split = np.zeros((3, n_img), bool)
    for k in range(3):
        split[k, order[k::3]] = True
    split_path = tmp / "est_split.npy"
    np.save(split_path, split)
    return tmp, stub, dirs, ref_feat, our_feat, rew_path, split_path


def test_extract_feature_cli_matches_reference(estimator_fixtures):
    tmp, stub, dirs, ref_feat, our_feat, *_ = estimator_fixtures
    stems = sorted(os.listdir(ref_feat))
    assert stems == sorted(os.listdir(our_feat))
    for stem in stems:
        a = np.load(ref_feat / stem / "stage24_output_features.npy")
        b = np.load(our_feat / stem / "stage24_output_features.npy")
        np.testing.assert_allclose(b, a, atol=1e-6)


def test_regression_lr_cli_matches_reference(estimator_fixtures):
    """LR is closed-form: the reference (sklearn lstsq, f64) and ours (JAX)
    must produce near-identical estimate{k}.npz from the same on-disk
    features/rewards/split."""
    tmp, stub, dirs, ref_feat, our_feat, rew_path, split_path = estimator_fixtures
    ref_out = tmp / "ref_lr"
    our_out = tmp / "our_lr"
    common = [str(rew_path), str(split_path)]
    _run(
        ["regression.py", str(ref_feat)] + common + [str(ref_out),
         "--model", "LR", "--model-dir", str(tmp / "ref_lr_wts")],
        cwd=REF, extra_path=stub,
    )
    _run(
        ["regression.py", str(our_feat)] + common + [str(our_out),
         "--model", "LR", "--model-dir", str(tmp / "our_lr_wts")],
        cwd=REPO,
    )
    for k in (1, 2, 3):
        ref = np.load(ref_out / f"estimate{k}.npz")
        ours = np.load(our_out / f"estimate{k}.npz")
        np.testing.assert_allclose(
            ours["train_est"], ref["train_est"], atol=2e-3, rtol=0
        )
        np.testing.assert_allclose(
            ours["val_est"], ref["val_est"], atol=2e-3, rtol=0
        )


def test_baseline_dcsb_cli_matches_reference(estimator_fixtures):
    """DCSB is a deterministic calibration + integer grid search — binary
    offloading predictions must match the reference exactly.

    The detection files must hold MORE total detections than labels: the
    reference's threshold calibration (baseline.py:96-107) binary-searches
    until the detection count at the threshold EQUALS the label count and
    loops forever otherwise — real conf-0.001 dumps always satisfy this."""
    tmp, stub, dirs, ref_feat, our_feat, rew_path, split_path = estimator_fixtures
    rng = np.random.default_rng(21)
    dense = tmp / "weak_dense"
    dense.mkdir()
    for f in sorted(os.listdir(dirs["weak"])):
        rows = open(dirs["weak"] / f).read()
        extra = []
        for _ in range(8):  # low-conf false positives pad the count curve
            extra.append(
                f"{rng.integers(0, 4)} "
                + " ".join(
                    f"{v:.6f}"
                    for v in (*rng.uniform(0.2, 0.8, 2),
                              *rng.uniform(0.05, 0.3, 2),
                              rng.uniform(0.01, 0.6))
                )
            )
        (dense / f).write_text(rows + "\n".join(extra) + "\n")
    ref_out = tmp / "ref_dcsb"
    our_out = tmp / "our_dcsb"
    common = [str(rew_path), str(split_path)]
    _run(
        ["baseline.py", str(dense)] + common + [str(ref_out),
         "--baseline", "dcsb", "--label_dir", str(dirs["labels"]),
         "--model_dir", str(tmp / "ref_dcsb_wts")],
        cwd=REF, extra_path=stub,
    )
    _run(
        ["baseline.py", str(dense)] + common + [str(our_out),
         "--baseline", "dcsb", "--label_dir", str(dirs["labels"]),
         "--model_dir", str(tmp / "our_dcsb_wts")],
        cwd=REPO,
    )
    for k in (1, 2, 3):
        ref = np.load(ref_out / f"estimate{k}.npz")
        ours = np.load(our_out / f"estimate{k}.npz")
        assert np.array_equal(ours["train_est"], ref["train_est"])
        assert np.array_equal(ours["val_est"], ref["val_est"])

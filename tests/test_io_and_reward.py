"""On-disk format round-trips, set_data parity, and reward-stage semantics."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from edgeml_tpu.data import load_data, set_data, extract_output_feature
from edgeml_tpu.dataprep import split_dataset
from edgeml_tpu.reward import orie_rewards, dcsb_rewards, compute_rewards
from edgeml_tpu.ops.map_kernel import build_pool
from oracle import greedy_match, masked_map, make_random_dataset


def write_dataset(tmp_path, rng, n_img=6, n_cls=3):
    """Write a tiny weak/strong/label txt dataset; return the three dirs."""
    dirs = {}
    for name in ("weak", "strong", "label"):
        d = tmp_path / name
        d.mkdir()
        dirs[name] = str(d)
    for i in range(n_img):
        m = rng.integers(0, 4)
        rows = []
        for _ in range(m):
            c = rng.integers(0, n_cls)
            x, y = rng.uniform(0.2, 0.8, 2)
            w, h = rng.uniform(0.05, 0.3, 2)
            rows.append(f"{c} {x:.6f} {y:.6f} {w:.6f} {h:.6f}")
        (tmp_path / "label" / f"img{i:03d}.txt").write_text(
            "\n".join(rows) + ("\n" if rows else "")
        )
        for det in ("weak", "strong"):
            n = rng.integers(0, 5)
            rows = []
            for _ in range(n):
                c = rng.integers(0, n_cls)
                x, y = rng.uniform(0.2, 0.8, 2)
                w, h = rng.uniform(0.05, 0.3, 2)
                conf = rng.uniform(0.1, 1.0)
                rows.append(
                    f"{c} {x:.6f} {y:.6f} {w:.6f} {h:.6f} {conf:.6f}"
                )
            (tmp_path / det / f"img{i:03d}.txt").write_text(
                "\n".join(rows) + ("\n" if rows else "")
            )
    return dirs


def test_load_data_txt_and_npy(tmp_path):
    d = tmp_path / "dets"
    d.mkdir()
    (d / "a.txt").write_text("1 0.5 0.5 0.2 0.2 0.9\n0 0.3 0.3 0.1 0.1 0.4\n")
    np.save(d / "b.npy", np.array([[2, 0.6, 0.6, 0.2, 0.4, 0.7]]))
    (d / "c.txt").write_text("")
    data = load_data(str(d), ["a", "b", "c", "missing"], with_conf=True)
    assert len(data) == 4
    cls, boxes, conf = data[0]
    assert list(cls) == [1, 0]
    assert np.allclose(boxes[0], [0.4, 0.4, 0.6, 0.6])
    assert np.allclose(conf, [0.9, 0.4])
    assert data[1][0][0] == 2
    assert data[2] == () and data[3] == ()


def test_set_data_matches_oracle_matching(tmp_path):
    rng = np.random.default_rng(5)
    dirs = write_dataset(tmp_path, rng)
    weak, strong, labels = set_data(dirs["weak"], dirs["strong"], dirs["label"])
    raw_w = load_data(dirs["weak"], sorted(
        ".".join(f.split(".")[:-1]) for f in os.listdir(dirs["label"])
    ), True)
    raw_l = load_data(dirs["label"], sorted(
        ".".join(f.split(".")[:-1]) for f in os.listdir(dirs["label"])
    ))
    for i, (w, l) in enumerate(zip(raw_w, raw_l)):
        n = len(w[0]) if len(w) else 0
        assert weak[i][0].shape == (n, 1)
        if n and len(l):
            want = greedy_match(w[1], w[0], l[1], l[0], np.array([0.5]))
            assert np.array_equal(weak[i][0], want)
        elif n:
            assert not weak[i][0].any()  # no labels -> nothing correct
        assert np.array_equal(weak[i][2], w[0] if len(w) else np.array([]))


def test_ori_e0_equals_single_image_delta():
    rng = np.random.default_rng(21)
    weak, strong, labels = make_random_dataset(rng, n_img=6)
    n = len(labels)
    got = orie_rewards(weak, strong, labels, num_ensemble=0)
    for i in range(n):
        sel = np.zeros(n, bool)
        sel[i] = True
        wm = masked_map(weak, strong, labels, sel, np.zeros(n, bool), sel)
        sm = masked_map(weak, strong, labels, np.zeros(n, bool), sel, sel)
        want = 0.0 if (np.isnan(wm) or np.isnan(sm)) else (sm - wm)
        assert got[i] == pytest.approx(want, abs=3e-5)


def test_orie_matches_bruteforce_for_seeded_ensembles():
    # With the full ensemble (E = n-1), sampling is irrelevant: ORIE must be
    # exactly (n) * (map(strong on i) - map(weak everywhere)).
    rng = np.random.default_rng(22)
    weak, strong, labels = make_random_dataset(rng, n_img=5)
    n = len(labels)
    got = orie_rewards(weak, strong, labels, num_ensemble=n - 1)
    ones = np.ones(n, bool)
    for i in range(n):
        ssel = np.zeros(n, bool)
        ssel[i] = True
        wm = masked_map(weak, strong, labels, ones, np.zeros(n, bool), ones)
        sm = masked_map(weak, strong, labels, ones & ~ssel, ssel, ones)
        want = 0.0 if (np.isnan(wm) or np.isnan(sm)) else (sm - wm) * n
        assert got[i] == pytest.approx(want, abs=1e-4)


def test_orie_clamps_oversized_ensemble():
    rng = np.random.default_rng(23)
    weak, strong, labels = make_random_dataset(rng, n_img=4)
    a = orie_rewards(weak, strong, labels, num_ensemble=999)
    b = orie_rewards(weak, strong, labels, num_ensemble=3)
    assert np.allclose(a, b)


def test_dcsb_counts():
    weak = [(np.zeros((2, 1), bool), np.array([0.9, 0.3]), np.array([0, 1]))]
    strong = [(np.zeros((3, 1), bool), np.array([0.6, 0.55, 0.2]), np.array([0, 1, 2]))]
    assert dcsb_rewards(weak, strong)[0] == 2 - 1


def test_reward_cli_roundtrip(tmp_path):
    rng = np.random.default_rng(9)
    dirs = write_dataset(tmp_path, rng)
    weak, strong, labels = set_data(dirs["weak"], dirs["strong"], dirs["label"])
    reward, secs = compute_rewards(weak, strong, labels, "orie", 2, seed=1)
    assert reward.shape == (6,)
    assert np.isfinite(reward).all()
    assert secs > 0


def test_split_bitwise_matches_randomstate():
    split = split_dataset(20, 5)
    # partition property
    assert split.shape == (5, 20)
    assert (split.sum(axis=0) == 1).all()
    # bitwise: reproduce the documented construction independently
    rs = np.random.RandomState(0)
    order = np.arange(20)
    rs.shuffle(order)
    for s in range(5):
        mask = np.zeros(20, bool)
        mask[order[s::5]] = True
        assert np.array_equal(split[s], mask)


def test_extract_output_feature(tmp_path):
    out = tmp_path / "dets"
    feat = tmp_path / "feat"
    out.mkdir()
    feat.mkdir()
    (feat / "img0").mkdir()
    (out / "img0.txt").write_text("1 0.5 0.5 0.2 0.2 0.9\n0 0.3 0.3 0.1 0.1 0.4\n")
    extract_output_feature(str(out), str(feat), num_class=3, k=2)
    v = np.load(feat / "img0" / "stage24_output_features.npy")
    assert v.shape == (3 + 10,)
    assert v[1] == 1 and v[0] == 1  # class histogram
    assert np.allclose(v[3:8], [0.5, 0.5, 0.2, 0.2, 0.9])


def test_reward_cli_map_range(tmp_path):
    """--map-range computes rewards from mAP@0.5:0.95 TP matrices."""
    import types
    import reward as reward_cli

    rng = np.random.default_rng(17)
    dirs = write_dataset(tmp_path, rng)
    ns = types.SimpleNamespace(
        weak_dir=dirs["weak"],
        strong_dir=dirs["strong"],
        label_dir=dirs["label"],
        save_dir=str(tmp_path / "rewards10"),
        method="orie",
        num_ensemble=2,
        seed=0,
        verbose=False,
        map_range=True,
    )
    reward_cli.main(ns)
    r = np.load(tmp_path / "rewards10" / "orie2.npz")["reward"]
    assert r.shape == (6,) and np.isfinite(r).all()
    # the 10-threshold TP matrices really reach set_data
    iouv = np.linspace(0.5, 0.95, 10)
    weak, strong, labels = set_data(
        dirs["weak"], dirs["strong"], dirs["label"], iouv=iouv
    )
    assert weak[0][0].shape[1] == 10

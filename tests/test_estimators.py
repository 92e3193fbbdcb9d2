"""Estimator zoo vs sklearn oracles on synthetic regression data."""

import numpy as np
import pytest

from edgeml_tpu.estimators import (
    fit_LR, fit_EN, fit_BR, fit_SGD, fit_SVR, fit_LSVR, fit_KNR,
    fit_RFR, fit_GBR, fit_CNN, fit_af, fit_dcsb,
)
from edgeml_tpu.estimators.linear import ENOpt, KNROpt, SVROpt, LSVROpt, SGDOpt
from edgeml_tpu.estimators.trees import RFROpt, GBROpt
from edgeml_tpu.estimators.train_cnn import CNNOpt


def make_data(seed=0, n_train=120, n_val=40, f=8, noise=0.1):
    rng = np.random.default_rng(seed)
    w = rng.normal(size=f)
    xs = rng.normal(size=(n_train + n_val, f))
    ys = xs @ w + noise * rng.normal(size=n_train + n_val) + 0.7
    train_x = [x for x in xs[:n_train]]
    val_x = [x for x in xs[n_train:]]
    return (train_x, val_x, ys[:n_train], ys[n_train:]), xs, ys, n_train


def _mse(a, b):
    return float(np.mean((np.asarray(a) - np.asarray(b)) ** 2))


def test_lr_matches_sklearn():
    data, xs, ys, n_train = make_data()
    got = fit_LR(data)
    from sklearn.linear_model import LinearRegression
    from sklearn.preprocessing import StandardScaler

    sc = StandardScaler().fit(xs[:n_train])
    reg = LinearRegression().fit(sc.transform(xs[:n_train]), ys[:n_train])
    want = reg.predict(sc.transform(xs[n_train:]))
    assert np.allclose(got["val_est"], want, atol=1e-3)


def test_en_close_to_sklearn():
    data, xs, ys, n_train = make_data(seed=1)
    got = fit_EN(data)
    from sklearn.linear_model import ElasticNet
    from sklearn.preprocessing import StandardScaler

    sc = StandardScaler().fit(xs[:n_train])
    reg = ElasticNet(alpha=0.01, l1_ratio=0.5).fit(
        sc.transform(xs[:n_train]), ys[:n_train]
    )
    want = reg.predict(sc.transform(xs[n_train:]))
    assert _mse(got["val_est"], want) < 1e-4


def test_br_close_to_sklearn():
    data, xs, ys, n_train = make_data(seed=2)
    got = fit_BR(data)
    from sklearn.linear_model import BayesianRidge
    from sklearn.preprocessing import StandardScaler

    sc = StandardScaler().fit(xs[:n_train])
    reg = BayesianRidge().fit(sc.transform(xs[:n_train]), ys[:n_train])
    want = reg.predict(sc.transform(xs[n_train:]))
    assert _mse(got["val_est"], want) < 1e-4


def test_sgd_learns():
    data, xs, ys, n_train = make_data(seed=3)
    got = fit_SGD(data)
    base = float(np.var(ys[n_train:]))
    assert _mse(got["val_est"], ys[n_train:]) < 0.15 * base


def test_lsvr_comparable_to_sklearn():
    data, xs, ys, n_train = make_data(seed=4)
    got = fit_LSVR(data)
    from sklearn.svm import LinearSVR
    from sklearn.preprocessing import StandardScaler

    sc = StandardScaler().fit(xs[:n_train])
    reg = LinearSVR(C=0.005, epsilon=0.005, max_iter=10000).fit(
        sc.transform(xs[:n_train]), ys[:n_train]
    )
    want_mse = _mse(reg.predict(sc.transform(xs[n_train:])), ys[n_train:])
    got_mse = _mse(got["val_est"], ys[n_train:])
    assert got_mse < 1.3 * want_mse + 1e-3


def test_svr_rbf_comparable_to_sklearn():
    data, xs, ys, n_train = make_data(seed=5, f=4)
    got = fit_SVR(data)
    from sklearn.svm import SVR
    from sklearn.preprocessing import StandardScaler

    sc = StandardScaler().fit(xs[:n_train])
    reg = SVR(kernel="rbf", C=0.05, epsilon=0.05).fit(
        sc.transform(xs[:n_train]), ys[:n_train]
    )
    want_mse = _mse(reg.predict(sc.transform(xs[n_train:])), ys[n_train:])
    got_mse = _mse(got["val_est"], ys[n_train:])
    assert got_mse < 1.5 * want_mse + 1e-3


def test_knr_matches_sklearn():
    data, xs, ys, n_train = make_data(seed=6)
    got = fit_KNR(data, KNROpt(n_neighbors=7))
    from sklearn.neighbors import KNeighborsRegressor
    from sklearn.preprocessing import StandardScaler

    sc = StandardScaler().fit(xs[:n_train])
    reg = KNeighborsRegressor(n_neighbors=7).fit(
        sc.transform(xs[:n_train]), ys[:n_train]
    )
    want = reg.predict(sc.transform(xs[n_train:]))
    assert np.allclose(got["val_est"], want, atol=1e-4)


def _tree_data(seed=7, n_train=300, n_val=100, f=6):
    rng = np.random.default_rng(seed)
    xs = rng.normal(size=(n_train + n_val, f))
    ys = (
        np.where(xs[:, 0] > 0, 2.0, -1.0)
        + np.where(xs[:, 1] > 0.5, 1.5, 0.0)
        + 0.05 * rng.normal(size=n_train + n_val)
    )
    return (
        [x for x in xs[:n_train]],
        [x for x in xs[n_train:]],
        ys[:n_train],
        ys[n_train:],
    ), xs, ys, n_train


def test_gbr_comparable_to_sklearn():
    data, xs, ys, n_train = _tree_data()
    got = fit_GBR(data, GBROpt(n_estimators=60))
    from sklearn.ensemble import GradientBoostingRegressor
    from sklearn.preprocessing import StandardScaler

    sc = StandardScaler().fit(xs[:n_train])
    reg = GradientBoostingRegressor(
        learning_rate=0.1, n_estimators=60
    ).fit(sc.transform(xs[:n_train]), ys[:n_train])
    want_mse = _mse(reg.predict(sc.transform(xs[n_train:])), ys[n_train:])
    got_mse = _mse(got["val_est"], ys[n_train:])
    assert got_mse < 2.0 * want_mse + 0.01


def test_rfr_comparable_to_sklearn():
    data, xs, ys, n_train = _tree_data(seed=8)
    got = fit_RFR(data, RFROpt(n_estimators=20, max_depth=6, min_samples_split=10))
    from sklearn.ensemble import RandomForestRegressor
    from sklearn.preprocessing import StandardScaler

    sc = StandardScaler().fit(xs[:n_train])
    reg = RandomForestRegressor(
        n_estimators=20, max_depth=6, min_samples_split=10, random_state=0
    ).fit(sc.transform(xs[:n_train]), ys[:n_train])
    want_mse = _mse(reg.predict(sc.transform(xs[n_train:])), ys[n_train:])
    got_mse = _mse(got["val_est"], ys[n_train:])
    assert got_mse < 2.5 * want_mse + 0.02


def test_cnn_mlp_fits(tmp_path):
    rng = np.random.default_rng(9)
    f = 12
    xs = rng.normal(size=(80, f)).astype(np.float32)
    w = rng.normal(size=f)
    ys = xs @ w
    opts = CNNOpt(
        channels=[], linear=[f, 16, 1], max_epoch=40, milestones=[25, 35],
        batch_size=16,
    )
    data = ([x for x in xs[:60]], [x for x in xs[60:]], ys[:60], ys[60:])
    best, last = fit_CNN(data, opts, plot=False)
    assert best["train_est"].shape == (60,)
    assert best["val_est"].shape == (20,)
    base = float(np.var(ys[60:]))
    assert _mse(best["val_est"], ys[60:]) < 0.5 * base
    assert best["train_time"] > 0 and best["val_time"] > 0


def test_cnn_conv_path_runs():
    rng = np.random.default_rng(10)
    xs = rng.normal(size=(24, 3, 8, 8)).astype(np.float32)
    ys = xs.mean(axis=(1, 2, 3)) * 3.0
    opts = CNNOpt(
        channels=[3, 4, 4], kernels=[3, 3], pools=[True, False],
        linear=[4 * 4 * 4, 8, 1], max_epoch=8, milestones=[6], batch_size=8,
    )
    data = ([x for x in xs[:16]], [x for x in xs[16:]], ys[:16], ys[16:])
    best, last = fit_CNN(data, opts, plot=False)
    assert np.isfinite(best["val_est"]).all()
    assert np.isfinite(last["val_est"]).all()


def test_cnn_variable_shapes_no_resize():
    rng = np.random.default_rng(11)
    shapes = [(2, 6, 8), (2, 8, 6), (2, 7, 7)] * 6
    xs = [rng.normal(size=s).astype(np.float32) for s in shapes]
    ys = np.array([x.mean() for x in xs]) * 2.0
    opts = CNNOpt(
        resize=False, channels=[2, 4, 1], kernels=[3, 3], pools=[False, False],
        linear=[], max_epoch=4, milestones=[3], batch_size=1,
    )
    data = (xs[:12], xs[12:], ys[:12], ys[12:])
    best, _ = fit_CNN(data, opts, plot=False)
    assert best["val_est"].shape == (6,)
    assert np.isfinite(best["val_est"]).all()


def test_af_baseline_accuracy():
    rng = np.random.default_rng(12)
    f = 6
    xs = rng.normal(size=(200, f))
    w = rng.normal(size=f)
    y = (xs @ w > 0).astype(int)
    data = ([x for x in xs[:150]], [x for x in xs[150:]], y[:150], y[150:])
    res = fit_af(data, weight=3.0)
    acc = float(np.mean(res["val_est"] == y[150:]))
    assert acc > 0.85


def test_dcsb_baseline_runs_and_predicts():
    rng = np.random.default_rng(13)
    n = 60
    feats, rewards, gt_counts = [], [], []
    for _ in range(n):
        k = rng.integers(1, 8)
        conf = rng.uniform(0.2, 1.0, size=k)
        area = rng.uniform(0.01, 0.9, size=k)
        feats.append((conf, area))
        gt = rng.integers(0, 6)
        gt_counts.append(gt)
        rewards.append(int(k > 4))
    rewards = np.asarray(rewards)
    data = (feats[:40], feats[40:], rewards[:40], rewards[40:])
    res = fit_dcsb(data, np.asarray(gt_counts[:40]))
    assert set(np.unique(res["val_est"])) <= {0, 1}
    assert res["train_est"].shape == (40,)


def test_tree_exact_splits_match_sklearn():
    """Deterministic exact-split oracle (round-5 VERDICT #9): when every
    distinct feature value lands in its own quantile bin, the histogram
    tree's candidate split set equals the exact greedy tree's, so a single
    unit-rate GBR stage (prediction = mean + depth-2 variance-reduction
    tree on the residual) must reproduce sklearn's
    DecisionTreeRegressor(max_depth=2) predictions — identical partition
    and leaf means, not just 'comparable MSE'."""
    from sklearn.tree import DecisionTreeRegressor

    from edgeml_tpu.estimators.trees import _GBR, GBROpt

    rng = np.random.default_rng(17)
    n = 120
    # few distinct values per feature, well separated -> one bin each
    x = rng.integers(0, 7, size=(n, 3)).astype(np.float32) * 1.7 - 4.0
    # ground truth depends on a depth-2 structure + noise to break gain ties
    y = (
        np.where(x[:, 0] > 0, 3.0, -2.0)
        + np.where(x[:, 1] > -1.0, 1.0, 0.0) * np.where(x[:, 0] > 0, 1.0, -1.5)
        + 0.01 * rng.normal(size=n)
    ).astype(np.float64)

    model = _GBR(GBROpt(n_estimators=1, learning_rate=1.0, subsample=1.0,
                        max_depth=2, min_samples_split=2, n_bins=64))
    state = model.fit(x, y)
    got = np.asarray(model.predict(state, x), np.float64)

    sk = DecisionTreeRegressor(max_depth=2, criterion="squared_error",
                               random_state=0).fit(x, y)
    want = sk.predict(x)
    # identical partitions -> identical leaf means (f32 vs f64 rounding)
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-5)
    # the partition itself: samples sharing a prediction must share a leaf
    leaf = sk.apply(x)
    for v in np.unique(np.round(got, 4)):
        sel = np.abs(got - v) < 1e-4
        assert len(np.unique(leaf[sel])) == 1, "partition mismatch"

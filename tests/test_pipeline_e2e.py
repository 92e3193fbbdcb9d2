"""End-to-end pipeline: dataset -> rewards -> split -> features ->
estimators -> baselines -> offloading evaluation, via the real CLI mains."""

import os
import sys
import types

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from test_io_and_reward import write_dataset


@pytest.fixture(scope="module")
def pipeline(tmp_path_factory):
    """Run the whole pipeline once into a temp tree; share across tests."""
    tmp = tmp_path_factory.mktemp("pipe")
    rng = np.random.default_rng(42)
    dirs = write_dataset(tmp, rng, n_img=12, n_cls=3)

    import reward as reward_cli

    ns = types.SimpleNamespace(
        weak_dir=dirs["weak"],
        strong_dir=dirs["strong"],
        label_dir=dirs["label"],
        save_dir=str(tmp / "rewards"),
        method="orie",
        num_ensemble=4,
        seed=0,
        verbose=False,
    )
    reward_cli.main(ns)
    ns.method = "dcsb"
    reward_cli.main(ns)

    from edgeml_tpu.dataprep import split_dataset

    split_path = str(tmp / "split.npy")
    split_dataset(12, 3, split_path)

    # Output features (stage 24).
    import data_processing.extract_feature as ef_cli

    feat_dir = str(tmp / "features")
    ef_cli.main(
        types.SimpleNamespace(
            output_dir=dirs["weak"],
            save_dir=feat_dir,
            label_dir=dirs["label"],
            k=4,
            dataset="voc",  # 20 classes -> 20 + 20 = 40-dim vectors
        )
    )
    return types.SimpleNamespace(tmp=tmp, dirs=dirs, split=split_path, feat=feat_dir)


def test_reward_files(pipeline):
    data = np.load(pipeline.tmp / "rewards" / "orie4.npz")
    assert data["reward"].shape == (12,)
    assert float(data["time"]) > 0
    dcsb = np.load(pipeline.tmp / "rewards" / "dcsb.npz")
    assert dcsb["reward"].dtype.kind == "i"


def test_regression_cli_linear_and_cnn(pipeline):
    import regression as reg_cli

    for model, out in (("LR", "est_lr"), ("KNR", "est_knr")):
        ns = types.SimpleNamespace(
            data_dir=pipeline.feat,
            reward_path=str(pipeline.tmp / "rewards" / "orie4.npz"),
            split_path=pipeline.split,
            save_dir=str(pipeline.tmp / out),
            normalize=False,
            weight=False,
            stage=24,
            resize=0,
            model=model,
            model_dir="",
        )
        reg_cli.main(ns)
        for k in (1, 2, 3):
            est = np.load(pipeline.tmp / out / f"estimate{k}.npz")
            assert est["train_est"].shape == (8,)
            assert est["val_est"].shape == (4,)

    # CNN (MLP head on 40-dim output features) with normalization + weighting.
    ns = types.SimpleNamespace(
        data_dir=pipeline.feat,
        reward_path=str(pipeline.tmp / "rewards" / "orie4.npz"),
        split_path=pipeline.split,
        save_dir=str(pipeline.tmp / "est_cnn"),
        normalize=True,
        weight=True,
        stage=24,
        resize=0,
        model="CNN",
        model_dir=str(pipeline.tmp / "cnn_wts"),
    )
    import edgeml_tpu.estimators.train_cnn as tc

    # shrink training for test speed
    import regression as reg_cli2

    orig = tc.CNNOpt

    class SmallCNNOpt(tc.CNNOpt):
        def __init__(self):
            super().__init__(
                linear=[40, 8, 1], max_epoch=6, milestones=[4], batch_size=4
            )

    reg_cli2.CNNOpt = SmallCNNOpt
    try:
        reg_cli2.main(ns)
    finally:
        reg_cli2.CNNOpt = orig
    for d in ("est_cnn_best", "est_cnn_last"):
        est = np.load(pipeline.tmp / d / "estimate1.npz")
        assert est["val_est"].shape == (4,)
    # weights saved per fold, best/last
    assert (pipeline.tmp / "cnn_wts_best" / "wts1.npz").exists()
    assert (pipeline.tmp / "cnn_wts_last" / "wts3.npz").exists()


def test_baseline_cli(pipeline):
    import baseline as base_cli

    ns = types.SimpleNamespace(
        data_dir=pipeline.feat,
        reward_path=str(pipeline.tmp / "rewards" / "orie4.npz"),
        split_path=pipeline.split,
        save_dir=str(pipeline.tmp / "est_af"),
        baseline="af",
        positive_weight=3.0,
        label_dir="",
        model_dir="",
    )
    base_cli.main(ns)
    est = np.load(pipeline.tmp / "est_af" / "3.0" / "estimate1.npz")
    assert set(np.unique(est["val_est"])) <= {0, 1}

    ns.data_dir = pipeline.dirs["weak"]
    ns.save_dir = str(pipeline.tmp / "est_dcsb")
    ns.baseline = "dcsb"
    ns.label_dir = pipeline.dirs["label"]
    base_cli.main(ns)
    est = np.load(pipeline.tmp / "est_dcsb" / "estimate2.npz")
    assert est["train_est"].shape == (8,)


def test_eval_cli_against_oracle(pipeline):
    import test as test_cli

    ns = types.SimpleNamespace(
        weak_dir=pipeline.dirs["weak"],
        strong_dir=pipeline.dirs["strong"],
        label_dir=pipeline.dirs["label"],
        split_path=pipeline.split,
        save_dir=str(pipeline.tmp / "eval"),
        estimates=[str(pipeline.tmp / "est_lr"), str(pipeline.tmp / "est_knr")],
    )
    test_cli.main(ns)
    result = np.load(pipeline.tmp / "eval" / "test_map.npy")
    assert result.shape == (2, 11)
    assert np.isfinite(result).all()

    # Oracle check of one ratio point: ratio 0 offloads (almost) nothing...
    # verify against a direct masked_map with the same threshold rule.
    from edgeml_tpu.data import set_data
    from edgeml_tpu.eval import offload_masks_for_estimates
    from oracle import masked_map

    weak, strong, labels = set_data(
        pipeline.dirs["weak"], pipeline.dirs["strong"], pipeline.dirs["label"]
    )
    split = np.load(pipeline.split)
    masks = offload_masks_for_estimates(str(pipeline.tmp / "est_lr"), split)
    for ri in (0, 5, 10):
        want = masked_map(
            weak, strong, labels, ~masks[ri], masks[ri], np.ones(12, bool)
        )
        assert result[0, ri] == pytest.approx(want, abs=3e-5)

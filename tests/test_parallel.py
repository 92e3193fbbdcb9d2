"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from edgeml_tpu.parallel import make_mesh, shard_along, replicate, SmoothedValue
from edgeml_tpu.reward import orie_rewards
from oracle import make_random_dataset


def test_virtual_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_orie_matches_single_device():
    rng = np.random.default_rng(31)
    weak, strong, labels = make_random_dataset(rng, n_img=16)
    single = orie_rewards(weak, strong, labels, num_ensemble=4, seed=3)
    mesh = make_mesh(("dp",))
    sharded = orie_rewards(weak, strong, labels, num_ensemble=4, seed=3, mesh=mesh)
    assert np.allclose(single, sharded, atol=1e-5)


def test_shard_along_places_data():
    mesh = make_mesh(("dp",))
    x = jnp.arange(32.0).reshape(16, 2)
    xs = shard_along(x, mesh)
    assert xs.sharding.is_fully_replicated is False
    assert np.allclose(np.asarray(xs), np.asarray(x))
    xr = replicate(x, mesh)
    assert xr.sharding.is_fully_replicated


def test_sharded_map_kernel_runs():
    # dataset mAP with masks sharded across the mesh
    from edgeml_tpu.ops.map_kernel import build_pool, dataset_map

    rng = np.random.default_rng(33)
    weak, strong, labels = make_random_dataset(rng, n_img=12)
    pool = build_pool(weak, strong, labels)
    mesh = make_mesh(("dp",))
    masks = rng.random((8, 12)) < 0.5
    batched = jax.jit(jax.vmap(lambda m: dataset_map(pool, m)))
    got = batched(shard_along(jnp.asarray(masks), mesh))
    want = batched(jnp.asarray(masks))
    assert np.allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_smoothed_value():
    v = SmoothedValue(window_size=3)
    for x in (1.0, 2.0, 3.0, 4.0):
        v.update(x)
    assert v.value == 4.0
    assert v.median == 3.0
    assert v.global_avg == pytest.approx(2.5)
    v.synchronize_between_processes()  # single-process no-op
    assert v.count == 4


def test_reward_cli_uses_auto_mesh(tmp_path, monkeypatch):
    """Root reward.py on the 8-device CPU platform: the auto-built mesh path
    must produce the same orie{E}.npz as an explicitly single-device run
    (VERDICT round-1 item 7: multi-chip ORIE reachable from the CLI)."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import types

    import reward as reward_cli
    from edgeml_tpu.reward import compute_rewards
    from edgeml_tpu.data import set_data

    rng = np.random.default_rng(7)
    for name in ("weak", "strong", "labels"):
        (tmp_path / name).mkdir()
    for i in range(10):
        stem = f"im{i:02d}"
        rows = []
        for _ in range(rng.integers(1, 4)):
            c = rng.integers(0, 3)
            x, y = rng.uniform(0.3, 0.7, 2)
            w, h = rng.uniform(0.1, 0.3, 2)
            rows.append(f"{c} {x:.4f} {y:.4f} {w:.4f} {h:.4f}")
        (tmp_path / "labels" / f"{stem}.txt").write_text("\n".join(rows) + "\n")
        for d in ("weak", "strong"):
            (tmp_path / d / f"{stem}.txt").write_text(
                "\n".join(r + f" {rng.uniform(0.2, 0.9):.4f}" for r in rows) + "\n"
            )

    ns = types.SimpleNamespace(
        weak_dir=str(tmp_path / "weak"), strong_dir=str(tmp_path / "strong"),
        label_dir=str(tmp_path / "labels"), save_dir=str(tmp_path / "out"),
        method="orie", num_ensemble=5, seed=3, verbose=False, batch=8,
    )
    reward_cli.main(ns)  # 8 visible devices -> auto mesh engages
    via_cli = np.load(tmp_path / "out" / "orie5.npz")["reward"]

    weak, strong, labels = set_data(ns.weak_dir, ns.strong_dir, ns.label_dir)
    single, _ = compute_rewards(
        weak, strong, labels, num_ensemble=5, seed=3, mesh=None, batch=8
    )
    assert np.allclose(via_cli, single, atol=1e-5)


def test_sharded_run_detection_matches_single(tmp_path):
    """run_detection with a mesh (batch sharded over 8 CPU devices,
    weights replicated) writes the same files as the single-device path."""
    from edgeml_tpu.models.infer import run_detection
    from edgeml_tpu.models.yolov5 import YoloV5

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(11)
    for i in range(9):  # 2 chunks of 8 + padded tail
        np.save(img_dir / f"im{i}.npy",
                rng.random((40, 56, 3)).astype(np.float32))

    net = YoloV5(variant="n", num_classes=8, img_size=64)
    params, stats = net.init(jax.random.PRNGKey(2))
    kw = dict(batch_size=8, conf_thres=1e-6, iou_thres=0.5, img_size=64)
    run_detection(net, params, stats, str(img_dir), str(tmp_path / "single"),
                  **kw)
    run_detection(net, params, stats, str(img_dir), str(tmp_path / "sharded"),
                  mesh=make_mesh(("dp",)), **kw)
    for i in range(9):
        a = np.load(tmp_path / "single" / f"im{i}.npy")
        b = np.load(tmp_path / "sharded" / f"im{i}.npy")
        np.testing.assert_allclose(a, b, atol=1e-5)
    assert sum(np.load(tmp_path / "single" / f"im{i}.npy").size
               for i in range(9)) > 0

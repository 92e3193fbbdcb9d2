"""Detector train/detect CLI smoke tests on tiny synthetic data."""

import os
import sys
import types

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tpu_models"))

from edgeml_tpu.models.loss import yolo_loss
from edgeml_tpu.models.train import pad_targets


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("det")
    img_dir = tmp / "images"
    lab_dir = tmp / "labels"
    img_dir.mkdir()
    lab_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(8):
        img = rng.random((48, 64, 3)).astype(np.float32)
        np.save(img_dir / f"im{i}.npy", img)
        rows = []
        for _ in range(rng.integers(1, 4)):
            c = rng.integers(0, 20)
            x, y = rng.uniform(0.3, 0.7, 2)
            w, h = rng.uniform(0.1, 0.3, 2)
            rows.append(f"{c} {x:.4f} {y:.4f} {w:.4f} {h:.4f}")
        (lab_dir / f"im{i}.txt").write_text("\n".join(rows) + "\n")
    return tmp, str(img_dir), str(lab_dir)


def test_train_cli_runs_and_checkpoints(dataset):
    tmp, img_dir, lab_dir = dataset
    import train as train_cli

    ns = types.SimpleNamespace(
        img_dir=img_dir,
        save_dir=str(tmp / "ckpt"),
        label_dir=lab_dir,
        model="yolov5n",
        dataset="voc",
        batch_size=4,
        epochs=2,
        opt="sgd",
        lr=0.01,
        momentum=0.9,
        weight_decay=1e-4,
        lr_scheduler="multisteplr",
        lr_steps=[16, 22],
        lr_gamma=0.1,
        resume="",
        start_epoch=0,
        img_size=64,
        max_targets=8,
        print_freq=1,
        seed=0,
    )
    train_cli.main(ns)
    assert (tmp / "ckpt" / "checkpoint.pth").exists()
    assert (tmp / "ckpt" / "model_0.pth").exists()
    # resume from the checkpoint
    ns.resume = str(tmp / "ckpt" / "checkpoint.pth")
    ns.epochs = 3
    train_cli.main(ns)


def test_detect_cli_writes_outputs(dataset):
    tmp, img_dir, lab_dir = dataset
    import detect as detect_cli

    ns = types.SimpleNamespace(
        img_dir=img_dir,
        save_dir=str(tmp / "dets"),
        dataset="coco",
        model="yolov5n",
        model_path="",
        batch_size=4,
        conf_thres=0.001,
        iou_thres=0.6,
        format="npy",
    )
    detect_cli.main(ns)
    files = sorted(os.listdir(tmp / "dets"))
    assert files == [f"im{i}.npy" for i in range(8)]
    arr = np.load(tmp / "dets" / "im0.npy")
    assert arr.ndim == 2 and (arr.shape[1] == 6 or arr.shape[0] == 0)
    if arr.size:
        assert (arr[:, 1:5] >= 0).all() and (arr[:, 1:5] <= 1).all()


def test_loss_decreases_on_overfit():
    import jax
    import jax.numpy as jnp

    from edgeml_tpu.models.train import TrainConfig, make_train_step
    from edgeml_tpu.models.yolov5 import YoloV5

    net = YoloV5(variant="n", num_classes=4, img_size=64)
    params, stats = net.init(jax.random.PRNGKey(0))
    cfg = TrainConfig(opt="sgd", lr=0.005)
    opt, step = make_train_step(net, cfg)
    opt_state = opt.init(params)
    rng = np.random.default_rng(1)
    images = jnp.asarray(rng.random((2, 64, 64, 3)), jnp.float32)
    targets, valid = pad_targets(
        [np.array([[1, 0.5, 0.5, 0.4, 0.4]], np.float32)] * 2, 4
    )
    targets, valid = jnp.asarray(targets), jnp.asarray(valid)
    losses = []
    for _ in range(12):
        params, stats, opt_state, loss, _ = step(
            params, stats, opt_state, images, targets, valid, 0.005
        )
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_train_cli_ssd_family(dataset):
    tmp, img_dir, lab_dir = dataset
    import train as train_cli

    ns = types.SimpleNamespace(
        img_dir=img_dir,
        save_dir="",
        label_dir=lab_dir,
        model="ssd",
        dataset="voc",
        batch_size=4,
        epochs=1,
        opt="sgd",
        lr=0.001,
        momentum=0.9,
        weight_decay=1e-4,
        lr_scheduler="multisteplr",
        lr_steps=[16, 22],
        lr_gamma=0.1,
        resume="",
        start_epoch=0,
        img_size=320,
        max_targets=8,
        print_freq=1,
        seed=0,
    )
    train_cli.main(ns)


def test_train_cli_direct_voc(tmp_path):
    """--voc-root: train straight from raw VOC XML annotations (reference
    torch_models/train.py:70-76 consumes VOCDetection directly)."""
    from PIL import Image

    rng = np.random.default_rng(0)
    for year in ("2007", "2012"):
        base = tmp_path / "VOCdevkit" / f"VOC{year}"
        (base / "ImageSets" / "Main").mkdir(parents=True)
        (base / "JPEGImages").mkdir()
        (base / "Annotations").mkdir()
        ids = []
        for i in range(4):
            img_id = f"{year}_{i:04d}"
            ids.append(img_id)
            w, h = int(rng.integers(50, 90)), int(rng.integers(50, 90))
            arr = (rng.random((h, w, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(base / "JPEGImages" / f"{img_id}.jpg")
            objs = ""
            for _ in range(int(rng.integers(1, 3))):
                xmin, ymin = rng.integers(1, w // 2), rng.integers(1, h // 2)
                xmax, ymax = xmin + rng.integers(5, w // 2), ymin + rng.integers(5, h // 2)
                objs += (
                    "<object><name>dog</name><difficult>0</difficult>"
                    f"<bndbox><xmin>{xmin}</xmin><ymin>{ymin}</ymin>"
                    f"<xmax>{xmax}</xmax><ymax>{ymax}</ymax></bndbox></object>"
                )
            # one difficult object that must be skipped
            objs += (
                "<object><name>cat</name><difficult>1</difficult>"
                "<bndbox><xmin>1</xmin><ymin>1</ymin><xmax>9</xmax>"
                "<ymax>9</ymax></bndbox></object>"
            )
            (base / "Annotations" / f"{img_id}.xml").write_text(
                f"<annotation><size><width>{w}</width><height>{h}</height>"
                f"</size>{objs}</annotation>"
            )
        (base / "ImageSets" / "Main" / "trainval.txt").write_text("\n".join(ids))

    import train as train_cli

    ns = types.SimpleNamespace(
        img_dir="", save_dir=str(tmp_path / "ckpt"), label_dir="",
        voc_root=str(tmp_path), model="yolov5n", dataset="voc",
        batch_size=4, epochs=1, opt="sgd", lr=0.01, momentum=0.9,
        weight_decay=1e-4, lr_scheduler="multisteplr", lr_steps=[16, 22],
        lr_gamma=0.1, resume="", start_epoch=0, img_size=64, max_targets=8,
        print_freq=1, seed=0,
    )
    train_cli.main(ns)
    assert (tmp_path / "ckpt" / "checkpoint.pth").exists()


def test_train_cli_with_augmentation(dataset):
    """--augment ssd: the full host augmentation pipeline feeds the streaming
    loader; loss must stay finite and checkpoints written."""
    tmp, img_dir, lab_dir = dataset
    import train as train_cli

    ns = types.SimpleNamespace(
        img_dir=img_dir, save_dir=str(tmp / "ckpt_aug"), label_dir=lab_dir,
        model="yolov5n", dataset="voc", batch_size=4, epochs=1, opt="sgd",
        lr=0.01, momentum=0.9, weight_decay=1e-4, lr_scheduler="multisteplr",
        lr_steps=[16, 22], lr_gamma=0.1, resume="", start_epoch=0,
        img_size=64, max_targets=8, print_freq=1, seed=0, augment="ssd",
    )
    train_cli.main(ns)
    assert (tmp / "ckpt_aug" / "checkpoint.pth").exists()


def test_train_cli_yolo_augment_hsv_modes(dataset):
    """--augment yolo with HSV on the device (default) and on the host:
    both run the full mosaic/affine/flip recipe through the streaming
    loader; the device mode applies ops/color.hsv_jitter inside the step."""
    tmp, img_dir, lab_dir = dataset
    import train as train_cli

    for mode in ("device", "host"):
        ns = types.SimpleNamespace(
            img_dir=img_dir, save_dir=str(tmp / f"ckpt_yolo_{mode}"),
            label_dir=lab_dir, model="yolov5n", dataset="voc", batch_size=4,
            epochs=1, opt="sgd", lr=0.01, momentum=0.9, weight_decay=1e-4,
            lr_scheduler="multisteplr", lr_steps=[16, 22], lr_gamma=0.1,
            resume="", start_epoch=0, img_size=64, max_targets=8,
            print_freq=1, seed=0, augment="yolo", yolo_hsv=mode,
        )
        train_cli.main(ns)
        assert (tmp / f"ckpt_yolo_{mode}" / "checkpoint.pth").exists()


def test_detect_cli_torchvision_family(dataset):
    """detect.py with an anchor-family model (_detect_generic path): per-image
    files in the same normalized (cls, x, y, w, h, conf) contract, with the
    COCO 91->80 remap applied."""
    tmp, img_dir, lab_dir = dataset
    import detect as detect_cli

    ns = types.SimpleNamespace(
        img_dir=img_dir,
        save_dir=str(tmp / "dets_ssd"),
        dataset="coco",
        model="ssd",
        model_path="",
        batch_size=4,
        conf_thres=0.001,
        iou_thres=0.6,
        format="npy",
    )
    detect_cli.main(ns)
    files = sorted(os.listdir(tmp / "dets_ssd"))
    assert files == [f"im{i}.npy" for i in range(8)]
    got_rows = 0
    for f in files:
        arr = np.load(tmp / "dets_ssd" / f)
        assert arr.ndim == 2 and (arr.shape[0] == 0 or arr.shape[1] == 6)
        if arr.size:
            got_rows += arr.shape[0]
            assert (arr[:, 0] >= 0).all() and (arr[:, 0] <= 79).all()
            assert (arr[:, 1:5] >= 0).all() and (arr[:, 1:5] <= 1).all()
    assert got_rows > 0  # random weights at conf 1e-3 must emit something


def test_ema_update_math():
    """make_ema_update implements the ultralytics ramp
    d(n) = decay*(1-exp(-n/tau)) with ema <- ema + (1-d)(value-ema)."""
    import jax.numpy as jnp

    from edgeml_tpu.models.train import make_ema_update

    upd = make_ema_update(decay=0.9, tau=10.0)
    ema = {"params": {"w": jnp.ones((3,))}}
    e_np = np.ones(3)
    v_np = 2.0 * np.ones(3)
    for n in (1, 2, 3):
        ema = upd(ema, {"params": {"w": jnp.asarray(v_np)}}, float(n))
        d = 0.9 * (1.0 - np.exp(-n / 10.0))
        e_np = e_np + (1.0 - d) * (v_np - e_np)
        np.testing.assert_allclose(
            np.asarray(ema["params"]["w"]), e_np, rtol=1e-6
        )


def test_train_ema_and_native_checkpoint_serving(dataset):
    """--ema checkpoints an EMA shadow; detect.py serves a NATIVE training
    checkpoint directly (EMA weights preferred), closing the train->serve
    loop without a torch state_dict round trip."""
    import pickle

    import jax

    tmp, img_dir, lab_dir = dataset
    import detect as detect_cli
    import train as train_cli

    ns = types.SimpleNamespace(
        img_dir=img_dir,
        save_dir=str(tmp / "ckpt_ema"),
        label_dir=lab_dir,
        model="yolov5n",
        dataset="voc",
        batch_size=4,
        epochs=1,
        opt="sgd",
        lr=0.01,
        momentum=0.9,
        weight_decay=1e-4,
        lr_scheduler="multisteplr",
        lr_steps=[16, 22],
        lr_gamma=0.1,
        resume="",
        start_epoch=0,
        img_size=64,
        max_targets=8,
        print_freq=1,
        seed=0,
        ema=True,
    )
    train_cli.main(ns)
    ckpt = tmp / "ckpt_ema" / "checkpoint.pth"
    with open(ckpt, "rb") as f:
        payload = pickle.load(f)
    assert "ema" in payload
    assert int(payload["ema"]["n_updates"]) == 2  # 8 imgs / bs 4, 1 epoch
    # the shadow must differ from the live weights (decay-weighted history)
    w_live = payload["model"]["params"]
    w_ema = payload["ema"]["params"]
    leaves_l = jax.tree_util.tree_leaves(w_live)
    leaves_e = jax.tree_util.tree_leaves(w_ema)
    assert any(
        not np.array_equal(a, b) for a, b in zip(leaves_l, leaves_e)
    )

    # resume keeps the ramp position going
    ns.resume = str(ckpt)
    ns.epochs = 2
    train_cli.main(ns)
    with open(ckpt, "rb") as f:
        payload2 = pickle.load(f)
    assert int(payload2["ema"]["n_updates"]) == 4

    # serve straight from the native checkpoint (EMA path)
    dns = types.SimpleNamespace(
        img_dir=img_dir,
        save_dir=str(tmp / "dets_native"),
        dataset="voc",
        model="yolov5n",
        model_path=str(ckpt),
        batch_size=4,
        conf_thres=0.001,
        iou_thres=0.6,
        format="npy",
    )
    detect_cli.main(dns)
    files = sorted(os.listdir(tmp / "dets_native"))
    assert files == [f"im{i}.npy" for i in range(8)]


def test_yolo_recipe_schedule_and_decay_mask():
    """yolo_recipe_config: one_cycle cosine floor at lr*lrf, epoch-based
    warmup ramp, and weight decay masked off BN gains / biases."""
    import jax
    import jax.numpy as jnp

    from edgeml_tpu.models.train import (
        lr_at, make_optimizer, yolo_recipe_config,
    )

    cfg = yolo_recipe_config(epochs=10)
    spe = 100
    # end of schedule sits at the lrf floor, start (post-warmup) near lr
    assert lr_at(cfg, 10, 0, spe) == pytest.approx(cfg.lr * cfg.lrf, rel=1e-6)
    # warmup: linear in global iteration over warmup_epochs * spe
    g_half = int(cfg.warmup_epochs * spe) // 2
    e, i = divmod(g_half, spe)
    cos_e = cfg.lr * ((1 - np.cos(np.pi * e / cfg.epochs)) / 2 * (cfg.lrf - 1) + 1)
    assert lr_at(cfg, e, i, spe) == pytest.approx(cos_e * 0.5, rel=1e-6)
    # past warmup, no damping
    assert lr_at(cfg, 4, 0, spe) == pytest.approx(
        cfg.lr * ((1 - np.cos(np.pi * 4 / cfg.epochs)) / 2 * (cfg.lrf - 1) + 1),
        rel=1e-6,
    )

    # decay mask: zero gradients -> update is -wd*w on kernels, 0 on g/b
    params = {
        "w": jnp.ones((3, 3, 4, 4)),
        "g": jnp.ones((4,)),
        "b": jnp.ones((4,)),
    }
    opt = make_optimizer(cfg)
    state = opt.init(params)
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    upd, _ = opt.update(zeros, state, params)
    # first nesterov step applies g + momentum*trace = wd*w*(1 + momentum)
    np.testing.assert_allclose(
        np.asarray(upd["w"]),
        -cfg.weight_decay * (1 + cfg.momentum) * np.ones((3, 3, 4, 4)),
        rtol=1e-6,
    )
    assert float(jnp.abs(upd["g"]).max()) == 0.0
    assert float(jnp.abs(upd["b"]).max()) == 0.0


def test_train_cli_yolo_preset(dataset):
    """--preset yolo trains end-to-end (ultralytics optimizer recipe)."""
    tmp, img_dir, lab_dir = dataset
    import train as train_cli

    ns = types.SimpleNamespace(
        img_dir=img_dir,
        save_dir=str(tmp / "ckpt_preset"),
        label_dir=lab_dir,
        model="yolov5n",
        dataset="voc",
        batch_size=4,
        epochs=1,
        opt="sgd",
        lr=0.01,
        momentum=0.9,
        weight_decay=1e-4,
        lr_scheduler="multisteplr",
        lr_steps=[16, 22],
        lr_gamma=0.1,
        resume="",
        start_epoch=0,
        img_size=64,
        max_targets=8,
        print_freq=1,
        seed=0,
        preset="yolo",
        ema=True,
    )
    train_cli.main(ns)
    assert (tmp / "ckpt_preset" / "checkpoint.pth").exists()


def test_orbax_checkpoint_roundtrip(tmp_path):
    """backend='orbax' save + directory load round trip, including the
    detect.py native-payload sniff on an orbax directory checkpoint."""
    import jax
    import jax.numpy as jnp

    from edgeml_tpu.models.train import (
        TrainConfig, load_checkpoint, make_optimizer, save_checkpoint,
    )

    cfg = TrainConfig()
    params = {"w": jnp.arange(12.0).reshape(3, 4), "b": jnp.ones((4,))}
    stats = {"m": jnp.zeros((4,)), "v": jnp.ones((4,))}
    opt = make_optimizer(cfg)
    opt_state = opt.init(params)
    path = str(tmp_path / "ckpt_orbax")
    save_checkpoint(path, params, stats, opt_state, cfg, 7, backend="orbax")
    p2, s2, o2, payload = load_checkpoint(path)
    assert payload["epoch"] == 7
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(stats),
                    jax.tree_util.tree_leaves(s2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    import detect as detect_cli

    native = detect_cli._native_payload(path)
    assert native is not None and "params" in native["model"]


@pytest.mark.parametrize("dtype_name", ["f32", "bf16"])
def test_uint8_input_interface_matches_f32(dtype_name):
    """The uint8 deployment input (models/infer.py: device-side /255
    normalization, the reference's cv2-letterbox-then-float convention)
    produces detections identical to feeding the host-normalized f32
    batch — bit-equal: the same f32 division runs either way."""
    import jax
    import jax.numpy as jnp

    from edgeml_tpu.models.infer import _detect_batch
    from edgeml_tpu.models.yolov5 import YoloV5

    dtype = None if dtype_name == "f32" else jnp.bfloat16
    net = YoloV5(variant="n", num_classes=80, img_size=64)
    params, stats = net.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(4)
    u8 = jnp.asarray(rng.integers(0, 256, (4, 64, 64, 3), np.uint8))
    f32 = u8.astype(jnp.float32) / 255.0
    meta = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]]), (4, 1))
    hw = jnp.tile(jnp.asarray([[64.0, 64.0]]), (4, 1))
    d_u8, v_u8 = _detect_batch(net, params, stats, u8, meta, hw, 1e-3, 0.5,
                               dtype=dtype)
    d_f, v_f = _detect_batch(net, params, stats, f32, meta, hw, 1e-3, 0.5,
                             dtype=dtype)
    np.testing.assert_array_equal(np.asarray(v_u8), np.asarray(v_f))
    np.testing.assert_array_equal(np.asarray(d_u8), np.asarray(d_f))

"""End-to-end proof of the composed YOLO training recipe.

VERDICT r3 item 7: the pieces of the ultralytics-style recipe (--augment
yolo mosaic/HSV/affine, --preset yolo nesterov/one_cycle/masked-decay,
--ema, --bf16) each have their own tests, but nothing proved the COMPOSED
recipe converges. This drives the actual train CLI on a learnable synthetic
dataset (bright class-colored rectangles on a dark background — box
positions are recoverable from pixels, so detection genuinely trains),
asserts falling loss AND rising evaluate() mAP across epochs, resumes from
a mid-run checkpoint, and serves the final EMA checkpoint through detect.py.

Reference analogue: yolov5_scripts.md:9 (the 300-epoch ultralytics recipe
that produced the reference's detectors), compressed to a CPU-sized smoke.
"""

import os
import sys
import types

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tpu_models"))

IMG_SIZE = 64
N_IMG = 20
COLORS = {0: (0.95, 0.2, 0.1), 1: (0.1, 0.35, 0.95)}


@pytest.fixture(scope="module")
def drawable_dataset(tmp_path_factory):
    """Images whose objects are literally visible: class-colored solid
    rectangles on a dark noisy background, labels matching exactly."""
    tmp = tmp_path_factory.mktemp("recipe")
    img_dir = tmp / "images"
    lab_dir = tmp / "labels"
    img_dir.mkdir()
    lab_dir.mkdir()
    rng = np.random.default_rng(3)
    gt_rows = []
    for i in range(N_IMG):
        img = rng.random((IMG_SIZE, IMG_SIZE, 3)).astype(np.float32) * 0.15
        rows = []
        for _ in range(2):
            c = int(rng.integers(0, 2))
            w, h = rng.uniform(0.25, 0.45, 2)
            x = rng.uniform(w / 2 + 0.02, 1 - w / 2 - 0.02)
            y = rng.uniform(h / 2 + 0.02, 1 - h / 2 - 0.02)
            x1 = int((x - w / 2) * IMG_SIZE)
            x2 = int((x + w / 2) * IMG_SIZE)
            y1 = int((y - h / 2) * IMG_SIZE)
            y2 = int((y + h / 2) * IMG_SIZE)
            img[y1:y2, x1:x2] = COLORS[c]
            rows.append((c, x, y, w, h))
        np.save(img_dir / f"im{i:02d}.npy", img)
        (lab_dir / f"im{i:02d}.txt").write_text(
            "\n".join(f"{c} {x:.4f} {y:.4f} {w:.4f} {h:.4f}"
                      for c, x, y, w, h in rows) + "\n"
        )
        gt_rows.append(np.array(rows, np.float32))
    return tmp, str(img_dir), str(lab_dir), gt_rows


def _ns(img_dir, lab_dir, save_dir, epochs, resume=""):
    return types.SimpleNamespace(
        img_dir=img_dir, save_dir=save_dir, label_dir=lab_dir,
        model="yolov5n", dataset="voc", batch_size=4, epochs=epochs,
        opt="sgd", lr=0.01, momentum=0.9, weight_decay=1e-4,
        lr_scheduler="multisteplr", lr_steps=[16, 22], lr_gamma=0.1,
        resume=resume, start_epoch=0, img_size=IMG_SIZE, max_targets=16,
        print_freq=100, seed=0,
        # the full composed recipe
        augment="yolo", yolo_hsv="device", preset="yolo", ema=True,
        bf16=True,
    )


@pytest.fixture(scope="module")
def trained(drawable_dataset):
    """Train the FULL composed recipe once (mid-run stop + resume included);
    both the convergence test and the int8 PTQ-delta test consume it."""
    import train as train_cli

    tmp, img_dir, lab_dir, gt_rows = drawable_dataset
    images = [np.load(os.path.join(img_dir, f"im{i:02d}.npy"))
              for i in range(N_IMG)]
    ckpt_dir = str(tmp / "ckpt")
    # phase 1: part of the run, then STOP (checkpoint-resume mid-run is part
    # of the recipe contract — train.py:110-136 in the reference)
    out1 = train_cli.main(_ns(img_dir, lab_dir, ckpt_dir, epochs=6))
    ckpt = os.path.join(ckpt_dir, "checkpoint.pth")
    assert os.path.exists(ckpt)
    assert len(out1["epoch_loss"]) == 6
    # phase 2: resume to the full 30 epochs (~180 steps — enough for the
    # recipe to genuinely detect the drawable objects at 64 px)
    out2 = train_cli.main(
        _ns(img_dir, lab_dir, ckpt_dir, epochs=30, resume=ckpt)
    )
    net = out2["state"][0]
    losses = out1["epoch_loss"] + out2["epoch_loss"]
    return net, losses, out2["ema"], ckpt, images


def test_full_yolo_recipe_converges_and_serves(drawable_dataset, trained):
    import detect as detect_cli

    from edgeml_tpu.models.engine import evaluate, make_detector

    tmp, img_dir, lab_dir, gt_rows = drawable_dataset
    net, losses, ema, ckpt, images = trained

    # baseline mAP at random init (same seed/arch the CLI builds)
    _, p0, s0 = make_detector("yolov5n", 20, IMG_SIZE)
    init_sum = evaluate(net, p0, s0, images, gt_rows, batch_size=4,
                        conf_thres=0.01)
    init_map50 = float(init_sum["map50"])

    assert len(losses) == 30
    assert np.isfinite(losses).all()
    # falling loss: the composed recipe must actually optimize
    assert np.mean(losses[-3:]) < np.mean(losses[:3]), losses

    # rising mAP: final EMA weights must beat random init on the train set
    final_sum = evaluate(
        net, ema["params"], ema["stats"], images, gt_rows, batch_size=4,
        conf_thres=0.01,
    )
    final_map50 = float(final_sum["map50"])
    assert final_map50 > init_map50, (init_map50, final_map50)
    assert final_map50 > 0.05, final_map50  # genuinely detects, not noise

    # the EMA checkpoint serves through detect.py (train->serve loop)
    dns = types.SimpleNamespace(
        img_dir=img_dir, save_dir=str(tmp / "dets"), dataset="voc",
        model="yolov5n", model_path=ckpt, batch_size=4,
        conf_thres=0.05, iou_thres=0.5, format="npy",
    )
    detect_cli.main(dns)
    files = sorted(os.listdir(tmp / "dets"))
    assert files == [f"im{i:02d}.npy" for i in range(N_IMG)]
    assert any(np.load(os.path.join(tmp, "dets", f)).size for f in files)


def test_int8_ptq_map_delta(drawable_dataset, trained):
    """The int8 PTQ accuracy number a --int8 user needs (VERDICT r3 weak #5,
    DIVERGENCES #18): dataset mAP of the quantized trunk vs the f32 path on
    a model that GENUINELY detects (the recipe-trained one), with a stated
    bound on the drop. Complements tests/test_quant.py's top-candidate
    agreement check, which pins fidelity but not accuracy."""
    import jax.numpy as jnp

    from edgeml_tpu.models.engine import evaluate
    from edgeml_tpu.models.quant import prepare_int8

    tmp, img_dir, lab_dir, gt_rows = drawable_dataset
    net, losses, ema, ckpt, images = trained
    params, stats = ema["params"], ema["stats"]

    f32_sum = evaluate(net, params, stats, images, gt_rows, batch_size=4,
                       conf_thres=0.01)
    f32_map50 = float(f32_sum["map50"])
    assert f32_map50 > 0.05  # precondition: the model detects

    # calibrate PTQ on the serving distribution itself (detect.py --int8
    # calibrates on the first batch of img_dir, models/infer.py)
    from edgeml_tpu.models.common import letterbox_batch

    calib, _ = letterbox_batch(images[:8], IMG_SIZE)
    q8 = prepare_int8(net, params, stats,
                      lambda i: jnp.asarray(calib), iters=1).tree
    int8_sum = evaluate(net, params, stats, images, gt_rows, batch_size=4,
                        conf_thres=0.01, q8=q8)
    int8_map50 = float(int8_sum["map50"])

    # stated bound: int8 PTQ keeps >= 80% of the f32 mAP@.5 on this set
    # (absolute drop also capped). Record the delta in the assertion message
    # so a failure states the measured numbers.
    drop = f32_map50 - int8_map50
    assert int8_map50 >= 0.8 * f32_map50 and drop <= 0.1, (
        f"int8 PTQ mAP@.5 {int8_map50:.4f} vs f32 {f32_map50:.4f} "
        f"(drop {drop:.4f})"
    )

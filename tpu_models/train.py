"""Train TPU-native detectors from scratch.

CLI-compatible rebuild of /root/reference/torch_models/train.py (same flags:
--model/-b/--epochs/--opt/--lr/--momentum/-wd/--lr-scheduler/--lr-steps/
--lr-gamma/--resume/--start-epoch; same model choices ssd / faster_rcnn /
retinanet plus yolov5*; same checkpoint protocol: checkpoint.pth every epoch,
model_{epoch}.pth every 10th, {model, optimizer, lr_scheduler, args, epoch}).
The per-family training step runs jitted on the accelerator with the batch
axis sharded over all local devices (data parallelism over ICI replacing the
reference's latent DDP).

Data: images + YOLO-format label files (the output of data_processing/label.py)
instead of raw torchvision VOCDetection — pass the image directory and
--label-dir.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _build_augment(name: str):
    """Train-time augmentation pipeline (host-side, edgeml_tpu/data/transforms).
    'none' matches the reference trainer (no augmentation applied,
    torch_models/train.py); 'flip' and 'ssd' mirror the torchvision presets."""
    if name in ("", "none"):
        return None
    from edgeml_tpu.data.transforms import (
        Compose, RandomHorizontalFlip, RandomIoUCrop,
        RandomPhotometricDistort, RandomZoomOut,
    )

    if name == "flip":
        return Compose([RandomHorizontalFlip(0.5)])
    if name == "ssd":
        return Compose([
            RandomPhotometricDistort(),
            RandomZoomOut(),
            RandomIoUCrop(),
            RandomHorizontalFlip(0.5),
        ])
    raise ValueError(f"unknown --augment '{name}' (none | flip | ssd | yolo)")


def main(opts):
    import jax
    import jax.numpy as jnp

    from edgeml_tpu.models.engine import make_detector, make_family_train_step
    from edgeml_tpu.models.train import (
        TrainConfig, load_checkpoint, lr_at, make_ema_update, pad_targets,
        save_checkpoint, yolo_recipe_config,
    )
    from edgeml_tpu.models.common import letterbox_batch
    from edgeml_tpu.data import load_data, list_image_names
    from edgeml_tpu.data.loader import iter_batches, list_images, resize_bilinear
    from edgeml_tpu.parallel import make_mesh, shard_along, replicate, MetricLogger

    if getattr(opts, "preset", "") == "yolo":
        # the ultralytics optimizer recipe wholesale (nesterov SGD 0.937,
        # one_cycle cosine to lrf=0.01, 3-epoch warmup, masked decay 5e-4);
        # only --epochs is taken from the CLI. Pair with --augment yolo --ema.
        cfg = yolo_recipe_config(epochs=opts.epochs)
        print(f"--preset yolo: using the ultralytics optimizer recipe {cfg}")
    else:
        cfg = TrainConfig(
            opt=opts.opt,
            lr=opts.lr,
            momentum=opts.momentum,
            weight_decay=opts.weight_decay,
            lr_scheduler=opts.lr_scheduler,
            lr_steps=tuple(opts.lr_steps),
            lr_gamma=opts.lr_gamma,
            epochs=opts.epochs,
        )
    num_classes = 20 if opts.dataset == "voc" else 80
    net, params, stats = make_detector(opts.model, num_classes, opts.img_size)
    is_yolo = opts.model.startswith("yolov5")
    size = net.img_size if is_yolo else net.image_size
    opt, step = make_family_train_step(
        net, cfg, dtype=jnp.bfloat16 if getattr(opts, "bf16", False) else None
    )
    opt_state = opt.init(params)

    # Model EMA (the ultralytics-recipe half the reference's YOLO training
    # relies on, yolov5_scripts.md:9): a decay-ramped shadow of params AND
    # BN statistics, carried per optimizer update and checkpointed under the
    # extra "ema" key. Serving (tpu_models/detect.py) prefers the EMA shadow
    # when a checkpoint carries one — the ultralytics convention.
    use_ema = bool(getattr(opts, "ema", False))
    ema_update = make_ema_update() if use_ema else None
    ema_tree, ema_n = None, 0

    if opts.resume:
        params, stats, opt_state, payload = load_checkpoint(opts.resume)
        opts.start_epoch = payload["epoch"] + 1
        if use_ema and "ema" in payload:
            ema_n = int(payload["ema"]["n_updates"])
            ema_tree = jax.tree_util.tree_map(
                jnp.asarray,
                {k: payload["ema"][k] for k in ("params", "stats")
                 if payload["ema"].get(k) is not None},
            )

    # Data: labels load up front (small — a few floats per object); images
    # stream from disk per batch with background-thread prefetch, so a
    # VOC-scale run (16k images, ~80 GB decoded at 640^2 f32) never has to
    # fit in host RAM. Peak RSS is (prefetch + 1) decoded batches.
    voc_root = getattr(opts, "voc_root", "")
    if voc_root:
        # Raw VOCdevkit consumption, matching the reference trainer's direct
        # VOCDetection datasets (torch_models/train.py:70-76) — no label
        # conversion stage. 07+12 trainval, the reference's training split.
        from edgeml_tpu.dataprep.labels import voc_examples

        files, raw_labels = voc_examples(
            voc_root, splits=(("2007", "trainval"), ("2012", "trainval"))
        )
        img_dir = ""  # files are absolute paths
    else:
        assert opts.label_dir, "--label-dir is required without --voc-root"
        img_dir = opts.img_dir
        names = list_image_names(opts.label_dir)
        img_files = list_images(opts.img_dir)
        by_stem = {".".join(f.split(".")[:-1]) or f: f for f in img_files}
        missing = [n for n in names if n not in by_stem]
        assert not missing, f"labels without images: {missing[:5]}..."
        files = [by_stem[n] for n in names]
        raw_labels = load_data(opts.label_dir, names, with_conf=False)

    def rows_for(lab, img, meta_i=None):
        cls, xyxy = lab
        if len(cls) == 0:
            return np.zeros((0, 5), np.float32)
        if meta_i is None:  # plain square resize keeps normalized coords
            x1, y1, x2, y2 = xyxy.T
        else:  # remap into letterbox space
            r, dw, dh = meta_i
            h, w = img.shape[:2]
            x1 = (xyxy[:, 0] * w * r + dw) / size
            y1 = (xyxy[:, 1] * h * r + dh) / size
            x2 = (xyxy[:, 2] * w * r + dw) / size
            y2 = (xyxy[:, 3] * h * r + dh) / size
        return np.stack(
            [cls, (x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], 1
        ).astype(np.float32)

    yolo_aug = getattr(opts, "augment", "none") == "yolo"
    if yolo_aug and not is_yolo:
        raise SystemExit("--augment yolo is the YOLOv5 training recipe; "
                         "use it with a yolov5* model")
    # HSV jitter placement: "device" (default) keeps the loader geometric
    # (mosaic + affine + flip) and applies the elementwise colour jitter
    # inside the accelerator step — on a TPU it fuses into existing HBM
    # traffic, while a loader core pays tens of ms per 640px image.
    hsv_mode = getattr(opts, "yolo_hsv", "device")
    hsv_arg = "device" if hsv_mode == "device" else (hsv_mode == "host")
    hsv_apply = None
    if yolo_aug and hsv_mode == "device":
        from edgeml_tpu.ops.color import hsv_jitter as _hsv_dev

        hsv_apply = jax.jit(_hsv_dev)
    augment = None if yolo_aug else _build_augment(getattr(opts, "augment", "none"))
    epoch_state = {"epoch": 0}  # read by loader threads between epochs
    file_index = {f: i for i, f in enumerate(files)}
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)

    def example(i, im):
        """(image, (cls, xyxy normalized)) for sample i, augmented if asked.
        Augmentation runs on raw pixels, seeded per (seed, epoch, image) so
        results are deterministic regardless of loader-thread scheduling."""
        lab = raw_labels[i]
        cls, xyxy = lab if len(lab) else (np.zeros(0, np.float32),
                                          np.zeros((0, 4), np.float32))
        if augment is None:
            return im, (cls, xyxy)
        h, w = im.shape[:2]
        arng = np.random.default_rng(
            [opts.seed, epoch_state["epoch"], i]
        )
        im2, tgt = augment(
            im,
            {"boxes": xyxy * np.array([w, h, w, h], np.float32),
             "labels": cls},
            arng,
        )
        h2, w2 = im2.shape[:2]
        return im2, (
            tgt["labels"],
            tgt["boxes"] / np.array([w2, h2, w2, h2], np.float32),
        )

    def make_batch(items):
        """Decode thread: augment + preprocess images + remap labels + pad."""
        if yolo_aug:
            # the YOLOv5 recipe (mosaic-4 + scale/translate + HSV + flip):
            # batch-level, since each output sample composites 4 source
            # images (edgeml_tpu/data/yolo_aug.py; yolov5_scripts.md:9)
            from edgeml_tpu.data.yolo_aug import yolo_augment_batch

            ex = []
            for f, im in items:
                lab = raw_labels[file_index[f]]
                cls, xyxy = lab if len(lab) else (
                    np.zeros(0, np.float32), np.zeros((0, 4), np.float32)
                )
                ex.append((im, (cls, xyxy)))
            res = yolo_augment_batch(
                ex, size,
                [opts.seed, epoch_state["epoch"], file_index[items[0][0]]],
                hsv=hsv_arg,
            )
            lb, rows = res[0], res[1]
            targets, valid = pad_targets(rows, opts.max_targets)
            if len(res) == 3:  # device-mode HSV: per-image gains ride along
                return lb, targets, valid, res[2]
            return lb, targets, valid
        pairs = [example(file_index[f], im) for f, im in items]
        imgs = [im for im, _ in pairs]
        labs = [lab for _, lab in pairs]
        if is_yolo:
            lb, meta = letterbox_batch(imgs, size)
            rows = [rows_for(la, im, m) for la, im, m in zip(labs, imgs, meta)]
        else:
            lb = np.stack(
                [(resize_bilinear(im, size, size) - mean) / std for im in imgs]
            )
            rows = [rows_for(la, im) for la, im in zip(labs, imgs)]
        targets, valid = pad_targets(rows, opts.max_targets)
        return lb, targets, valid

    n = len(files)
    bs = opts.batch_size
    # Shard the batch only when it divides evenly over the devices.
    mesh = (
        make_mesh(("dp",))
        if len(jax.devices()) > 1 and bs % len(jax.devices()) == 0
        else None
    )
    if mesh is not None:
        params = replicate(params, mesh)
        if stats is not None:
            stats = replicate(stats, mesh)
        if ema_tree is not None:
            ema_tree = replicate(ema_tree, mesh)
    if use_ema and ema_tree is None:
        ema_tree = {"params": params}
        if stats is not None:
            ema_tree["stats"] = stats

    steps_per_epoch = max(n // bs, 1)
    rng = np.random.default_rng(opts.seed)
    key = jax.random.PRNGKey(opts.seed)
    epoch_losses = []  # per-epoch mean loss, returned for smoke/e2e tests
    print("Start training")
    for epoch in range(opts.start_epoch, opts.epochs):
        epoch_state["epoch"] = epoch
        logger = MetricLogger()
        perm = rng.permutation(n)
        it = 0
        for batch in iter_batches(
            img_dir, files, bs, make_batch,
            order=perm, prefetch=getattr(opts, "prefetch", 2), drop_last=True,
        ):
            lb_np, targets, valid = batch[0], batch[1], batch[2]
            imgs = jnp.asarray(lb_np)
            if len(batch) == 4:  # device-mode HSV jitter (ops/color.py)
                imgs = hsv_apply(imgs, jnp.asarray(batch[3]))
            targets, valid = jnp.asarray(targets), jnp.asarray(valid)
            if mesh is not None:
                imgs = shard_along(imgs, mesh)
                targets = shard_along(targets, mesh)
                valid = shard_along(valid, mesh)
            lr = lr_at(cfg, epoch, it, steps_per_epoch)
            key, sub = jax.random.split(key)
            t0 = time.time()
            params, stats, opt_state, loss, parts = step(
                params, stats, opt_state, imgs, targets, valid, lr, sub
            )
            if use_ema:
                ema_n += 1
                live = {"params": params}
                if stats is not None:
                    live["stats"] = stats
                ema_tree = ema_update(ema_tree, live, float(ema_n))
            loss_v = float(loss)
            if not np.isfinite(loss_v):
                raise FloatingPointError(f"Loss is {loss_v}, stopping training")
            logger.update(
                loss=loss_v, lr=lr, iter_time=time.time() - t0,
                **{k: float(v) for k, v in parts.items()},
            )
            if it % opts.print_freq == 0:
                print(f"Epoch [{epoch}] iter [{it}/{steps_per_epoch}] {logger}")
            it += 1
        if opts.save_dir:
            os.makedirs(opts.save_dir, exist_ok=True)
            ema_payload = None
            if use_ema:
                ema_payload = dict(ema_tree, n_updates=np.asarray(ema_n))
            if epoch % 10 == 0:
                save_checkpoint(
                    os.path.join(opts.save_dir, f"model_{epoch}.pth"),
                    params, stats, opt_state, cfg, epoch, ema=ema_payload,
                )
            save_checkpoint(
                os.path.join(opts.save_dir, "checkpoint.pth"),
                params, stats, opt_state, cfg, epoch, ema=ema_payload,
            )
        epoch_losses.append(logger.meters["loss"].global_avg)
        print(f"Epoch {epoch} finished")
    return {
        "epoch_loss": epoch_losses,
        "state": (net, params, stats),
        "ema": ema_tree,
    }


def getargs():
    """Parse command line arguments."""
    args = argparse.ArgumentParser()
    args.add_argument('img_dir', help="Directory of training images.")
    args.add_argument('save_dir', help="Directory to save the trained model weights.")
    args.add_argument('--label-dir', default="",
                      help="Directory of YOLO-format label .txt files (from data_processing/label.py). "
                           "Not needed with --voc-root.")
    args.add_argument('--voc-root', default="",
                      help="Path to a VOCdevkit tree (or its parent): train directly from raw "
                           "VOC XML annotations (07+12 trainval), no label conversion stage. "
                           "Overrides img_dir/--label-dir.")
    args.add_argument('--model', type=str, default="ssd",
                      help="The object detector. Available choices include 'ssd', 'faster_rcnn', "
                           "'retinanet', and 'yolov5n'..'yolov5x'.")
    args.add_argument('--dataset', type=str, default="voc", help="'voc' (20 classes) or 'coco' (80).")
    args.add_argument('-b', '--batch-size', default=32, type=int, help="Training batch size.")
    args.add_argument('--epochs', type=int, default=30, help="Total training epochs.")
    args.add_argument('--opt', default="sgd", type=str, help="'sgd' or 'adamw'.")
    args.add_argument('--lr', default=0.02, type=float, help="Base learning rate.")
    args.add_argument('--momentum', default=0.9, type=float, help="SGD momentum.")
    args.add_argument('-wd', '--weight-decay', default=1e-4, type=float, help="L2 weight decay.")
    args.add_argument('--lr-scheduler', default="multisteplr", type=str,
                      help="'multisteplr' or 'cosineannealinglr'.")
    args.add_argument('--lr-steps', default=[16, 22], nargs="+", type=int,
                      help="Epochs at which MultiStep drops the learning rate.")
    args.add_argument('--lr-gamma', default=0.1, type=float,
                      help="MultiStep decay factor per milestone.")
    args.add_argument("--resume", default="", type=str, help="Checkpoint to resume from.")
    args.add_argument("--start-epoch", default=0, type=int, help="First epoch index (with --resume).")
    args.add_argument("--img-size", default=640, type=int, help="train image size")
    args.add_argument("--max-targets", default=64, type=int, help="padded targets per image")
    args.add_argument("--print-freq", default=100, type=int, help="log every N iterations")
    args.add_argument("--prefetch", default=2, type=int,
                      help="batches decoded ahead of the device (host RAM bound: prefetch+1 batches)")
    args.add_argument("--augment", default="none",
                      choices=["none", "flip", "ssd", "yolo"],
                      help="train-time augmentation: none (reference parity), flip, the "
                           "ssd preset (photometric + zoom-out + IoU crop + flip), or "
                           "yolo (the ultralytics recipe: mosaic-4 + scale/translate "
                           "affine + HSV jitter + flip; yolov5 models only)")
    args.add_argument("--yolo-hsv", default="device",
                      choices=["device", "host", "off"],
                      help="where --augment yolo applies its HSV jitter: on the "
                           "accelerator (default; elementwise, fuses into the step), "
                           "on the loader host (reference placement), or disabled")
    args.add_argument("--seed", default=0, type=int, help="init/shuffle seed")
    args.add_argument("--preset", default="", choices=["", "yolo"],
                      help="'yolo': the ultralytics optimizer recipe "
                           "(nesterov SGD 0.937, one_cycle cosine lrf=0.01, "
                           "3-epoch warmup, masked weight decay 5e-4) — the "
                           "settings behind the reference's YOLO training; "
                           "overrides --opt/--lr/--momentum/-wd/"
                           "--lr-scheduler. Pair with --augment yolo --ema.")
    args.add_argument("--ema", action="store_true",
                      help="keep a decay-ramped EMA shadow of the model "
                           "(params + BN stats), the ultralytics-recipe "
                           "component of the reference's YOLO training "
                           "(yolov5_scripts.md); checkpointed under 'ema', "
                           "preferred by detect.py when present")
    args.add_argument("--bf16", action="store_true",
                      help="bfloat16 mixed-precision training (f32 master "
                           "weights/optimizer/BN stats; the reference "
                           "engine's --amp equivalent). All four families; "
                           "faster_rcnn keeps its decision stages f32.")
    return args.parse_args()


if __name__ == '__main__':
    main(getargs())

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


def main(opts):
    import jax
    import jax.numpy as jnp

    from edgeml_tpu.models.engine import make_detector, make_family_train_step
    from edgeml_tpu.models.train import (
        TrainConfig, load_checkpoint, lr_at, pad_targets, save_checkpoint,
    )
    from edgeml_tpu.models.common import letterbox_batch
    from edgeml_tpu.models.infer import load_images
    from edgeml_tpu.data import load_data, list_image_names
    from edgeml_tpu.parallel import make_mesh, shard_along, replicate, MetricLogger

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
    opt, step = make_family_train_step(net, cfg)
    opt_state = opt.init(params)

    if opts.resume:
        params, stats, opt_state, payload = load_checkpoint(opts.resume)
        opts.start_epoch = payload["epoch"] + 1

    # Data: pre-process all images once (host), labels from YOLO txt files.
    names = list_image_names(opts.label_dir)
    img_names, images = load_images(opts.img_dir)
    stems = [".".join(n.split(".")[:-1]) or n for n in img_names]
    order = [stems.index(n) for n in names]
    images = [images[i] for i in order]
    raw_labels = load_data(opts.label_dir, names, with_conf=False)

    if is_yolo:
        lb, meta = letterbox_batch(images, size)
        # Labels are normalized to the ORIGINAL image; remap into letterbox
        # space.
        label_rows = []
        for img, (r, dw, dh), lab in zip(images, meta, raw_labels):
            if len(lab) == 0:
                label_rows.append(np.zeros((0, 5), np.float32))
                continue
            cls, xyxy = lab
            h, w = img.shape[:2]
            x1 = (xyxy[:, 0] * w * r + dw) / size
            y1 = (xyxy[:, 1] * h * r + dh) / size
            x2 = (xyxy[:, 2] * w * r + dw) / size
            y2 = (xyxy[:, 3] * h * r + dh) / size
            label_rows.append(
                np.stack(
                    [cls, (x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], 1
                ).astype(np.float32)
            )
    else:
        # Plain square resize: normalized labels are unchanged.
        mean = np.array([0.485, 0.456, 0.406], np.float32)
        std = np.array([0.229, 0.224, 0.225], np.float32)
        lb = np.stack(
            [
                (
                    np.asarray(
                        jax.image.resize(
                            jnp.asarray(im, jnp.float32), (size, size, 3),
                            "bilinear",
                        )
                    )
                    - mean
                )
                / std
                for im in images
            ]
        )
        label_rows = []
        for lab in raw_labels:
            if len(lab) == 0:
                label_rows.append(np.zeros((0, 5), np.float32))
            else:
                cls, xyxy = lab
                label_rows.append(
                    np.stack(
                        [
                            cls,
                            (xyxy[:, 0] + xyxy[:, 2]) / 2,
                            (xyxy[:, 1] + xyxy[:, 3]) / 2,
                            xyxy[:, 2] - xyxy[:, 0],
                            xyxy[:, 3] - xyxy[:, 1],
                        ],
                        1,
                    ).astype(np.float32)
                )

    n = len(images)
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

    steps_per_epoch = max(n // bs, 1)
    rng = np.random.default_rng(opts.seed)
    key = jax.random.PRNGKey(opts.seed)
    print("Start training")
    for epoch in range(opts.start_epoch, opts.epochs):
        logger = MetricLogger()
        perm = rng.permutation(n)
        it = 0
        for s in range(0, n - bs + 1, bs):
            idx = perm[s : s + bs]
            imgs = jnp.asarray(lb[idx])
            targets, valid = pad_targets([label_rows[i] for i in idx], opts.max_targets)
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
            if epoch % 10 == 0:
                save_checkpoint(
                    os.path.join(opts.save_dir, f"model_{epoch}.pth"),
                    params, stats, opt_state, cfg, epoch,
                )
            save_checkpoint(
                os.path.join(opts.save_dir, "checkpoint.pth"),
                params, stats, opt_state, cfg, epoch,
            )
        print(f"Epoch {epoch} finished")


def getargs():
    """Parse command line arguments."""
    args = argparse.ArgumentParser()
    args.add_argument('img_dir', help="Directory of training images.")
    args.add_argument('save_dir', help="Directory to save the trained model weights.")
    args.add_argument('--label-dir', required=True,
                      help="Directory of YOLO-format label .txt files (from data_processing/label.py).")
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
    args.add_argument("--seed", default=0, type=int, help="init/shuffle seed")
    return args.parse_args()


if __name__ == '__main__':
    main(getargs())

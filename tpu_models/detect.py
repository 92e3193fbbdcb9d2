"""Collect the detection outputs of TPU-native detectors.

CLI-compatible rebuild of /root/reference/torch_models/detect.py (same
positional args and flags, same per-image {img}.npy output of normalized
(cls, x, y, w, h, conf) rows with the COCO 91->80 class remap for
COCO-label-space models). The model zoo is JAX (edgeml_tpu.models); the whole
batch pipeline — letterbox, backbone, anchor decode, NMS, coordinate
unmapping — runs as one jitted function on the accelerator instead of a
bs=1 torch loop.

Model choices: 'yolov5n'/'yolov5s'/'yolov5m'/'yolov5l'/'yolov5x' (native
label space, no remap), plus the torchvision trio 'ssd', 'faster_rcnn',
'retinanet' (COCO label space, remapped).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from coco_labelmap import coco_to_yolov5


def _native_payload(path: str):
    """Sniff a NATIVE training checkpoint (tpu_models/train.py's pickle
    payload {model: {params, stats}, optimizer, ..., [ema]}; the reference's
    protocol shape, torch_models/train.py:126-136, with jax pytrees inside).
    Returns the payload dict, or None for torch zips / state-dict files."""
    if not path or not os.path.isfile(path):
        # orbax directory checkpoints route through models.train.load_checkpoint
        if path and os.path.isdir(path):
            from edgeml_tpu.models.train import load_checkpoint

            _, _, _, payload = load_checkpoint(path)
            return payload
        return None
    import pickle

    try:
        with open(path, "rb") as f:
            obj = pickle.load(f)
    except Exception:
        return None  # torch zip archive or other format
    if (
        isinstance(obj, dict)
        and isinstance(obj.get("model"), dict)
        and "params" in obj["model"]
    ):
        return obj
    return None


def _native_weights(payload):
    """(params, stats) from a native payload — the EMA shadow when present
    (the ultralytics convention: the shipped model IS the EMA), else the
    live weights."""
    import jax
    import jax.numpy as jnp

    src = payload.get("ema") or payload["model"]
    which = "EMA" if "ema" in payload else "live"
    print(f"loading native checkpoint ({which} weights, epoch "
          f"{payload.get('epoch', '?')})")
    as_dev = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
    stats = src.get("stats")
    return as_dev(src["params"]), None if stats is None else as_dev(stats)


def load_detector(model_name: str, model_path: str, num_class: int):
    """Build a detector and load weights.

    model_path may be: a pickled ultralytics/torchvision state_dict (.pt via
    torch, CPU), an .npz of the same keys, or a NATIVE tpu_models/train.py
    checkpoint (pickle file or orbax directory — EMA weights preferred when
    the run used --ema); empty model_path uses random initialization
    (useful only for smoke tests).
    """
    import jax

    native = _native_payload(model_path) if model_path else None
    sd = None  # checkpoint state_dict, loaded at most once (tail sniff + import)
    if model_name.startswith("yolov5"):
        from edgeml_tpu.models.yolov5 import YoloV5

        net = YoloV5(variant=model_name[-1], num_classes=num_class)
        if native is not None:
            params, stats = _native_weights(native)
        elif model_path:
            sd = load_state_dict(model_path)
            params, stats = net.params_from_torch_state_dict(sd)
        else:
            print("WARNING: no --model-path given; using random weights.")
            params, stats = net.init(jax.random.PRNGKey(0))
        return net, params, stats
    if model_name == "ssd":
        from edgeml_tpu.models.ssdlite import SSDLite

        # torchvision's pretrained ssdlite320 checkpoint has the REDUCED
        # mobilenet tail (C5 = 480 channels); a model trained from an
        # ImageNet backbone (the reference trainer's path) is full-tail.
        # Sniff the provided state_dict for the reduced-tail 480->... last
        # conv so both load transparently (reference detect.py:21-26 picks
        # between weights='DEFAULT' and a custom checkpoint the same way),
        # then fall through to the shared load path below.
        reduced = False
        if model_path and native is None:
            sd = sd if sd is not None else load_state_dict(model_path)
            reduced = any(
                tuple(getattr(v, "shape", ())) == (480, 80, 1, 1)
                for v in sd.values()
            )
        net = SSDLite(num_classes=num_class, reduced_tail=reduced)
    elif model_name == "retinanet":
        from edgeml_tpu.models.retinanet import RetinaNet

        net = RetinaNet(num_classes=num_class)
    elif model_name == "faster_rcnn":
        from edgeml_tpu.models.faster_rcnn import FasterRCNN

        net = FasterRCNN(num_classes=num_class)
    else:
        raise SystemExit(
            f"Model '{model_name}' is not available. "
            "Choose from yolov5n/s/m/l/x, ssd, faster_rcnn, retinanet."
        )
    if native is not None:
        params, stats = _native_weights(native)
    elif model_path:
        sd = sd if sd is not None else load_state_dict(model_path)
        params = net.params_from_torch_state_dict(sd)
        if isinstance(params, tuple):
            params, stats = params
        else:
            stats = None
    else:
        print("WARNING: no --model-path given; using random weights.")
        params = net.init(jax.random.PRNGKey(0))
        if isinstance(params, tuple):
            params, stats = params
        else:
            stats = None
    return net, params, stats


def load_state_dict(path: str):
    if path.endswith(".npz"):
        data = np.load(path, allow_pickle=True)
        return {k: data[k] for k in data.files}
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    if isinstance(obj, dict) and "model" in obj and hasattr(obj["model"], "state_dict"):
        obj = obj["model"].float().state_dict()
    return obj


def main(opts):
    num_class = 91 if opts.dataset == "coco" else 21
    if opts.model.startswith("yolov5"):
        # YOLOv5 operates natively in the compact label space.
        num_class = 80 if opts.dataset == "coco" else 20
        class_map = None
    else:
        class_map = (
            coco_to_yolov5
            if opts.dataset == "coco"
            else {i: i - 1 for i in range(1, 21 + 1)}
        )
    net, params, stats = load_detector(opts.model, opts.model_path, num_class)

    mesh = None
    if getattr(opts, "data_parallel", False):
        import jax

        if len(jax.devices()) > 1:
            from edgeml_tpu.parallel.mesh import make_mesh

            mesh = make_mesh(("dp",))

    dtype = None
    if getattr(opts, "bf16", False):
        import jax.numpy as jnp

        dtype = jnp.bfloat16
    if getattr(opts, "int8", False):
        # --int8 --bf16 composes: int8-quantized trunk with the bfloat16
        # score/NMS tail (the fastest combination on TPU).
        dtype = "int8-bf16" if dtype is not None else "int8"

    from edgeml_tpu.models.infer import run_detection

    run_detection(
        net,
        params,
        stats,
        opts.img_dir,
        opts.save_dir,
        batch_size=opts.batch_size,
        conf_thres=opts.conf_thres,
        iou_thres=opts.iou_thres,
        fmt=opts.format,
        class_map=class_map,
        mesh=mesh,
        dtype=dtype,
    )


def getargs():
    """Parse command line arguments."""
    args = argparse.ArgumentParser()
    args.add_argument('img_dir', help="Image directory to run detection over.")
    args.add_argument('save_dir', help="Output directory for per-image detection files.")
    args.add_argument('--dataset', type=str, default="coco", help="Label space: 'coco' or 'voc'.")
    args.add_argument('--model', type=str, default="ssd",
                      help="The object detector. Choices: 'yolov5n'..'yolov5x' (native), "
                           "'ssd', 'faster_rcnn', 'retinanet'.")
    args.add_argument("--model-path", type=str, default="",
                      help="Weights file (.pt state_dict or .npz); empty = random init (smoke tests only).")
    args.add_argument('--batch-size', type=int, default=16, help="Inference batch size.")
    args.add_argument('--conf-thres', type=float, default=0.001, help="Confidence threshold.")
    args.add_argument('--iou-thres', type=float, default=0.6, help="NMS IoU threshold.")
    args.add_argument('--format', type=str, default="npy", choices=["npy", "txt"],
                      help="Per-image output format.")
    args.add_argument('--data-parallel', action="store_true",
                      help="Shard the serving batch over all visible devices "
                           "(batch size must divide evenly; additive flag, no "
                           "reference equivalent).")
    args.add_argument('--bf16', action="store_true",
                      help="bfloat16 serving (backbone + scores; boxes stay "
                           "f32) — the reference's --half analogue for TPU. "
                           "All four families; faster_rcnn keeps its decision "
                           "stages (proposals, NMS, box decode) in f32.")
    args.add_argument('--int8', action="store_true",
                      help="int8 post-training-quantized serving trunk "
                           "(YOLO and ssd; calibrated on the first batch of "
                           "img_dir). Accuracy knob — see models/quant.py "
                           "and models/quant_ssd.py. For YOLO composes "
                           "with --bf16 (int8 trunk + bf16 score tail).")
    return args.parse_args()


if __name__ == '__main__':
    main(getargs())

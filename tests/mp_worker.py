"""Worker for the real multi-process distributed test (test_multiprocess.py).

Runs as one of N `jax.distributed`-initialized CPU processes and exercises
every cross-process code path the framework ships — the counterpart of the
reference's NCCL surface (/root/reference/torch_models/references/utils.py:260-283,
coco_eval.py:157-186) which the reference itself never tests multi-process:

  1. allgather_object on ragged payloads (utils.all_gather equivalent);
  2. SmoothedValue.synchronize_between_processes (utils.py:29-41);
  3. DetectionEvaluator's cross-process image merge (coco_eval.py:157-176),
     verified against a single-process evaluator fed the union;
  4. a real YOLOv5 train step jitted over a GLOBAL mesh spanning both
     processes' devices, batch sharded over 'dp' — XLA inserts the gradient
     psum across processes (Gloo on CPU, ICI on a TPU slice).

Prints 'MP_WORKER_OK rank=<r> loss=<x>' on success; any assertion kills the
process and fails the launcher test.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    rank, nproc, coord = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    import jax

    jax.distributed.initialize(
        coordinator_address=coord, num_processes=nproc, process_id=rank
    )
    assert jax.process_count() == nproc

    from edgeml_tpu.parallel.mesh import (
        allgather_object,
        initialize_distributed,
        is_primary,
    )

    initialize_distributed()  # must be a no-op when already initialized
    assert is_primary() == (rank == 0)

    # 1. ragged object all-gather, ordered by process index
    objs = allgather_object({"rank": rank, "data": list(range(rank + 2))})
    assert [o["rank"] for o in objs] == list(range(nproc)), objs
    assert objs[-1]["data"] == list(range(nproc + 1)), objs

    # 2. meter sync: rank r contributes value (r+1) with weight (r+1)
    from edgeml_tpu.parallel.meters import SmoothedValue

    v = SmoothedValue()
    v.update(float(rank + 1), n=rank + 1)
    v.synchronize_between_processes()
    want_count = sum(r + 1 for r in range(nproc))
    want_total = sum(float(r + 1) * (r + 1) for r in range(nproc))
    assert v.count == want_count and abs(v.total - want_total) < 1e-9, (
        v.count,
        v.total,
    )

    # 3. evaluator merge == single-process evaluator over the union
    from edgeml_tpu.eval_coco import DetectionEvaluator

    def image(i):
        rng = np.random.default_rng(100 + i)
        n, m = 4, 3
        det = (
            rng.integers(0, 3, n),
            np.sort(rng.random((n, 4)) * 50, axis=1),
            rng.random(n),
        )
        gt = (rng.integers(0, 3, m), np.sort(rng.random((m, 4)) * 50, axis=1))
        return det, gt

    # rank r owns images [r*2, r*2+1] -> global order by process index
    mine = [image(rank * 2), image(rank * 2 + 1)]
    ev = DetectionEvaluator(style="greedy")
    ev.update([d for d, _ in mine], [g for _, g in mine])
    ev.synchronize_between_processes()
    assert len(ev.dets) == 2 * nproc, len(ev.dets)

    ref = DetectionEvaluator(style="greedy")
    allimg = [image(i) for i in range(2 * nproc)]
    ref.update([d for d, _ in allimg], [g for _, g in allimg])
    got = ev.summarize(verbose=False)
    want = ref.summarize(verbose=False)
    assert abs(got["map"] - want["map"]) < 1e-6, (got, want)
    assert abs(got["map50"] - want["map50"]) < 1e-6

    # 4. real train step over a global mesh (gradient psum across processes)
    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from jax.sharding import Mesh, PartitionSpec as P

    from edgeml_tpu.models.train import TrainConfig, make_train_step, pad_targets
    from edgeml_tpu.models.yolov5 import YoloV5

    mesh = Mesh(np.array(jax.devices()), ("dp",))

    # Establish the GLOBAL-mesh Gloo context now, while inter-process skew is
    # small: the context's TCP handshake has a ~30 s connect timeout, and the
    # big train-step compile below can skew the ranks by minutes (one CPU
    # core, independent compiles). A tiny all-device psum creates and caches
    # the clique; the train step's gradient psum then reuses it.
    from jax.sharding import NamedSharding

    warm = jax.jit(
        lambda a: a.sum(), out_shardings=NamedSharding(mesh, P())
    )(multihost_utils.host_local_array_to_global_array(
        np.ones(jax.local_device_count(), np.float32), mesh, P("dp")
    ))
    assert float(jax.device_get(warm.addressable_data(0))) == jax.device_count()

    net = YoloV5(variant="n", num_classes=8, img_size=64)
    params, stats = net.init(jax.random.PRNGKey(0))  # same seed everywhere
    opt, step = make_train_step(net, TrainConfig())
    opt_state = opt.init(params)

    n_local = jax.local_device_count()
    rng = np.random.default_rng(1000 + rank)  # per-process DIFFERENT shard
    local_images = rng.random((n_local, 64, 64, 3)).astype(np.float32)
    labels = [
        np.array([[1, 0.5, 0.5, 0.3, 0.4]], np.float32) for _ in range(n_local)
    ]
    local_targets, local_valid = pad_targets(labels, max_targets=8)

    def globalize(x, spec):
        return multihost_utils.host_local_array_to_global_array(x, mesh, spec)

    images = globalize(local_images, P("dp"))
    targets = globalize(np.asarray(local_targets), P("dp"))
    valid = globalize(np.asarray(local_valid), P("dp"))
    repl = lambda t: jax.tree_util.tree_map(
        lambda a: globalize(np.asarray(a), P()) if hasattr(a, "ndim") else a, t
    )
    params, stats, opt_state = repl(params), repl(stats), repl(opt_state)

    # AOT-compile locally (slow, no collectives), then barrier so both ranks
    # enter the collective-bearing execution together.
    compiled = step.lower(
        params, stats, opt_state, images, targets, valid, 0.01
    ).compile()
    multihost_utils.sync_global_devices("train_step_ready")
    params, stats, opt_state, loss, parts = compiled(
        params, stats, opt_state, images, targets, valid, 0.01
    )
    # the loss is a replicated GLOBAL array: read the locally addressable copy
    loss = float(jax.device_get(loss.addressable_data(0)))
    assert np.isfinite(loss), loss
    # every process must agree on the psum'd loss
    losses = allgather_object(loss)
    assert max(losses) - min(losses) < 1e-6, losses

    print(f"MP_WORKER_OK rank={rank} loss={loss:.5f}", flush=True)


if __name__ == "__main__":
    main()

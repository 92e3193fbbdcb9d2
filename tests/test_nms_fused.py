"""Fused Pallas suppressor (interpret mode) vs the XLA fixpoint oracle.

On-device the kernel was verified bit-identical over adversarial workloads
(tools/exp_emit3.py, 0 mismatches incl. heavy-overlap long-chain cases);
this covers the kernel logic in the CPU suite via the Pallas interpreter.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from edgeml_tpu.ops.nms import MAX_WH, greedy_keep_mask
from edgeml_tpu.ops.nms_fused import greedy_keep_mask_fused


@pytest.mark.parametrize("seed,spread,ncls", [
    (0, 80.0, 1),     # heavy overlap, single class: long suppression chains
    (1, 300.0, 4),
    (2, 2000.0, 80),  # spread regime with class offsets
])
def test_fused_matches_xla_fixpoint(seed, spread, ncls):
    rng = np.random.default_rng(seed)
    b, k = 3, 256
    xy = rng.uniform(20, 20 + spread, (b, k, 2)).astype(np.float32)
    wh = rng.uniform(30, 150, (b, k, 2)).astype(np.float32)
    scores = np.sort(rng.random((b, k)).astype(np.float32), axis=-1)[:, ::-1]
    scores[scores < 0.05] = 0.0  # gated-out tail
    cls = rng.integers(0, ncls, (b, k)).astype(np.float32)
    boxes = np.concatenate([xy - wh / 2, xy + wh / 2], axis=-1)
    off = jnp.asarray(boxes + cls[..., None] * MAX_WH)
    sc = jnp.asarray(np.ascontiguousarray(scores))

    ref = jax.vmap(lambda bb, ss: greedy_keep_mask(bb, ss, 0.6))(off, sc)
    got = greedy_keep_mask_fused(off, sc, 0.6, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def _mesh8():
    from jax.sharding import Mesh

    devs = np.array(jax.devices())
    assert devs.size >= 8, "conftest forces an 8-device host platform"
    return Mesh(devs[:8].reshape(8), ("d",))


def test_fused_partitions_over_batch_mesh():
    """The kernel's custom_partitioning rule: with inputs sharded over an
    8-device batch mesh, compilation succeeds (Mosaic custom calls have no
    automatic SPMD rule — this is what run_detection(mesh=...) relies on),
    the output stays batch-sharded, and values match the unsharded call."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    rng = np.random.default_rng(7)
    b, k = 16, 256
    xy = rng.uniform(20, 400, (b, k, 2)).astype(np.float32)
    wh = rng.uniform(30, 150, (b, k, 2)).astype(np.float32)
    scores = np.sort(rng.random((b, k)).astype(np.float32), axis=-1)[:, ::-1]
    boxes = np.concatenate([xy - wh / 2, xy + wh / 2], axis=-1)
    off = jnp.asarray(boxes)
    sc = jnp.asarray(np.ascontiguousarray(scores))

    ref = greedy_keep_mask_fused(off, sc, 0.6, interpret=True)

    mesh = _mesh8()
    sh = NamedSharding(mesh, P("d"))
    got = greedy_keep_mask_fused(
        jax.device_put(off, sh), jax.device_put(sc, sh), 0.6, interpret=True
    )
    assert got.sharding.spec == P("d")
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_mesh_serving_emit_path_runs_fused_kernel():
    """End-to-end: nms_split_batch with batch-sharded inputs routed through
    the fused suppressor (FORCE_FUSED_INTERPRET) — the exact program shape
    of data-parallel TPU serving — matches the unsharded CPU path."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from edgeml_tpu.ops import nms as nms_mod
    from edgeml_tpu.ops.nms import nms_split_batch

    rng = np.random.default_rng(3)
    b, n, nc = 8, 600, 80
    obj = rng.random((b, n)).astype(np.float32) * 0.9
    xy = rng.uniform(40, 600, (b, n, 2)).astype(np.float32)
    wh = rng.uniform(10, 120, (b, n, 2)).astype(np.float32)
    xywh = np.concatenate([xy, wh], axis=-1)
    cls = (rng.random((b, n, nc)) ** 3).astype(np.float32)
    kw = dict(conf_thres=1e-4, iou_thres=0.6, max_det=64, max_cand=256)

    d_ref, v_ref = nms_split_batch(
        jnp.asarray(obj), jnp.asarray(xywh), jnp.asarray(cls), **kw
    )

    mesh = _mesh8()
    sh = lambda a: jax.device_put(jnp.asarray(a), NamedSharding(mesh, P("d")))
    assert not nms_mod.FORCE_FUSED_INTERPRET
    nms_mod.FORCE_FUSED_INTERPRET = True
    nms_split_batch.clear_cache()  # the flag is read at trace time
    try:
        d, v = nms_split_batch(sh(obj), sh(xywh), sh(cls), **kw)
    finally:
        nms_mod.FORCE_FUSED_INTERPRET = False
        nms_split_batch.clear_cache()
    np.testing.assert_array_equal(np.asarray(v), np.asarray(v_ref))
    np.testing.assert_array_equal(np.asarray(d), np.asarray(d_ref))


@pytest.mark.parametrize("k,hot", [(2048, 400), (1536, 40), (2048, 1900)])
def test_blocked_fused_matches_xla_fixpoint(k, hot):
    """K > 1024 rides the blocked-greedy kernel (nms_fused._kernel_blocked
    — no (K, K) scratch; round-5 un-gating of the SSDLite/RetinaNet
    max_cand=2048 suppression). Bit-identical to the XLA fixpoint on
    clustered (long-chain) and sparse workloads, invalid tail included."""
    rng = np.random.default_rng(k + hot)
    b = 2
    centers = rng.uniform(50, 600, (b, hot, 2))
    idx = rng.integers(0, hot, (b, k))
    c = np.take_along_axis(centers, idx[..., None], axis=1) \
        + rng.normal(0, 6, (b, k, 2))
    wh = np.exp(rng.uniform(np.log(10), np.log(80), (b, k, 2)))
    boxes = np.concatenate([c - wh / 2, c + wh / 2], -1).astype(np.float32)
    scores = np.sort(rng.random((b, k)).astype(np.float32))[:, ::-1].copy()
    scores[:, -k // 8:] = 0.0
    bj, sj = jnp.asarray(boxes), jnp.asarray(scores)
    want = jax.vmap(lambda bb, ss: greedy_keep_mask(bb, ss, 0.55))(bj, sj)
    got = greedy_keep_mask_fused(bj, sj, 0.55, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

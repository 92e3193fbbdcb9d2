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

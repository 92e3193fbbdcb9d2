"""Device mesh and sharding helpers — the TPU-native replacement for the
reference's torch.distributed/NCCL layer (/root/reference/torch_models/references/utils.py:260-283).

Instead of rank discovery + NCCL process groups + explicit all_reduce calls,
parallelism here is data placement: build a `jax.sharding.Mesh` over all
chips, annotate batch axes with `NamedSharding`, and let XLA insert the ICI
collectives. Works identically on one chip, a v5e slice, or a forced
multi-device CPU host (tests).
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(**kwargs) -> None:
    """Multi-host initialization (jax.distributed), env-driven like the
    reference's init_distributed_mode but with JAX's coordinator discovery.
    No-op when single-process or already initialized."""
    if jax.process_count() > 1:
        return
    coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coord:
        jax.distributed.initialize(**kwargs)


def is_primary() -> bool:
    """True on the process that should write artifacts (save_on_master
    equivalent, references/utils.py:255-257)."""
    return jax.process_index() == 0


def make_mesh(axis_names=("dp",), devices=None) -> Mesh:
    """A 1-D (default) or n-D mesh over the given (default: all) devices."""
    devices = list(jax.devices()) if devices is None else list(devices)
    n = len(devices)
    if len(axis_names) == 1:
        shape = (n,)
    else:
        # Fill trailing axes greedily with 1s unless divisible.
        shape = (n,) + (1,) * (len(axis_names) - 1)
    arr = np.array(devices).reshape(shape)
    return Mesh(arr, axis_names)


def shard_along(x, mesh: Mesh, axis_name: str = "dp", dim: int = 0):
    """Place array x with dimension `dim` sharded over mesh axis `axis_name`."""
    spec = [None] * np.ndim(x)
    spec[dim] = axis_name
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))


def replicate(x, mesh: Mesh):
    """Fully replicate a pytree over the mesh."""
    return jax.tree_util.tree_map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P())), x
    )


def pad_to_multiple(n: int, k: int) -> int:
    return -(-n // k) * k


def allgather_object(obj):
    """Gather one arbitrary picklable object from every process; returns the
    list ordered by process index. Single-process: [obj].

    JAX-native counterpart of the reference's utils.all_gather (torch
    `all_gather_object`, /root/reference/torch_models/references/utils.py:70-83):
    the object is pickled, padded to the max byte length across processes,
    and exchanged as a uint8 `process_allgather` — which works for RAGGED
    payloads (per-process different image counts), unlike a direct pytree
    gather that needs identical shapes everywhere.
    """
    import pickle

    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils

    data = np.frombuffer(pickle.dumps(obj), np.uint8)
    sizes = np.asarray(
        multihost_utils.process_allgather(np.array([data.size], np.int64))
    ).reshape(-1)
    buf = np.zeros(int(sizes.max()), np.uint8)
    buf[: data.size] = data
    gathered = np.asarray(multihost_utils.process_allgather(buf))
    gathered = gathered.reshape(len(sizes), -1)
    return [
        pickle.loads(gathered[p, : int(sizes[p])].tobytes())
        for p in range(len(sizes))
    ]

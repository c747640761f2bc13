"""Device mesh helpers."""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Multi-host bring-up: jax.distributed.initialize wrapper.

    On Cloud TPU pods the arguments auto-detect from the environment; pass
    them explicitly elsewhere. After this, jax.devices() spans the slice and
    make_mesh() builds a global mesh - the torchrun/NCCL-process-group
    equivalent (reference DREAM_Train.py:675-680) with no per-rank user code.
    Call once, before any jax computation.
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def make_mesh(
    n_data: int | None = None,
    n_model: int = 1,
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices.

    Defaults to all devices on the data axis (pure DP, the reference-parity
    configuration). n_model > 1 carves an inner model axis; collectives over
    it ride ICI neighbours (innermost axis = fastest links).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n_data is None:
        if n % n_model != 0:
            raise ValueError(
                f"{n} devices do not divide evenly by n_model={n_model}; "
                f"{n % n_model} device(s) would sit silently idle - pass "
                "n_data explicitly to accept a partial mesh"
            )
        n_data = n // n_model
    assert n_data * n_model <= n, f"mesh {n_data}x{n_model} > {n} devices"
    arr = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard leading (batch) dim over 'data', replicate the rest."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Device-put a host batch pytree with the batch axis sharded on 'data'."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def replicate(mesh: Mesh, tree):
    """Device-put a pytree replicated across the mesh.

    Needed after a checkpoint restore: orbax materializes arrays committed to
    one device, which conflicts with mesh-sharded batches in a jitted step
    (uncommitted arrays would auto-replicate; restored ones don't)."""
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)

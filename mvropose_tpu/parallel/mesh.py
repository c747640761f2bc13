"""Device mesh helpers."""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


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

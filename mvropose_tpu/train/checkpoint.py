"""Checkpoint / resume via orbax.

The reference checkpoints a dict {epoch, model, 2x optimizer, 2x scheduler,
best_val_loss} every epoch on a spare thread, but on resume restores only
the model weights (optimizer restore commented out)
(/root/reference/model/MvRoPose_FR3.py:1134-1139, 1181-1190). Here:
  * async orbax saves (device->host copy is non-blocking, serialization off
    the training thread - the same latency-hiding, without the unjoined
    thread races of the reference's Fr5 notebook cell 13)
  * restore brings back EVERYTHING: params, batch_stats, optimizer state,
    step counter and best-loss bookkeeping (schedules are pure functions of
    the step, so they resume for free)
  * best-model snapshots kept alongside the rolling latest.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

from mvropose_tpu.train.state import TrainState


@dataclasses.dataclass
class CheckpointMeta:
    epoch: int = 0
    best_val_loss: float = float("inf")


class CheckpointManager:
    """Rolling latest + best snapshots under one directory."""

    def __init__(self, directory: str | Path, max_to_keep: int = 3):
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, enable_async_checkpointing=True
            ),
        )

    def save(self, step: int, state: TrainState, meta: CheckpointMeta) -> None:
        payload = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": np.asarray(state.step),
            "meta": {"epoch": meta.epoch, "best_val_loss": meta.best_val_loss},
        }
        self._mgr.save(step, args=ocp.args.StandardSave(payload))

    def restore(self, state: TrainState, step: int | None = None) -> tuple[TrainState, CheckpointMeta] | None:
        """Restore into the structure of `state`. None if no checkpoint."""
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            return None
        template = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": np.asarray(state.step),
            "meta": {"epoch": 0, "best_val_loss": 0.0},
        }
        restored = self._mgr.restore(step, args=ocp.args.StandardRestore(template))
        new_state = state.replace(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
            step=jax.numpy.asarray(restored["step"]),
        )
        meta = CheckpointMeta(
            epoch=int(restored["meta"]["epoch"]),
            best_val_loss=float(restored["meta"]["best_val_loss"]),
        )
        return new_state, meta

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()


def _flatten_names(tree: Any, prefix: str = "") -> dict:
    flat = {}
    for keypath, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        name = prefix + "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in keypath)
        flat[name] = np.asarray(leaf)
    return flat


def save_params_npz(path: str | Path, params: Any, batch_stats: Any = None) -> None:
    """Flat .npz export of params (the lightweight 'best model weights' file,
    analogous to the reference's best_*.pth state_dict).

    batch_stats (BatchNorm running mean/var - the stem and UNet head carry
    them, mirroring the reference's BN layers) ride under a 'batch_stats/'
    key prefix: a torch state_dict bundles running stats with the weights,
    and inference is WRONG without them. Old params-only files stay loadable
    (load_batch_stats_npz falls back to the BN init)."""
    flat = _flatten_names(params)
    if batch_stats is not None and jax.tree_util.tree_leaves(batch_stats):
        flat.update(_flatten_names(batch_stats, "batch_stats/"))
    np.savez(path, **flat)


def load_params_npz(path: str | Path, template: Any) -> Any:
    """Load a save_params_npz file back into `template`'s structure."""
    data = np.load(path)
    leaves_paths, treedef = jax.tree_util.tree_flatten_with_path(template)
    new_leaves = []
    for keypath, leaf in leaves_paths:
        name = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in keypath)
        arr = data[name]
        assert arr.shape == tuple(leaf.shape), f"{name}: {arr.shape} vs {leaf.shape}"
        new_leaves.append(arr.astype(leaf.dtype))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def load_batch_stats_npz(path: str | Path, template: Any) -> tuple[Any, int, int]:
    """Load the 'batch_stats/' collection from a save_params_npz file.

    Returns (batch_stats, n_loaded, n_total) over the template's leaves.
    Missing leaves take the flax BatchNorm INIT values (mean 0, var 1) -
    never zeros, a zero running var makes every BN output explode. Callers
    distinguish n_loaded == 0 (legacy file saved before batch_stats were
    bundled -> warn) from 0 < n_loaded < n_total (a partially-matching
    bundle, i.e. the file belongs to a DIFFERENT architecture -> hard
    error; silently resetting some BN modules degrades inference with no
    visible symptom)."""
    data = np.load(path)
    leaves_paths, treedef = jax.tree_util.tree_flatten_with_path(template)
    new_leaves, n_loaded = [], 0
    for keypath, leaf in leaves_paths:
        name = "batch_stats/" + "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in keypath
        )
        if name in data:
            arr = data[name]
            assert arr.shape == tuple(leaf.shape), f"{name}: {arr.shape} vs {leaf.shape}"
            new_leaves.append(arr.astype(leaf.dtype))
            n_loaded += 1
        else:
            leaf_name = str(getattr(keypath[-1], "key", ""))
            init = np.ones if leaf_name == "var" else np.zeros
            new_leaves.append(init(tuple(leaf.shape), leaf.dtype))
    tree = jax.tree_util.tree_unflatten(treedef, new_leaves)
    return tree, n_loaded, len(leaves_paths)

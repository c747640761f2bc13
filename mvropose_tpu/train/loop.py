"""Epoch-level training orchestrator.

The functional equivalent of the reference's main()/setup()/train_one_epoch
driver stack (/root/reference/model/MvRoPose_FR3.py:992-1200,
DREAM_Train.py:748-865): epoch loop, validation, metric logging, best-model
tracking, full-state checkpointing, prediction visualization - minus the DDP
boilerplate (SPMD makes rank logic disappear; "rank 0 only" work is simply
process-index-0 work).
"""

from __future__ import annotations

import dataclasses
import time
from pathlib import Path
from typing import Callable, Iterable, Optional

import jax
import numpy as np

from mvropose_tpu.train.state import TrainState, TrainConfig
from mvropose_tpu.train.checkpoint import CheckpointManager, CheckpointMeta, save_params_npz
from mvropose_tpu.utils.metrics_writer import MetricWriter
from mvropose_tpu.train.metrics import pck_at_k
from mvropose_tpu.geometry.heatmap import argmax_decode


@dataclasses.dataclass
class FitResult:
    state: TrainState
    best_val_loss: float
    epochs_run: int
    history: list


def fit(
    state: TrainState,
    train_step: Callable,
    eval_step: Callable,
    train_batches: Callable[[int], Iterable],  # epoch -> iterable of device batches
    val_batches: Callable[[], Iterable],
    cfg: TrainConfig,
    workdir: str | Path,
    start_epoch: int = 0,
    seed: int = 0,
    checkpoint_manager: Optional[CheckpointManager] = None,
    metric_writer: Optional[MetricWriter] = None,
    on_epoch_end: Optional[Callable] = None,
    mesh=None,
) -> FitResult:
    workdir = Path(workdir)
    workdir.mkdir(parents=True, exist_ok=True)
    writer = metric_writer or MetricWriter(workdir / "logs")
    ckpt = checkpoint_manager or CheckpointManager(workdir / "ckpt")

    # Resume (full state, unlike the reference's weights-only restore).
    restored = ckpt.restore(state)
    best_val = float("inf")
    if restored is not None:
        state, meta = restored
        start_epoch = meta.epoch
        best_val = meta.best_val_loss
        if mesh is not None and len(mesh.devices.flat) > 1:
            # Orbax restores arrays committed to one device; re-replicate so
            # the state composes with mesh-sharded batches under jit.
            from mvropose_tpu.parallel import replicate

            state = state.replace(
                params=replicate(mesh, state.params),
                batch_stats=replicate(mesh, state.batch_stats),
                opt_state=replicate(mesh, state.opt_state),
                step=replicate(mesh, state.step),
            )

    history = []
    base_rng = jax.random.PRNGKey(seed)
    epochs_run = 0
    for epoch in range(start_epoch, cfg.num_epochs):
        epochs_run += 1
        # Per-epoch reshuffle: the sampler.set_epoch equivalent is just a new
        # PRNG fold (the batch source reshuffles with `epoch` as seed).
        # Deriving the dropout stream by folding the EPOCH index (rather than
        # splitting a sequential stream) makes a resumed run consume the same
        # keys an uninterrupted run would at this epoch, instead of replaying
        # epoch 0's sequence after every restore.
        rng = jax.random.fold_in(base_rng, epoch)
        t0 = time.time()
        train_metrics = []
        for batch in train_batches(epoch):
            rng, step_rng = jax.random.split(rng)
            state, m = train_step(state, batch, step_rng)
            train_metrics.append(m)
        train_avg = {
            k: float(np.mean([float(m[k]) for m in train_metrics])) if train_metrics else float("nan")
            for k in (train_metrics[0] if train_metrics else {})
        }

        val_metrics = []
        pcks = []
        for batch in val_batches():
            out = eval_step(state, batch)
            val_metrics.append({k: out[k] for k in ("loss", "loss_kpt", "loss_ang")})
            # Progress signal in HEATMAP pixels against argmax-requantized GT
            # heatmaps (coarser than the eval CLI's image-pixel PCK against
            # exact keypoints - at stride 4, k=5 here ~ PCK@20 image px; use
            # `cli eval` for the comparable number). Padded weight-0 slots
            # are excluded on both the multi-view (view_mask) and
            # single-view (sample_weight) paths.
            pred_xy, _ = argmax_decode(out["pred_heatmaps"])
            gt_xy, _ = argmax_decode(batch["heatmaps"])
            valid = batch.get("view_mask")
            if valid is not None:
                valid = valid[..., None]  # (B, V, 1) broadcast over joints
            elif batch.get("sample_weight") is not None:
                valid = batch["sample_weight"][:, None] > 0  # (B, 1) over joints
            # Channels whose GT map is identically zero carry no scorable
            # keypoint (mixed-robot batches pad every robot to the widest
            # keypoint count; the pad target IS the zero map) - without this
            # a 2-robot run pins val_pck5 at 15/16 forever.
            gt_peak = np.asarray(batch["heatmaps"]).max(axis=(-2, -1)) > 0.1
            valid = gt_peak if valid is None else np.broadcast_to(
                np.asarray(valid), gt_peak.shape
            ) & gt_peak
            pcks.append(float(pck_at_k(pred_xy, gt_xy, k_px=5.0, valid=valid)))
        val_avg = {
            f"val_{k}": float(np.mean([float(m[k]) for m in val_metrics])) if val_metrics else float("nan")
            for k in ("loss", "loss_kpt", "loss_ang")
        }
        val_avg["val_pck5"] = float(np.mean(pcks)) if pcks else float("nan")

        record = {"epoch": epoch + 1, "epoch_time_s": time.time() - t0}
        record.update(train_avg)
        record.update(val_avg)
        writer.write(int(state.step), record)
        history.append(record)

        val_loss = val_avg["val_loss"]
        if np.isfinite(val_loss) and val_loss < best_val:
            best_val = val_loss
            save_params_npz(
                workdir / "best_params.npz", state.params, batch_stats=state.batch_stats
            )
        ckpt.save(int(state.step), state, CheckpointMeta(epoch=epoch + 1, best_val_loss=best_val))

        if on_epoch_end is not None:
            on_epoch_end(epoch, state, record)

    ckpt.wait()
    return FitResult(state=state, best_val_loss=best_val, epochs_run=epochs_run, history=history)

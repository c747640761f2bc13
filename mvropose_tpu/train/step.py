"""Jitted, mesh-sharded train/eval steps.

Data parallelism is expressed as sharding constraints under one jit: the
batch is sharded over the mesh 'data' axis, params are replicated, and XLA
inserts the gradient all-reduce over ICI - the SPMD equivalent of the
reference's DDP wrapper + NCCL bucket all-reduce
(/root/reference/model/DREAM_Train.py:789).

Design choices vs the reference:
  * ONE combined backward per step (the reference's single-view script runs
    two separate backwards through the shared forward - an accidental 2x
    backbone cost quirk, DREAM_Train.py:579-588; its multi-view script
    already uses the combined form we adopt, MvRoPose_FR3.py:846-854).
  * Empty/ragged batches: masked weights, not dummy-gradient collectives
    (MvRoPose_FR3.py:804-820 is unnecessary under SPMD).
  * donate_argnums on the state: the optimizer update is in-place in HBM.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mvropose_tpu.train.losses import (
    heatmap_mse_loss,
    masked_multiview_heatmap_loss,
    smooth_l1_loss,
)
from mvropose_tpu.train.state import TrainState, TrainConfig


def _shard_over_data(mesh: Mesh, tree):
    sh = NamedSharding(mesh, P("data"))
    return jax.lax.with_sharding_constraint(tree, sh)


def _shard_multiview_batch(mesh: Mesh, batch):
    """Shard batch dim over 'data'; if the mesh has a model axis, also shard
    the VIEW axis of the image tensor over it (view parallelism - the
    domain's sequence parallelism: each model-group runs the backbone for a
    subset of cameras, fusion all-gathers the per-view tokens over ICI)."""
    n_model = mesh.shape.get("model", 1)
    out = dict(batch)
    if n_model > 1 and batch["images"].shape[1] % n_model == 0:
        out["images"] = jax.lax.with_sharding_constraint(
            batch["images"], NamedSharding(mesh, P("data", "model"))
        )
        rest = {k: v for k, v in batch.items() if k != "images"}
        rest = _shard_over_data(mesh, rest)
        out.update(rest)
        return out
    return _shard_over_data(mesh, out)


def make_single_view_train_step(
    cfg: TrainConfig, mesh: Mesh | None = None, robot=None
) -> Callable:
    """Returns train_step(state, batch, rng) -> (state, metrics).

    batch: dict(images (B, H, W, 3), heatmaps (B, J, Hm, Wm), angles (B, A)),
    optionally sample_weight (B,) to mask padded/invalid samples (the
    reference dropped them in collate; we keep shapes static). With
    cfg.loss_weight_fk > 0, `robot` (a RobotSpec) plus batch fields
    keypoints_2d / rvec / tvec / K / base_rotation enable the differentiable
    FK-consistency term.
    """

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch, rng):
        if mesh is not None:
            batch = _shard_over_data(mesh, batch)

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            (pred_hm, pred_ang), mutated = state.apply_fn(
                variables, batch["images"], train=True,
                mutable=["batch_stats"], rngs={"dropout": rng},
            )
            w = batch.get("sample_weight")
            if w is None:
                loss_kpt = heatmap_mse_loss(pred_hm, batch["heatmaps"])
                loss_ang = smooth_l1_loss(pred_ang, batch["angles"], cfg.angle_beta)
            else:
                wf = w.astype(jnp.float32)
                per = jnp.mean((pred_hm - batch["heatmaps"]) ** 2, axis=(1, 2, 3))
                loss_kpt = jnp.sum(per * wf) / (jnp.sum(wf) + 1e-8)
                d = jnp.abs(pred_ang - batch["angles"])
                hub = jnp.where(
                    d < cfg.angle_beta, 0.5 * d * d / cfg.angle_beta, d - 0.5 * cfg.angle_beta
                )
                loss_ang = jnp.sum(jnp.mean(hub, axis=-1) * wf) / (jnp.sum(wf) + 1e-8)
            total = loss_kpt * cfg.loss_weight_kpt + loss_ang

            loss_fk = jnp.zeros(())
            if cfg.loss_weight_fk > 0.0 and robot is not None and "rvec" in batch:
                from mvropose_tpu.geometry.camera import project_points
                from mvropose_tpu.geometry.robots import forward_kinematics

                def fk_proj(ang, base, rv, tv, Kmat):
                    pts = forward_kinematics(robot, ang, base)
                    return project_points(pts, rv, tv, Kmat, None)

                proj = jax.vmap(fk_proj)(
                    pred_ang, batch["base_rotation"], batch["rvec"],
                    batch["tvec"], batch["K"],
                )
                per = jnp.mean((proj - batch["keypoints_2d"]) ** 2, axis=(1, 2))
                wf = batch.get("sample_weight")
                if wf is None:
                    loss_fk = jnp.mean(per)
                else:
                    wf = wf.astype(jnp.float32)
                    loss_fk = jnp.sum(per * wf) / (jnp.sum(wf) + 1e-8)
                total = total + cfg.loss_weight_fk * loss_fk
            return total, (loss_kpt, loss_ang, loss_fk, mutated)

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (total, (loss_kpt, loss_ang, loss_fk, mutated)), grads = grad_fn(state.params)
        state = state.apply_gradients(grads)
        state = state.replace(batch_stats=mutated["batch_stats"])
        return state, {
            "loss": total, "loss_kpt": loss_kpt, "loss_ang": loss_ang, "loss_fk": loss_fk,
        }

    return train_step


def make_multi_view_train_step(cfg: TrainConfig, mesh: Mesh | None = None) -> Callable:
    """train_step(state, batch, rng) for the multi-view estimator.

    batch: dict(images (B, V, H, W, 3), view_ids (B, V), view_mask (B, V),
    heatmaps (B, V, J, Hm, Wm), angles (B, A)).
    """

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch, rng):
        if mesh is not None:
            batch = _shard_multiview_batch(mesh, batch)

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            (pred_hm, pred_ang), mutated = state.apply_fn(
                variables,
                batch["images"],
                batch["view_ids"],
                batch["view_mask"],
                train=True,
                proj_mats=batch.get("proj_mats"),
                mutable=["batch_stats"],
                rngs={"dropout": rng},
            )
            loss_kpt = masked_multiview_heatmap_loss(
                pred_hm, batch["heatmaps"], batch["view_mask"]
            )
            loss_ang = smooth_l1_loss(pred_ang, batch["angles"], cfg.angle_beta)
            total = loss_kpt * cfg.loss_weight_kpt + loss_ang
            return total, (loss_kpt, loss_ang, mutated)

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (total, (loss_kpt, loss_ang, mutated)), grads = grad_fn(state.params)
        state = state.apply_gradients(grads)
        state = state.replace(batch_stats=mutated["batch_stats"])
        return state, {"loss": total, "loss_kpt": loss_kpt, "loss_ang": loss_ang}

    return train_step


def make_eval_step(cfg: TrainConfig, multi_view: bool, mesh: Mesh | None = None) -> Callable:
    @jax.jit
    def eval_step(state: TrainState, batch):
        if mesh is not None:
            batch = _shard_over_data(mesh, batch)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        if multi_view:
            pred_hm, pred_ang = state.apply_fn(
                variables, batch["images"], batch["view_ids"], batch["view_mask"],
                proj_mats=batch.get("proj_mats"),
            )
            loss_kpt = masked_multiview_heatmap_loss(
                pred_hm, batch["heatmaps"], batch["view_mask"]
            )
        else:
            pred_hm, pred_ang = state.apply_fn(variables, batch["images"])
            loss_kpt = heatmap_mse_loss(pred_hm, batch["heatmaps"])
        loss_ang = smooth_l1_loss(pred_ang, batch["angles"], cfg.angle_beta)
        total = loss_kpt * cfg.loss_weight_kpt + loss_ang
        return {
            "loss": total,
            "loss_kpt": loss_kpt,
            "loss_ang": loss_ang,
            "pred_heatmaps": pred_hm,
            "pred_angles": pred_ang,
        }

    return eval_step

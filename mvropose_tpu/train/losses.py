"""Training losses.

Reference loss recipe (reproduced semantically, not mechanically):
  * keypoints: MSE over heatmaps, weighted by loss_weight_kpt
    (/root/reference/model/DREAM_Train.py:580, weight 1000;
    MvRoPose_FR3.py:846-847, mean over REAL views x 100)
  * angles: SmoothL1 (huber, beta=1) (/root/reference/model/DREAM_Train.py:586)
  * optional FK-consistency: project FK(pred angles) and match GT 2D
    keypoints - the reference only sketched this (MV-model.ipynb cell 6);
    our differentiable geometry makes it a one-liner.

The multi-view keypoint loss is a MASKED mean over views: the reference's
"mean over real views" semantics (it filtered dummy keys by name,
MvRoPose_FR3.py:883) expressed as weights so shapes stay static under jit.
"""

from __future__ import annotations

import jax.numpy as jnp

from mvropose_tpu.geometry.camera import project_points
from mvropose_tpu.geometry.robots import RobotSpec, forward_kinematics_batch


def heatmap_mse_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Plain MSE over all elements (single-view path)."""
    return jnp.mean((pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2)


def masked_multiview_heatmap_loss(
    pred: jnp.ndarray,  # (B, V, J, H, W)
    target: jnp.ndarray,  # (B, V, J, H, W)
    view_mask: jnp.ndarray,  # (B, V) bool/float
) -> jnp.ndarray:
    """Per-view MSE averaged over real views only (masked mean)."""
    per_view = jnp.mean(
        (pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2, axis=(2, 3, 4)
    )  # (B, V)
    w = view_mask.astype(jnp.float32)
    return jnp.sum(per_view * w) / (jnp.sum(w) + 1e-8)


def smooth_l1_loss(pred: jnp.ndarray, target: jnp.ndarray, beta: float = 1.0) -> jnp.ndarray:
    """Huber / SmoothL1 with threshold beta (torch nn.SmoothL1Loss parity)."""
    d = jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32))
    loss = jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)
    return jnp.mean(loss)


def fk_consistency_loss(
    spec: RobotSpec,
    pred_angles: jnp.ndarray,  # (B, A) in the spec's native unit
    gt_keypoints_2d: jnp.ndarray,  # (B, J, 2) pixels
    rvec: jnp.ndarray,  # (B, 3) or (3,)
    tvec: jnp.ndarray,
    K: jnp.ndarray,  # (B, 3, 3) or (3, 3)
    base_rotation: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """|| project(FK(pred_angles)) - gt_2d ||^2 through the differentiable
    FK + projection chain."""
    pts3d = forward_kinematics_batch(spec, pred_angles, base_rotation)  # (B, J, 3)
    if rvec.ndim == 1:
        proj = project_points(pts3d, rvec, tvec, K)  # broadcasts over B
    else:
        import jax

        proj = jax.vmap(project_points)(pts3d, rvec, tvec, K)
    return jnp.mean((proj - gt_keypoints_2d) ** 2)

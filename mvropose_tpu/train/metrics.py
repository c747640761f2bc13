"""Evaluation metrics: PCK@k px and ADD.

These are the BASELINE.json parity metrics that the reference never computes
numerically (SURVEY.md section 6) - it only eyeballed overlays. Implemented
here from day one so every eval run reports them.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pck_at_k(
    pred_xy: jnp.ndarray,  # (..., J, 2) pixels
    gt_xy: jnp.ndarray,  # (..., J, 2)
    k_px: float = 5.0,
    valid: jnp.ndarray | None = None,  # (..., J) or broadcastable
) -> jnp.ndarray:
    """Percentage of Correct Keypoints within k pixels (scalar in [0, 1])."""
    d = jnp.linalg.norm(pred_xy - gt_xy, axis=-1)  # (..., J)
    correct = (d <= k_px).astype(jnp.float32)
    if valid is None:
        return jnp.mean(correct)
    w = jnp.broadcast_to(valid.astype(jnp.float32), correct.shape)
    return jnp.sum(correct * w) / (jnp.sum(w) + 1e-8)


def add_metric(
    pred_pts3d: jnp.ndarray,  # (..., J, 3) meters
    gt_pts3d: jnp.ndarray,
    valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """ADD: average 3D distance between corresponding model points (meters)."""
    d = jnp.linalg.norm(pred_pts3d - gt_pts3d, axis=-1)
    if valid is None:
        return jnp.mean(d)
    w = jnp.broadcast_to(valid.astype(jnp.float32), d.shape)
    return jnp.sum(d * w) / (jnp.sum(w) + 1e-8)


def pass_rate_auc(
    dists: jnp.ndarray,  # (...,) per-sample distances (m); inf = failed frame
    max_threshold_m: float = 0.10,
    n_steps: int = 50,
    valid: jnp.ndarray | None = None,  # (...,) per-sample weights
) -> jnp.ndarray:
    """AUC of the pass-rate curve over [0, max_threshold] (DREAM's headline).

    The single definition shared by `add_auc` (FK-space ADD) and the eval
    CLI's PnP-ADD variant so the two curves can't desynchronize. Frames where
    the measurement failed (e.g. PnP did not converge) must be passed as
    `inf` so they count against the rate at every threshold - the DREAM
    papers' all-frames protocol.
    """
    per_sample = jnp.asarray(dists, jnp.float32).reshape(-1)
    ths = jnp.linspace(0.0, max_threshold_m, n_steps)
    passed = (per_sample[None, :] <= ths[:, None]).astype(jnp.float32)
    if valid is None:
        pass_rate = jnp.mean(passed, axis=1)
    else:
        w = valid.astype(jnp.float32).reshape(-1)
        pass_rate = jnp.sum(passed * w[None, :], axis=1) / (jnp.sum(w) + 1e-8)
    return jnp.trapezoid(pass_rate, ths) / max_threshold_m


def add_auc(
    pred_pts3d: jnp.ndarray,
    gt_pts3d: jnp.ndarray,
    max_threshold_m: float = 0.10,
    n_steps: int = 50,
    valid: jnp.ndarray | None = None,  # (...,) per-sample weights
) -> jnp.ndarray:
    """Area under the ADD pass-rate curve up to max_threshold (DREAM-style)."""
    d = jnp.linalg.norm(pred_pts3d - gt_pts3d, axis=-1)  # (..., J)
    per_sample = jnp.mean(d, axis=-1)  # mean ADD per sample
    return pass_rate_auc(per_sample, max_threshold_m, n_steps, valid=valid)


def angle_mae(
    pred_angles: jnp.ndarray,
    gt_angles: jnp.ndarray,
    valid: jnp.ndarray | None = None,  # (...,) per-sample weights
) -> jnp.ndarray:
    err = jnp.mean(jnp.abs(pred_angles - gt_angles), axis=-1)  # (...,) per sample
    if valid is None:
        return jnp.mean(err)
    w = jnp.broadcast_to(valid.astype(jnp.float32), err.shape)
    return jnp.sum(err * w) / (jnp.sum(w) + 1e-8)


def pose_rotation_err_deg(
    rvec_pred: jnp.ndarray,  # (..., 3) Rodrigues, radians
    rvec_gt: jnp.ndarray,
) -> jnp.ndarray:
    """Geodesic rotation error between recovered and GT camera pose, degrees.

    The reference's headline serve output is the PnP-recovered camera pose
    (/root/reference/model/Fr5_model_train.ipynb cell 14, estimate_camera_pose
    -> rvec/tvec) but it only ever eyeballs reprojection overlays; this metric
    quantifies it: angle of R_pred^T R_gt via the trace identity, numerically
    clamped. Broadcasts over leading axes.
    """
    from mvropose_tpu.geometry.rotations import rodrigues_to_matrix

    shape = jnp.broadcast_shapes(rvec_pred.shape, rvec_gt.shape)
    rp = jnp.broadcast_to(rvec_pred, shape).reshape(-1, 3)
    rg = jnp.broadcast_to(rvec_gt, shape).reshape(-1, 3)
    Rp = jax.vmap(rodrigues_to_matrix)(rp)  # (N, 3, 3)
    Rg = jax.vmap(rodrigues_to_matrix)(rg)
    rel_trace = jnp.einsum("nij,nij->n", Rp, Rg)  # trace(Rp^T Rg)
    cos = jnp.clip((rel_trace - 1.0) / 2.0, -1.0, 1.0)
    return jnp.degrees(jnp.arccos(cos)).reshape(shape[:-1])


def pose_translation_err_m(
    tvec_pred: jnp.ndarray,  # (..., 3) meters
    tvec_gt: jnp.ndarray,
) -> jnp.ndarray:
    """Euclidean camera-translation error in meters (broadcasts)."""
    return jnp.linalg.norm(tvec_pred - tvec_gt, axis=-1)

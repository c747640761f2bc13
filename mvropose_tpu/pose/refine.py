"""Joint (camera pose, joint angle) reprojection refinement (beyond the
reference).

The reference's serve path recovers pose by PnP on FK(predicted angles)
object points (Fr5_model_train.ipynb cell 14): an angle error moves every 3D
model point, and the recovered pose absorbs it. On DREAM-geometry single-view
rigs the measured damage is large - with the geometric head's 0.38 rad MAE
the recovered rotation sits at ~51 deg vs a 9.7 deg gt-angles decode-noise
floor (runs/dream_geo eval vs runs/task_bound_dream5_pose.json).

This module treats the predicted angles as an initial guess + prior instead
of as the truth: a damped Gauss-Newton refinement over the JOINT parameter
vector p = [rvec_1..V, tvec_1..V, theta] minimizing

    sum_v w_vj ||project(R_v FK(theta)_j + t_v) - xy_vj||^2 / sigma_px^2
    + ||theta - theta_pred||^2 / sigma_prior^2

with theta SHARED across views (the physical robot state), per-view 6D poses,
confidence-gated residual weights, multi-start over angle hypotheses (the
7-point single-view problem has 2J*V + A observations vs 6V + A unknowns -
near-interpolating at V=1, so Gauss-Newton basins are narrow and a single
start from wrong angles stalls ~30 deg off; vmapped restarts are nearly free
on the MXU), and a RANSAC-PnP re-solve + polish pass that escapes pose local
minima the joint LM cannot.

Measured feasibility bounds (scripts/task_bound_joint_pose.py): at 256px /
1.2 px decode noise / 0.19 rad prior error, PnP-on-pred-angles = 22 deg mean,
this refinement = 11-16 deg, oracle-initialized joint ML = 8.8 deg, gt-angles
floor = 3.8 deg. The refinement closes most of the reachable gap; the rest is
the information limit of 7 noisy 2D points vs 13 unknowns, not optimizer
slack.

All pure jnp: fixed iteration counts (lax.scan), static shapes, vmap over
batch and hypotheses - one jit, no host round-trips.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from mvropose_tpu.geometry.camera import project_points
from mvropose_tpu.geometry.pnp import solve_pnp_ransac
from mvropose_tpu.geometry.robots import RobotSpec, forward_kinematics

DEFAULT_SIGMA_PX = 1.2  # measured refine-decode error at 128-256px (eval kp_px_err_mean)
DEFAULT_CONFIDENCE_THRESHOLD = 0.6  # the reference's serve gate


@functools.partial(
    jax.jit, static_argnames=("robot", "n_starts", "iters", "polish_iters")
)
def refine_rig_pose_angles(
    xy: jnp.ndarray,  # (V, J, 2) decoded keypoints, image px
    conf: jnp.ndarray,  # (V, J) decode confidences
    pred_angles: jnp.ndarray,  # (A,) network prediction, native units
    rvec0: jnp.ndarray,  # (V, 3) initial pose (e.g. solve_rig_pnp output)
    tvec0: jnp.ndarray,  # (V, 3)
    base_rotations: jnp.ndarray,  # (V, 3, 3)
    Ks: jnp.ndarray,  # (V, 3, 3)
    robot: RobotSpec,
    key: jax.Array,
    view_mask: jnp.ndarray | None = None,  # (V,) bool; None = all valid
    sigma_px: float = DEFAULT_SIGMA_PX,
    sigma_prior: float = 0.2,  # prior std in the robot's NATIVE angle unit
    n_starts: int = 32,
    iters: int = 40,
    polish_iters: int = 20,
    damping: float = 1e-3,
    confidence_threshold: float = DEFAULT_CONFIDENCE_THRESHOLD,
):
    """Multi-start joint LM + RANSAC-PnP re-solve; returns the lowest-cost fit.

    Returns dict(rvec (V,3), tvec (V,3), angles (A,), cost ()): `cost` is the
    selected minimum of the weighted least-squares objective above. Batch with
    vmap; `robot` and the shape-determining counts are static.

    `sigma_prior` is per-robot-unit (radians for fr3/dream, degrees for
    fr5/meca): pass the angle head's measured MAE so the prior's pull matches
    the network's actual reliability.
    """
    V, J = xy.shape[0], xy.shape[1]
    A = pred_angles.shape[0]
    if view_mask is None:
        view_mask = jnp.ones((V,), dtype=bool)
    w = (conf >= confidence_threshold).astype(xy.dtype) * view_mask[:, None].astype(
        xy.dtype
    )  # (V, J)

    def unpack(p):
        rv = p[: 3 * V].reshape(V, 3)
        tv = p[3 * V : 6 * V].reshape(V, 3)
        theta = p[6 * V :]
        return rv, tv, theta

    def residuals(p):
        rv, tv, theta = unpack(p)
        fk = robot.keypoints_from_fk(forward_kinematics(robot, theta))  # (J, 3)
        obj = jnp.einsum("vij,kj->vki", base_rotations, fk)  # (V, J, 3)
        proj = jax.vmap(lambda o, r, t, K: project_points(o, r, t, K, None))(
            obj, rv, tv, Ks
        )  # (V, J, 2)
        r_proj = (proj - xy) * w[..., None] / sigma_px
        r_prior = (theta - pred_angles) / sigma_prior
        return jnp.concatenate([r_proj.reshape(-1), r_prior])

    jac = jax.jacfwd(residuals)
    n_params = 6 * V + A
    eye = jnp.eye(n_params, dtype=xy.dtype)

    def lm(p0, n):
        def step(p, _):
            r = residuals(p)
            Jm = jac(p)
            JtJ = Jm.T @ Jm
            # Marquardt scaling: damping relative to diag(JtJ) keeps the step
            # well-conditioned regardless of the robot's angle unit (degree
            # robots have ~57x smaller FK jacobians than radian ones).
            M = JtJ + damping * jnp.diag(jnp.diag(JtJ)) + 1e-9 * eye
            return p - jnp.linalg.solve(M, Jm.T @ r), None

        p, _ = jax.lax.scan(step, p0, None, length=n)
        return p, jnp.sum(residuals(p) ** 2)

    # Multi-start over angle hypotheses around the prediction (hypothesis 0 is
    # the unperturbed prediction); pose starts stay at the PnP initialization.
    perturb = sigma_prior * jax.random.normal(key, (n_starts, A), dtype=xy.dtype)
    perturb = perturb.at[0].set(0.0)
    p_pose0 = jnp.concatenate([rvec0.reshape(-1), tvec0.reshape(-1)])
    ps, costs = jax.vmap(
        lambda d: lm(jnp.concatenate([p_pose0, pred_angles + d]), iters)
    )(perturb)
    best = ps[jnp.argmin(costs)]
    best_cost = jnp.min(costs)

    # Escape pose-side local minima: global RANSAC re-solve per view with the
    # refined angles as object points, then a short joint polish; keep it only
    # if the total cost actually improves.
    _, _, theta_best = unpack(best)
    fk_b = robot.keypoints_from_fk(forward_kinematics(robot, theta_best))
    obj_b = jnp.einsum("vij,kj->vki", base_rotations, fk_b)
    keys = jax.random.split(jax.random.fold_in(key, 1), V)
    pnp = jax.vmap(
        lambda o, xy_v, w_v, K_v, k_v: solve_pnp_ransac(
            o, xy_v, K_v, weights=w_v, key=k_v, n_hypotheses=16
        )
    )(obj_b, xy, w, Ks, keys)
    p_repnp0 = jnp.concatenate(
        [pnp["rvec"].reshape(-1), pnp["tvec"].reshape(-1), theta_best]
    )
    p_polish, cost_polish = lm(p_repnp0, polish_iters)

    take = cost_polish < best_cost
    p_final = jnp.where(take, p_polish, best)
    rv, tv, theta = unpack(p_final)
    return {
        "rvec": rv,
        "tvec": tv,
        "angles": theta,
        "cost": jnp.where(take, cost_polish, best_cost),
    }

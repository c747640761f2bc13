"""Differentiable inverse kinematics (beyond the reference).

The reference only ever runs FK forward; because our FK chain is a pure jnp
function, its jacobian and a Gauss-Newton IK solver come almost for free.
Useful downstream for closing the loop (drive the arm to a pose recovered by
the vision stack) and as a second consistency check on predicted angles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from mvropose_tpu.geometry.robots import RobotSpec, forward_kinematics


def fk_jacobian(spec: RobotSpec, joint_angles: jnp.ndarray, base_rotation=None) -> jnp.ndarray:
    """d keypoints / d angles: (J+1, 3, A)."""
    fn = lambda a: forward_kinematics(spec, a, base_rotation)
    return jax.jacfwd(fn)(joint_angles)


@functools.partial(jax.jit, static_argnames=("spec", "iters"))
def solve_ik(
    spec: RobotSpec,
    target_positions: jnp.ndarray,  # (J+1, 3) desired keypoint positions
    initial_angles: jnp.ndarray,  # (A,) starting guess, native units
    weights: jnp.ndarray | None = None,  # (J+1,) per-keypoint weights
    base_rotation: jnp.ndarray | None = None,
    iters: int = 30,
    damping: float = 1e-3,
):
    """Damped Gauss-Newton IK: angles minimizing ||FK(angles) - targets||.

    Returns (angles (A,), final_rmse_m). Fixed iteration count (jit-static);
    batch with vmap.
    """
    J1 = target_positions.shape[0]
    if weights is None:
        weights = jnp.ones((J1,), dtype=jnp.float32)
    w = jnp.repeat(weights, 3)

    def residuals(angles):
        pts = forward_kinematics(spec, angles, base_rotation)
        return ((pts - target_positions).reshape(-1)) * w

    jac = jax.jacfwd(residuals)

    def step(angles, _):
        r = residuals(angles)
        Jm = jac(angles)
        JtJ = Jm.T @ Jm
        # Marquardt scaling: damping relative to diag(JtJ) keeps the step
        # well-conditioned regardless of the spec's angle unit (degree-unit
        # robots have ~57x smaller jacobians than radian-unit ones).
        A = JtJ + damping * jnp.diag(jnp.diag(JtJ)) + 1e-12 * jnp.eye(JtJ.shape[0], dtype=JtJ.dtype)
        delta = jnp.linalg.solve(A, Jm.T @ r)
        return angles - delta, None

    angles, _ = jax.lax.scan(step, jnp.asarray(initial_angles, jnp.float32), None, length=iters)
    # RMSE over the FITTED residuals only: zero-weight keypoints contribute
    # identically-zero residual entries, and averaging them in understates
    # the true per-keypoint error (e.g. by sqrt(2) with half the keypoints
    # masked) - a caller gating on 'rmse < tol' would accept bad solutions.
    r = residuals(angles)
    wsum = jnp.sum(w > 0)
    rmse = jnp.sqrt(jnp.sum(r**2) / jnp.maximum(wsum, 1))
    return angles, rmse

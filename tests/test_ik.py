"""Differentiable IK (Gauss-Newton on the FK chain)."""

import numpy as np

import jax.numpy as jnp

from mvropose_tpu.geometry.ik import fk_jacobian, solve_ik
from mvropose_tpu.geometry.robots import FR3, MECA500, forward_kinematics


def test_fk_jacobian_shape_and_finite():
    jac = np.asarray(fk_jacobian(FR3, jnp.ones(7) * 0.2))
    assert jac.shape == (8, 3, 7)
    assert np.isfinite(jac).all()
    # Base keypoint never moves with the joints.
    np.testing.assert_allclose(jac[0], 0.0, atol=1e-7)


def test_solve_ik_recovers_pose(rng):
    gt = rng.uniform(-1.0, 1.0, size=7).astype(np.float32)
    targets = forward_kinematics(FR3, jnp.asarray(gt))
    init = jnp.asarray(gt + rng.normal(size=7).astype(np.float32) * 0.15)
    angles, rmse = solve_ik(FR3, targets, init, iters=40)
    assert float(rmse) < 1e-4
    # The recovered FK matches the target skeleton (angles may differ if the
    # chain has redundancy, so compare in task space).
    pts = forward_kinematics(FR3, angles)
    np.testing.assert_allclose(np.asarray(pts), np.asarray(targets), atol=1e-3)


def test_solve_ik_degrees_robot(rng):
    gt = rng.uniform(-40, 40, size=6).astype(np.float32)
    targets = forward_kinematics(MECA500, jnp.asarray(gt))
    angles, rmse = solve_ik(MECA500, targets, jnp.asarray(gt + 5.0), iters=40)
    assert float(rmse) < 1e-4

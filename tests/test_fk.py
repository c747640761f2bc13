"""Forward kinematics vs independent numpy golden implementations.

The golden implementations below follow the published DH conventions
(standard DH and Craig modified DH) with the robot tables from the reference
repo; our jnp FK must agree to float32 precision.
"""

import math

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

import jax
import jax.numpy as jnp

from mvropose_tpu.geometry.robots import (
    FR3,
    FR5,
    MECA500,
    forward_kinematics,
    forward_kinematics_batch,
)


def np_standard_dh(a, d, alpha_deg, theta_deg):
    al = math.radians(alpha_deg)
    th = math.radians(theta_deg)
    return np.array(
        [
            [np.cos(th), -np.sin(th) * np.cos(al), np.sin(th) * np.sin(al), a * np.cos(th)],
            [np.sin(th), np.cos(th) * np.cos(al), -np.cos(th) * np.sin(al), a * np.sin(th)],
            [0, np.sin(al), np.cos(al), d],
            [0, 0, 0, 1],
        ]
    )


def np_modified_dh(a, d, alpha_deg, theta_deg):
    al = math.radians(alpha_deg)
    th = math.radians(theta_deg)
    return np.array(
        [
            [np.cos(th), -np.sin(th), 0, a],
            [np.sin(th) * np.cos(al), np.cos(th) * np.cos(al), -np.sin(al), -d * np.sin(al)],
            [np.sin(th) * np.sin(al), np.cos(th) * np.sin(al), np.cos(al), d * np.cos(al)],
            [0, 0, 0, 1],
        ]
    )


def np_fk(spec, angles, base_rot=None):
    """Independent numpy FK for a RobotSpec."""
    T = np.eye(4)
    if base_rot is not None:
        T[:3, :3] = base_rot
    coords = [np.zeros(3)]
    builder = np_standard_dh if spec.convention == "standard" else np_modified_dh
    for (a, d, alpha, theta_off), ang in zip(spec.dh_params, angles):
        ang_deg = ang if spec.angle_unit == "deg" else math.degrees(ang)
        T = T @ builder(a, d, alpha, ang_deg + theta_off)
        coords.append(T[:3, 3].copy())
    return np.asarray(coords)


@pytest.mark.parametrize("spec", [FR3, FR5, MECA500], ids=lambda s: s.name)
def test_fk_matches_numpy_golden(spec, rng):
    for _ in range(5):
        if spec.angle_unit == "deg":
            angles = rng.uniform(-170, 170, size=spec.n_joints)
        else:
            angles = rng.uniform(-2.8, 2.8, size=spec.n_joints)
        got = np.asarray(forward_kinematics(spec, jnp.asarray(angles, jnp.float32)))
        want = np_fk(spec, angles)
        assert got.shape == (spec.n_keypoints, 3)
        np.testing.assert_allclose(got, want, atol=2e-5)


def test_fk_with_view_rotation(rng):
    angles = rng.uniform(-2.0, 2.0, size=7)
    base = FR3.base_rotation("view1")
    base_ref = R.from_euler("zyx", [90, 180, 0], degrees=True).as_matrix()
    np.testing.assert_allclose(base, base_ref, atol=1e-5)
    got = np.asarray(
        forward_kinematics(FR3, jnp.asarray(angles, jnp.float32), jnp.asarray(base))
    )
    want = np_fk(FR3, angles, base_ref)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_fk_zero_pose_fr3():
    """All-zero FR3 pose: joint 1 sits at (0, 0, d1) etc (sanity anchors)."""
    got = np.asarray(forward_kinematics(FR3, jnp.zeros(7)))
    np.testing.assert_allclose(got[0], [0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(got[1], [0, 0, 0.333], atol=1e-6)
    np.testing.assert_allclose(got[2], [0, 0, 0.333], atol=1e-6)  # joint2: d=0
    np.testing.assert_allclose(got[3], [0, 0, 0.649], atol=1e-6)  # +0.316


def test_fk_batched_and_jitted(rng):
    angles = rng.uniform(-1, 1, size=(16, 7)).astype(np.float32)
    fn = jax.jit(lambda a: forward_kinematics_batch(FR3, a))
    out = np.asarray(fn(jnp.asarray(angles)))
    assert out.shape == (16, 8, 3)
    for i in range(3):
        np.testing.assert_allclose(out[i], np_fk(FR3, angles[i]), atol=2e-5)


def test_fk_differentiable():
    """FK must be differentiable for the FK-consistency training loss."""
    def loss(angles):
        pts = forward_kinematics(FR3, angles)
        return jnp.sum(pts**2)

    g = jax.grad(loss)(jnp.ones(7) * 0.3)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).sum()) > 0


def test_fk_angle_unit_consistency():
    """The same physical pose expressed in each spec's native unit matches a
    manual radian evaluation (degrees-vs-radians trap guard)."""
    deg = np.array([30.0, -45.0, 60.0, 0.0, 90.0, 0.0])
    out_meca = np.asarray(forward_kinematics(MECA500, jnp.asarray(deg, jnp.float32)))
    # Same table evaluated as a radian-unit spec with pre-converted angles.
    import dataclasses

    meca_rad = dataclasses.replace(MECA500, name="meca_rad", angle_unit="rad")
    out_rad = np.asarray(
        forward_kinematics(meca_rad, jnp.asarray(np.deg2rad(deg), jnp.float32))
    )
    np.testing.assert_allclose(out_meca, out_rad, atol=1e-5)


def test_dream_panda_urdf_origins():
    """DREAM's 7 named keypoints sit at the URDF link-frame origins; pin the
    zero-config positions from the franka kinematics (flange d=0.107 after
    joint 7). An earlier mapping had panda_link7 at the link6 origin
    (8.8 cm off) and panda_hand at the link7 origin (10.7 cm off) - wrong
    object points for every PnP solve against real DREAM data."""
    from mvropose_tpu.geometry.robots import DREAM_PANDA, forward_kinematics

    assert DREAM_PANDA.n_joints == 7  # flange row is passive, consumes no angle
    kp = np.asarray(
        DREAM_PANDA.keypoints_from_fk(forward_kinematics(DREAM_PANDA, jnp.zeros(7)))
    )
    want = np.array([
        [0.0, 0.0, 0.0],        # panda_link0
        [0.0, 0.0, 0.333],      # panda_link2
        [0.0, 0.0, 0.649],      # panda_link3
        [0.0825, 0.0, 0.649],   # panda_link4
        [0.0, 0.0, 1.033],      # panda_link6
        [0.088, 0.0, 1.033],    # panda_link7
        [0.088, 0.0, 0.926],    # panda_hand (flange)
    ], np.float32)
    np.testing.assert_allclose(kp, want, atol=1e-6)

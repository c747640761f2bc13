"""Rotation utilities vs scipy / cv2 golden values."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

import jax.numpy as jnp

from mvropose_tpu.geometry import rotations as rot


def random_rotvecs(rng, n=20, max_angle=np.pi * 0.98):
    axes = rng.normal(size=(n, 3))
    axes /= np.linalg.norm(axes, axis=1, keepdims=True)
    angles = rng.uniform(0, max_angle, size=(n, 1))
    return axes * angles


def test_rodrigues_roundtrip_vs_scipy(rng):
    for rvec in random_rotvecs(rng):
        M = np.asarray(rot.rodrigues_to_matrix(jnp.asarray(rvec, jnp.float32)))
        M_ref = R.from_rotvec(rvec).as_matrix()
        np.testing.assert_allclose(M, M_ref, atol=1e-5)
        back = np.asarray(rot.matrix_to_rodrigues(jnp.asarray(M_ref, jnp.float32)))
        np.testing.assert_allclose(back, rvec, atol=1e-4)


def test_rodrigues_small_angle():
    rvec = jnp.asarray([1e-9, -1e-9, 1e-9], jnp.float32)
    M = np.asarray(rot.rodrigues_to_matrix(rvec))
    np.testing.assert_allclose(M, np.eye(3), atol=1e-6)


def test_quat_matrix_roundtrip_vs_scipy(rng):
    for rvec in random_rotvecs(rng):
        q_ref = R.from_rotvec(rvec).as_quat()  # (x, y, z, w)
        M = np.asarray(rot.quat_to_matrix(jnp.asarray(q_ref, jnp.float32)))
        np.testing.assert_allclose(M, R.from_quat(q_ref).as_matrix(), atol=1e-5)
        q_back = np.asarray(rot.matrix_to_quat(jnp.asarray(M, jnp.float32)))
        # Sign-canonicalize both.
        if q_ref[3] < 0:
            q_ref = -q_ref
        np.testing.assert_allclose(q_back, q_ref, atol=1e-4)


def test_euler_zyx_matches_scipy(rng):
    for _ in range(10):
        angles = rng.uniform(-180, 180, size=3)
        M = np.asarray(rot.euler_zyx_deg_to_matrix(jnp.asarray(angles, jnp.float32)))
        M_ref = R.from_euler("zyx", angles, degrees=True).as_matrix()
        np.testing.assert_allclose(M, M_ref, atol=1e-5)


def test_average_quaternion_recovers_mean(rng):
    # Small perturbations of a base rotation: eigen-mean should be close to it.
    base = R.from_rotvec(rng.normal(size=3) * 0.5)
    quats = []
    for _ in range(30):
        noise = R.from_rotvec(rng.normal(size=3) * 0.01)
        quats.append((base * noise).as_quat())
    quats = np.asarray(quats)
    q_mean = np.asarray(rot.average_quaternion(jnp.asarray(quats, jnp.float32)))
    ang = (base.inv() * R.from_quat(q_mean)).magnitude()
    assert ang < 0.02


def test_average_quaternion_sign_invariance(rng):
    base = R.from_rotvec([0.3, -0.2, 0.9]).as_quat()
    quats = np.stack([base, -base, base, -base])
    q_mean = np.asarray(rot.average_quaternion(jnp.asarray(quats, jnp.float32)))
    assert min(np.linalg.norm(q_mean - base), np.linalg.norm(q_mean + base)) < 1e-4


def test_quat_angular_distance(rng):
    q1 = R.from_rotvec([0, 0, 0.0]).as_quat()
    q2 = R.from_rotvec([0, 0, 0.5]).as_quat()
    d = float(rot.quat_angular_distance(jnp.asarray(q1), jnp.asarray(q2)))
    assert abs(d - 0.5) < 1e-5


def test_kabsch_exact_and_weighted(rng):
    """kabsch recovers an exact rigid transform, and weight-0 points (padded
    batch slots / invalid keypoints) cannot corrupt it."""
    pts = rng.normal(size=(7, 3)).astype(np.float32)
    R_true = R.from_rotvec([0.3, -0.5, 0.9]).as_matrix().astype(np.float32)
    t_true = np.array([0.1, -0.2, 1.5], np.float32)
    dst = pts @ R_true.T + t_true

    R_hat, t_hat = rot.kabsch(jnp.asarray(pts), jnp.asarray(dst))
    np.testing.assert_allclose(np.asarray(R_hat), R_true, atol=1e-5)
    np.testing.assert_allclose(np.asarray(t_hat), t_true, atol=1e-5)

    corrupted = dst.copy()
    corrupted[3] += 100.0
    w = np.ones(7, np.float32)
    w[3] = 0.0
    R_hat, t_hat = rot.kabsch(jnp.asarray(pts), jnp.asarray(corrupted), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(R_hat), R_true, atol=1e-5)
    np.testing.assert_allclose(np.asarray(t_hat), t_true, atol=1e-5)


def test_kabsch_reflection_guard(rng):
    """Near-planar point sets must still return a proper rotation
    (det +1), not a reflection."""
    pts = rng.normal(size=(6, 3)).astype(np.float32)
    pts[:, 2] *= 1e-4  # almost planar
    R_true = R.from_rotvec([0.0, 1.2, 0.4]).as_matrix().astype(np.float32)
    dst = pts @ R_true.T
    R_hat, _ = rot.kabsch(jnp.asarray(pts), jnp.asarray(dst))
    assert float(jnp.linalg.det(R_hat)) > 0.99
    np.testing.assert_allclose(np.asarray(R_hat), R_true, atol=1e-3)

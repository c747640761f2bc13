"""SO(3) utilities: rotation vectors, quaternions, euler angles.

jnp replacements for the scipy.spatial.transform.Rotation / cv2.Rodrigues
call-sites of the reference (e.g. quaternion eigen-mean averaging used by the
ArUco extrinsic calibration, /root/reference/dataset/Fr5_preprocessing.py:57-76,
and the per-view base rotations of the FK chains,
/root/reference/model/MvRoPose_FR3.py:105-110).

Quaternions are (x, y, z, w), matching scipy's convention.
All functions are pure, differentiable and vmappable.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-12


def rodrigues_to_matrix(rvec: jnp.ndarray) -> jnp.ndarray:
    """Rotation vector (3,) -> rotation matrix (3, 3).

    Uses the Rodrigues formula with a Taylor-safe branch at theta ~ 0 so the
    function stays differentiable everywhere.
    """
    rvec = jnp.asarray(rvec)  # accepts array-likes, like cv2.Rodrigues
    theta2 = jnp.sum(rvec * rvec)
    theta = jnp.sqrt(theta2 + _EPS)
    # sin(t)/t and (1-cos(t))/t^2 with small-angle Taylor fallbacks.
    small = theta2 < 1e-12
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / (theta2 + _EPS))
    wx, wy, wz = rvec[0], rvec[1], rvec[2]
    K = jnp.array([[0.0, -wz, wy], [wz, 0.0, -wx], [-wy, wx, 0.0]], dtype=rvec.dtype)
    eye = jnp.eye(3, dtype=rvec.dtype)
    return eye + a * K + b * (K @ K)


def matrix_to_rodrigues(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (3, 3) -> rotation vector (3,)."""
    R = jnp.asarray(R)
    # Angle from trace, axis from the skew part; quaternion route is more
    # numerically stable near pi, so go through the quaternion.
    q = matrix_to_quat(R)
    return quat_to_rodrigues(q)


def quat_to_rodrigues(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (x, y, z, w) -> rotation vector (3,)."""
    q = jnp.asarray(q)
    q = q / (jnp.linalg.norm(q) + _EPS)
    # Force w >= 0 so the angle is in [0, pi].
    q = jnp.where(q[3] < 0, -q, q)
    v = q[:3]
    w = q[3]
    norm_v = jnp.linalg.norm(v)
    angle = 2.0 * jnp.arctan2(norm_v, w)
    # angle/norm_v with small-angle fallback (sin(t/2) ~ t/2).
    scale = jnp.where(norm_v < 1e-9, 2.0 / jnp.clip(w, _EPS, None), angle / (norm_v + _EPS))
    return v * scale


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (x, y, z, w) -> rotation matrix (3, 3)."""
    q = jnp.asarray(q)
    q = q / (jnp.linalg.norm(q) + _EPS)
    x, y, z, w = q[0], q[1], q[2], q[3]
    return jnp.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ],
        dtype=q.dtype,
    )


def matrix_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (3, 3) -> unit quaternion (x, y, z, w).

    Branch-free Shepperd's method: compute all four candidate quaternions and
    select the best-conditioned one with where-masks (jit friendly).
    """
    R = jnp.asarray(R)
    m00, m01, m02 = R[0, 0], R[0, 1], R[0, 2]
    m10, m11, m12 = R[1, 0], R[1, 1], R[1, 2]
    m20, m21, m22 = R[2, 0], R[2, 1], R[2, 2]
    tr = m00 + m11 + m22

    # Four candidate constructions; pick the best-conditioned one below.
    s0 = jnp.sqrt(jnp.clip(1.0 + tr, _EPS, None)) * 2.0  # 4*qw
    c0 = jnp.stack([(m21 - m12) / s0, (m02 - m20) / s0, (m10 - m01) / s0, s0 / 4.0])

    s1 = jnp.sqrt(jnp.clip(1.0 + m00 - m11 - m22, _EPS, None)) * 2.0  # 4*qx
    c1 = jnp.stack([s1 / 4.0, (m01 + m10) / s1, (m02 + m20) / s1, (m21 - m12) / s1])

    s2 = jnp.sqrt(jnp.clip(1.0 - m00 + m11 - m22, _EPS, None)) * 2.0  # 4*qy
    c2 = jnp.stack([(m01 + m10) / s2, s2 / 4.0, (m12 + m21) / s2, (m02 - m20) / s2])

    s3 = jnp.sqrt(jnp.clip(1.0 - m00 - m11 + m22, _EPS, None)) * 2.0  # 4*qz
    c3 = jnp.stack([(m02 + m20) / s3, (m12 + m21) / s3, s3 / 4.0, (m10 - m01) / s3])

    cands = jnp.stack([c0, c1, c2, c3])  # (4, 4)
    scores = jnp.stack([tr, m00 - m11 - m22, m11 - m00 - m22, m22 - m00 - m11])
    idx = jnp.argmax(scores)
    q = cands[idx]
    q = q / (jnp.linalg.norm(q) + _EPS)
    # Canonical sign: w >= 0.
    return jnp.where(q[3] < 0, -q, q)


def euler_zyx_deg_to_matrix(angles_deg: jnp.ndarray) -> jnp.ndarray:
    """Extrinsic z-y-x euler angles in degrees -> rotation matrix.

    Matches scipy `Rotation.from_euler('zyx', [a, b, c], degrees=True)`
    (lowercase axes = extrinsic): rotate about fixed z by a, then fixed y by
    b, then fixed x by c, i.e. R = Rx(c) @ Ry(b) @ Rz(a). The reference uses
    this for the per-view robot-base corrections
    (/root/reference/model/MvRoPose_FR3.py:106).
    """
    a = jnp.deg2rad(jnp.asarray(angles_deg))
    cz, sz = jnp.cos(a[0]), jnp.sin(a[0])
    cy, sy = jnp.cos(a[1]), jnp.sin(a[1])
    cx, sx = jnp.cos(a[2]), jnp.sin(a[2])
    Rz = jnp.array([[cz, -sz, 0.0], [sz, cz, 0.0], [0.0, 0.0, 1.0]], dtype=a.dtype)
    Ry = jnp.array([[cy, 0.0, sy], [0.0, 1.0, 0.0], [-sy, 0.0, cy]], dtype=a.dtype)
    Rx = jnp.array([[1.0, 0.0, 0.0], [0.0, cx, -sx], [0.0, sx, cx]], dtype=a.dtype)
    return Rx @ Ry @ Rz


def average_quaternion(quats: jnp.ndarray, weights: jnp.ndarray | None = None) -> jnp.ndarray:
    """Eigen-mean of quaternions (N, 4) -> (4,).

    The chordal-L2 mean: the dominant eigenvector of sum_i w_i q_i q_i^T.
    Replaces the reference's numpy implementation
    (/root/reference/dataset/Fr5_preprocessing.py:57-66) with a jittable one.
    """
    quats = jnp.asarray(quats)
    if weights is None:
        weights = jnp.ones((quats.shape[0],), dtype=quats.dtype)
    M = jnp.einsum("n,ni,nj->ij", weights, quats, quats)
    _, eigvecs = jnp.linalg.eigh(M)
    q = eigvecs[:, -1]
    q = q / (jnp.linalg.norm(q) + _EPS)
    return jnp.where(q[3] < 0, -q, q)


def quat_angular_distance(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Geodesic angle (radians) between two unit quaternions."""
    q1 = jnp.asarray(q1)
    q2 = jnp.asarray(q2)
    q1 = q1 / (jnp.linalg.norm(q1) + _EPS)
    q2 = q2 / (jnp.linalg.norm(q2) + _EPS)
    dot = jnp.abs(jnp.sum(q1 * q2))
    return 2.0 * jnp.arccos(jnp.clip(dot, 0.0, 1.0))


def kabsch(
    src: jnp.ndarray,  # (N, 3) points in frame A
    dst: jnp.ndarray,  # (N, 3) the same points in frame B
    weights: jnp.ndarray | None = None,  # (N,) non-negative
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Least-squares rigid alignment: (R, t) with dst ~= src @ R.T + t.

    Weighted Kabsch via SVD of the cross-covariance, with the det-sign fix
    for reflections. Used to derive a GROUND-TRUTH camera pose from datasets
    that store camera-frame 3D keypoints but no extrinsic (DREAM's
    kpt_*_loc_* columns): aligning FK(gt angles) in the robot base frame to
    the stored camera-frame points recovers the exact base->camera transform,
    which the PnP-recovered pose can then be scored against (the DREAM
    paper's own evaluation protocol recovers pose with PnP and reports ADD
    in the camera frame). Jittable; weights let weight-0 slots of a padded
    batch drop out.
    """
    src = jnp.asarray(src)
    dst = jnp.asarray(dst)
    if weights is None:
        weights = jnp.ones(src.shape[:-1], dtype=src.dtype)
    w = weights[..., None] / (jnp.sum(weights) + _EPS)
    mu_s = jnp.sum(src * w, axis=-2)
    mu_d = jnp.sum(dst * w, axis=-2)
    H = jnp.einsum("ni,nj,n->ij", src - mu_s, dst - mu_d, weights)
    U, _, Vt = jnp.linalg.svd(H)
    d = jnp.sign(jnp.linalg.det(Vt.T @ U.T))
    S = jnp.diag(jnp.stack([jnp.ones((), src.dtype), jnp.ones((), src.dtype), d]))
    R = Vt.T @ S @ U.T
    t = mu_d - R @ mu_s
    return R, t

"""PnP + triangulation vs cv2 golden / synthetic ground truth."""

import cv2
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvropose_tpu.geometry import pnp
from mvropose_tpu.geometry import triangulation as tri
from mvropose_tpu.geometry.robots import FR3, forward_kinematics
from mvropose_tpu.geometry.camera import project_points
from mvropose_tpu.geometry.rotations import rodrigues_to_matrix

K = np.array([[737.0, 0, 960.0], [0, 737.0, 540.0], [0, 0, 1]], dtype=np.float64)


def make_scene(rng, n=8, noise_px=0.0):
    """Random non-coplanar 3D points + a valid camera pose, like an FK chain."""
    angles = rng.uniform(-1.5, 1.5, size=7)
    obj = np.asarray(forward_kinematics(FR3, jnp.asarray(angles, jnp.float32)), dtype=np.float64)
    rvec = rng.normal(size=3) * 0.4
    tvec = np.array([0.05, -0.1, 1.6]) + rng.normal(size=3) * 0.05
    img, _ = cv2.projectPoints(obj, rvec, tvec, K, np.zeros(5))
    img = img.reshape(-1, 2)
    img += rng.normal(size=img.shape) * noise_px
    return obj, img, rvec, tvec


def pose_errors(rvec, tvec, rvec_gt, tvec_gt):
    R1 = np.asarray(rodrigues_to_matrix(jnp.asarray(rvec, jnp.float32)))
    R2 = np.asarray(rodrigues_to_matrix(jnp.asarray(rvec_gt, jnp.float32)))
    ang = np.degrees(np.arccos(np.clip((np.trace(R1.T @ R2) - 1) / 2, -1, 1)))
    return ang, np.linalg.norm(np.asarray(tvec) - tvec_gt)


def test_dlt_recovers_exact_pose(rng):
    for _ in range(5):
        obj, img, rvec_gt, tvec_gt = make_scene(rng)
        rvec, tvec = pnp.solve_pnp_dlt(
            jnp.asarray(obj, jnp.float32), jnp.asarray(img, jnp.float32), jnp.asarray(K, jnp.float32)
        )
        ang, trans = pose_errors(rvec, tvec, rvec_gt, tvec_gt)
        assert ang < 0.5, f"rotation error {ang} deg"
        assert trans < 0.01, f"translation error {trans} m"


def test_lm_refine_improves_noisy_init(rng):
    obj, img, rvec_gt, tvec_gt = make_scene(rng)
    rvec0 = jnp.asarray(rvec_gt + rng.normal(size=3) * 0.1, jnp.float32)
    tvec0 = jnp.asarray(tvec_gt + rng.normal(size=3) * 0.05, jnp.float32)
    rvec, tvec, cost = pnp.refine_pnp_lm(
        jnp.asarray(obj, jnp.float32),
        jnp.asarray(img, jnp.float32),
        jnp.asarray(K, jnp.float32),
        rvec0,
        tvec0,
        iters=25,
    )
    ang, trans = pose_errors(rvec, tvec, rvec_gt, tvec_gt)
    assert ang < 0.1
    assert trans < 2e-3
    assert float(cost) < 1e-3


def test_ransac_matches_cv2_with_outliers(rng):
    obj, img, rvec_gt, tvec_gt = make_scene(rng, noise_px=0.5)
    # Corrupt two observations badly.
    img_bad = img.copy()
    img_bad[1] += [300, -200]
    img_bad[5] += [-250, 180]

    result = pnp.solve_pnp_ransac(
        jnp.asarray(obj, jnp.float32),
        jnp.asarray(img_bad, jnp.float32),
        jnp.asarray(K, jnp.float32),
        key=jax.random.PRNGKey(3),
        n_hypotheses=64,
        inlier_threshold_px=6.0,
    )
    assert bool(result["success"])
    ang, trans = pose_errors(result["rvec"], result["tvec"], rvec_gt, tvec_gt)
    assert ang < 1.5
    assert trans < 0.03
    # The corrupted points must be flagged as outliers.
    mask = np.asarray(result["inlier_mask"])
    assert not mask[1] and not mask[5]

    # cv2 agreement on the same data.
    ok, rvec_cv, tvec_cv, _ = cv2.solvePnPRansac(
        obj, img_bad, K, np.zeros(5), flags=cv2.SOLVEPNP_EPNP
    )
    assert ok
    ang_cv, trans_cv = pose_errors(
        np.asarray(result["rvec"]), np.asarray(result["tvec"]), rvec_cv.ravel(), tvec_cv.ravel()
    )
    assert ang_cv < 2.0
    assert trans_cv < 0.05


def test_ransac_confidence_gate(rng):
    """Zero-weight points are excluded; <4 usable points => success=False."""
    obj, img, _, _ = make_scene(rng)
    weights = np.zeros(len(obj), dtype=np.float32)
    weights[:3] = 1.0  # only 3 usable points
    result = pnp.solve_pnp_ransac(
        jnp.asarray(obj, jnp.float32),
        jnp.asarray(img, jnp.float32),
        jnp.asarray(K, jnp.float32),
        weights=jnp.asarray(weights),
        key=jax.random.PRNGKey(0),
    )
    assert not bool(result["success"])


def test_triangulation_recovers_points(rng):
    # 4 cameras in a ring looking at the origin.
    obj = rng.uniform(-0.3, 0.3, size=(8, 3))
    projs = []
    pixels = []
    for i in range(4):
        rvec = np.array([0.1 * i, 0.6 * i, 0.05])
        tvec = np.array([0.1 * i - 0.2, 0.05, 1.8])
        P = np.asarray(
            tri.projection_matrix(
                jnp.asarray(rvec, jnp.float32), jnp.asarray(tvec, jnp.float32), jnp.asarray(K, jnp.float32)
            )
        )
        projs.append(P)
        px, _ = cv2.projectPoints(obj, rvec, tvec, K, np.zeros(5))
        pixels.append(px.reshape(-1, 2))
    projs = np.stack(projs)  # (V, 3, 4)
    pixels = np.stack(pixels)  # (V, J, 2)

    got = np.asarray(
        tri.triangulate_keypoints(jnp.asarray(pixels, jnp.float32), jnp.asarray(projs, jnp.float32))
    )
    np.testing.assert_allclose(got, obj, atol=1e-3)


def test_triangulation_view_mask(rng):
    """A garbage view with weight 0 must not affect the result."""
    obj = rng.uniform(-0.3, 0.3, size=(5, 3))
    projs, pixels = [], []
    for i in range(3):
        rvec = np.array([0.05 * i, 0.5 * i, 0.0])
        tvec = np.array([0.15 * i, 0.0, 2.0])
        P = np.asarray(
            tri.projection_matrix(
                jnp.asarray(rvec, jnp.float32), jnp.asarray(tvec, jnp.float32), jnp.asarray(K, jnp.float32)
            )
        )
        projs.append(P)
        px, _ = cv2.projectPoints(obj, rvec, tvec, K, np.zeros(5))
        pixels.append(px.reshape(-1, 2))
    # Add a dead view (all-zero pixels - the reference's dummy-view padding).
    projs.append(projs[0])
    pixels.append(np.zeros_like(pixels[0]))
    weights = np.array([1.0, 1.0, 1.0, 0.0], dtype=np.float32)

    got = np.asarray(
        tri.triangulate_keypoints(
            jnp.asarray(np.stack(pixels), jnp.float32),
            jnp.asarray(np.stack(projs), jnp.float32),
            jnp.asarray(weights),
        )
    )
    np.testing.assert_allclose(got, obj, atol=1e-3)


def test_solve_pnp_planar_four_points(rng):
    """Minimal planar case (4 coplanar points, e.g. an ArUco marker)."""
    h = 0.025
    obj = np.array([[-h, h, 0], [h, h, 0], [h, -h, 0], [-h, -h, 0]], dtype=np.float64)
    rvec_gt = np.array([0.25, -0.15, 0.05])
    tvec_gt = np.array([0.02, -0.03, 0.5])
    img, _ = cv2.projectPoints(obj, rvec_gt, tvec_gt, K, np.zeros(5))
    rvec, tvec, cost = pnp.solve_pnp(
        jnp.asarray(obj, jnp.float32), jnp.asarray(img.reshape(-1, 2), jnp.float32),
        jnp.asarray(K, jnp.float32),
    )
    ang, trans = pose_errors(rvec, tvec, rvec_gt, tvec_gt)
    assert float(cost) < 1e-2
    assert trans < 5e-3


def test_refine_lm_respects_zero_weights(rng):
    """Zero-weight points must not influence the refined pose."""
    obj, img, rvec_gt, tvec_gt = make_scene(rng)
    img_bad = img.copy()
    img_bad[0] += [500, 500]  # corrupted but weight 0
    w = np.ones(len(obj), np.float32)
    w[0] = 0.0
    rvec, tvec, cost = pnp.refine_pnp_lm(
        jnp.asarray(obj, jnp.float32), jnp.asarray(img_bad, jnp.float32),
        jnp.asarray(K, jnp.float32),
        jnp.asarray(rvec_gt + 0.05, jnp.float32), jnp.asarray(tvec_gt + 0.02, jnp.float32),
        weights=jnp.asarray(w), iters=25,
    )
    ang, trans = pose_errors(rvec, tvec, rvec_gt, tvec_gt)
    assert ang < 0.2 and trans < 5e-3


def test_planar_second_root_is_genuine_alternative():
    """The planar two-fold ambiguity: root 2 must be a DISTINCT proper
    rotation whose plane normal (camera frame) is the reflection of root 1's
    across the viewing ray to the plane origin. The old construction
    composed root 1 with a plane reflection - which fixes every in-plane
    point, so its projections were identical to root 1 and the SVD
    re-properization returned an arbitrary 180-degree flip."""
    from mvropose_tpu.geometry.pnp import solve_pnp_planar
    from mvropose_tpu.geometry.rotations import rodrigues_to_matrix

    rng = np.random.default_rng(7)
    # Planar object (z=0), tilted true pose.
    obj = np.concatenate(
        [rng.uniform(-0.2, 0.2, size=(8, 2)), np.zeros((8, 1))], axis=1
    ).astype(np.float32)
    rv_true = jnp.asarray([0.6, -0.3, 0.2])
    tv_true = jnp.asarray([0.05, -0.02, 0.9])
    K = jnp.asarray([[500.0, 0, 320.0], [0, 500.0, 240.0], [0, 0, 1.0]])
    img = project_points(jnp.asarray(obj), rv_true, tv_true, K, None)

    (rv1, tv1), (rv2, tv2) = solve_pnp_planar(jnp.asarray(obj), img, K)
    R1 = np.asarray(rodrigues_to_matrix(rv1))
    R2 = np.asarray(rodrigues_to_matrix(rv2))
    # Both proper rotations.
    for R in (R1, R2):
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        assert np.linalg.det(R) > 0.99
    # Root 1 recovers the exact pose on exact data.
    Rt = np.asarray(rodrigues_to_matrix(rv_true))
    ang1 = np.degrees(np.arccos(np.clip((np.trace(R1 @ Rt.T) - 1) / 2, -1, 1)))
    assert ang1 < 1.0, ang1
    # Root 2 is genuinely different (tilted plane -> the folds are distinct)...
    ang12 = np.degrees(np.arccos(np.clip((np.trace(R1 @ R2.T) - 1) / 2, -1, 1)))
    assert ang12 > 10.0, ang12
    # ...and its camera-frame plane normal is root 1's reflected across the
    # viewing ray to the plane origin.
    n_obj = np.array([0.0, 0.0, 1.0])
    n1 = R1 @ n_obj
    n2 = R2 @ n_obj
    v = np.asarray(tv1) / np.linalg.norm(np.asarray(tv1))
    n1_reflected = 2.0 * np.dot(n1, v) * v - n1
    align = abs(float(np.dot(n2, n1_reflected)))
    assert align > 0.99, align

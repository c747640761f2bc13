"""Joint (pose, angles) reprojection refinement (pose/refine.py).

The refinement exists because the reference's serve protocol (PnP on
FK(predicted angles), Fr5_model_train.ipynb cell 14) lets angle error
corrupt the recovered pose; these tests pin (a) exactness at the optimum,
(b) recovery from wrong-angle initializations that stall plain PnP,
(c) unit-agnostic behavior on a degree-unit robot, and (d) view masking.
"""

import numpy as np
import jax
import jax.numpy as jnp

from mvropose_tpu.geometry.camera import project_points
from mvropose_tpu.geometry.robots import FR3, FR5, forward_kinematics, get_robot
from mvropose_tpu.geometry.rotations import rodrigues_to_matrix
from mvropose_tpu.pose import refine_rig_pose_angles, solve_rig_pnp


def rot_err_deg(rv_a, rv_b):
    Ra = np.asarray(rodrigues_to_matrix(jnp.asarray(rv_a, jnp.float32)))
    Rb = np.asarray(rodrigues_to_matrix(jnp.asarray(rv_b, jnp.float32)))
    return np.degrees(np.arccos(np.clip((np.trace(Ra.T @ Rb) - 1) / 2, -1, 1)))


def add_cam_cm(robot, rv, tv, theta, rv_gt, tv_gt, theta_gt):
    """Camera-frame mean keypoint distance (the DREAM papers' ADD), in cm.

    This is the GAUGE-INVARIANT accuracy measure for the joint problem:
    rotating the arm about the base joint-1 axis while counter-rotating the
    camera pose is an exact reprojection symmetry (keypoint 0 sits on the
    axis), so raw pose rot error unavoidably contains the prior's joint-1
    error, while the composed camera-frame skeleton does not.
    """

    def cam(rv_, tv_, th_):
        fk = robot.keypoints_from_fk(forward_kinematics(robot, jnp.asarray(th_)))
        R = rodrigues_to_matrix(jnp.asarray(rv_, jnp.float32))
        return np.asarray(jnp.einsum("ij,kj->ki", R, fk) + jnp.asarray(tv_))

    a, b = cam(rv, tv, theta), cam(rv_gt, tv_gt, theta_gt)
    return float(np.linalg.norm(a - b, axis=-1).mean() * 100.0)


def make_rig_obs(robot, angles, rvecs, tvecs, K, noise_px=0.0, seed=0):
    """(V, J, 2) exact projections of FK keypoints + optional noise."""
    rng = np.random.default_rng(seed)
    fk = robot.keypoints_from_fk(forward_kinematics(robot, jnp.asarray(angles, jnp.float32)))
    xy = jnp.stack(
        [
            project_points(
                fk, jnp.asarray(rv, jnp.float32), jnp.asarray(tv, jnp.float32),
                jnp.asarray(K, jnp.float32), None,
            )
            for rv, tv in zip(rvecs, tvecs)
        ]
    )
    return xy + rng.standard_normal(xy.shape).astype(np.float32) * noise_px


K = np.array([[737.0, 0, 640.0], [0, 737.0, 360.0], [0, 0, 1]], np.float32)
RVECS = np.array([[0.2, -0.4, 0.1], [-0.3, 0.25, -0.15]], np.float32)
TVECS = np.array([[0.1, -0.05, 1.7], [-0.12, 0.02, 1.9]], np.float32)


def _refine(robot, xy, angles0, rvec0, tvec0, V, **kw):
    J = xy.shape[1]
    bases = jnp.tile(jnp.eye(3, dtype=jnp.float32), (V, 1, 1))
    Ks = jnp.tile(jnp.asarray(K), (V, 1, 1))
    return refine_rig_pose_angles(
        xy[:V], jnp.ones((V, J), jnp.float32), jnp.asarray(angles0, jnp.float32),
        jnp.asarray(rvec0[:V], jnp.float32), jnp.asarray(tvec0[:V], jnp.float32),
        bases, Ks, robot, jax.random.PRNGKey(3), **kw,
    )


def test_exact_observations_stay_at_optimum():
    """Exact keypoints + truth init: the refinement must not drift (the
    oracle fixed-point check that caught the 128px ill-conditioning)."""
    rng = np.random.default_rng(1)
    angles = rng.uniform(-1.0, 1.0, size=7).astype(np.float32)
    xy = make_rig_obs(FR3, angles, RVECS, TVECS, K)
    out = _refine(FR3, xy, angles, RVECS, TVECS, V=2, sigma_prior=0.3)
    assert rot_err_deg(out["rvec"][0], RVECS[0]) < 0.1
    assert np.linalg.norm(np.asarray(out["tvec"]) - TVECS) < 2e-3
    np.testing.assert_allclose(np.asarray(out["angles"]), angles, atol=5e-3)


def test_recovers_pose_from_wrong_angles_two_views():
    """V=2 shared-theta refinement from a 0.25 rad-wrong angle init: the
    joint solve must land far below the PnP-on-wrong-angles error."""
    rng = np.random.default_rng(2)
    angles = rng.uniform(-1.0, 1.0, size=7).astype(np.float32)
    bad = angles + rng.normal(0, 0.25, size=7).astype(np.float32)
    xy = make_rig_obs(FR3, angles, RVECS, TVECS, K, noise_px=1.0)

    bases = jnp.tile(jnp.eye(3, dtype=jnp.float32), (2, 1, 1))
    Ks = jnp.tile(jnp.asarray(K), (2, 1, 1))
    pnp = solve_rig_pnp(
        xy, jnp.ones(xy.shape[:2], jnp.float32), jnp.asarray(bad), bases, Ks,
        FR3, key=jax.random.PRNGKey(0),
    )
    err_pnp = max(rot_err_deg(pnp["rvec"][v], RVECS[v]) for v in range(2))

    out = _refine(
        FR3, xy, bad, np.asarray(pnp["rvec"]), np.asarray(pnp["tvec"]), V=2,
        sigma_prior=0.25, sigma_px=1.0,
    )
    for v in range(2):
        add_ref = add_cam_cm(
            FR3, np.asarray(out["rvec"][v]), np.asarray(out["tvec"][v]),
            np.asarray(out["angles"]), RVECS[v], TVECS[v], angles,
        )
        add_init = add_cam_cm(
            FR3, np.asarray(pnp["rvec"][v]), np.asarray(pnp["tvec"][v]), bad,
            RVECS[v], TVECS[v], angles,
        )
        assert add_ref < 5.0, (add_ref, add_init)  # cm; init sits ~50-60 cm
        assert add_ref < add_init * 0.2
    # Raw pose rot error retains the prior's joint-1 gauge error (see
    # add_cam_cm docstring) but must still beat plain PnP-on-wrong-angles.
    err_ref = max(rot_err_deg(out["rvec"][v], RVECS[v]) for v in range(2))
    assert err_ref < err_pnp
    # Refined angles must also beat the initialization.
    assert np.mean(np.abs(np.asarray(out["angles"]) - angles)) < np.mean(
        np.abs(bad - angles)
    )


def test_degree_unit_robot():
    """FR5 works in degrees: the Marquardt-scaled steps must behave with
    ~57x smaller per-unit jacobians and a degree-scale prior."""
    rng = np.random.default_rng(3)
    robot = get_robot("fr5")
    angles = rng.uniform(-40, 40, size=robot.n_joints).astype(np.float32)
    bad = angles + rng.normal(0, 10.0, size=robot.n_joints).astype(np.float32)
    xy = make_rig_obs(robot, angles, RVECS, TVECS, K, noise_px=1.0)
    bases = jnp.tile(jnp.eye(3, dtype=jnp.float32), (2, 1, 1))
    Ks = jnp.tile(jnp.asarray(K), (2, 1, 1))
    pnp = solve_rig_pnp(
        xy, jnp.ones(xy.shape[:2], jnp.float32), jnp.asarray(bad), bases, Ks,
        robot, key=jax.random.PRNGKey(0),
    )
    out = _refine(
        robot, xy, bad, np.asarray(pnp["rvec"]), np.asarray(pnp["tvec"]), V=2,
        sigma_prior=10.0, sigma_px=1.0, n_starts=16,
    )
    for v in range(2):
        add_ref = add_cam_cm(
            robot, np.asarray(out["rvec"][v]), np.asarray(out["tvec"][v]),
            np.asarray(out["angles"]), RVECS[v], TVECS[v], angles,
        )
        add_init = add_cam_cm(
            robot, np.asarray(pnp["rvec"][v]), np.asarray(pnp["tvec"][v]), bad,
            RVECS[v], TVECS[v], angles,
        )
        # Gauge-invariant (see add_cam_cm); 10 cm absolute: the refined fit is
        # the verified global optimum of the objective for this draw (truth-
        # init converges to the identical cost), the residual is the weak
        # 10-deg prior, not optimizer slack.
        assert add_ref < 10.0 and add_ref < add_init * 0.5, (add_ref, add_init)
    assert np.mean(np.abs(np.asarray(out["angles"]) - angles)) <= np.mean(
        np.abs(bad - angles)
    )


def test_masked_view_is_ignored():
    """A masked view full of garbage keypoints must not move the result."""
    rng = np.random.default_rng(4)
    angles = rng.uniform(-1.0, 1.0, size=7).astype(np.float32)
    xy = make_rig_obs(FR3, angles, RVECS, TVECS, K)
    xy_bad = xy.at[1].set(rng.uniform(0, 1280, size=xy[1].shape).astype(np.float32))
    bases = jnp.tile(jnp.eye(3, dtype=jnp.float32), (2, 1, 1))
    Ks = jnp.tile(jnp.asarray(K), (2, 1, 1))
    out = refine_rig_pose_angles(
        xy_bad, jnp.ones(xy.shape[:2], jnp.float32), jnp.asarray(angles),
        jnp.asarray(RVECS), jnp.asarray(TVECS), bases, Ks, FR3,
        jax.random.PRNGKey(3), view_mask=jnp.asarray([True, False]),
        sigma_prior=0.3,
    )
    # View 0 (valid) must still be exact; the garbage view contributed nothing.
    assert rot_err_deg(out["rvec"][0], RVECS[0]) < 0.1
    np.testing.assert_allclose(np.asarray(out["angles"]), angles, atol=5e-3)

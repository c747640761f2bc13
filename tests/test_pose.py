"""Serve path: synthetic GT -> heatmaps -> recovered pose."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvropose_tpu.geometry.robots import FR3, forward_kinematics
from mvropose_tpu.geometry.camera import project_points
from mvropose_tpu.geometry.heatmap import render_heatmaps
from mvropose_tpu.geometry.rotations import rodrigues_to_matrix
from mvropose_tpu.pose import (
    recover_pose_single_view,
    recover_pose_multiview,
)

K = np.array([[737.0, 0, 640.0], [0, 737.0, 360.0], [0, 0, 1]], dtype=np.float64)
IMG_HW = (720, 1280)
HM = 128


def make_view(angles, rvec, tvec, peak_logit=6.0, drop_joints=()):
    """Render synthetic heatmaps whose peaks sit at the true projections."""
    pts = forward_kinematics(FR3, jnp.asarray(angles, jnp.float32))
    px = np.asarray(
        project_points(
            pts, jnp.asarray(rvec, jnp.float32), jnp.asarray(tvec, jnp.float32),
            jnp.asarray(K, jnp.float32), None,
        )
    )
    kp_hm = px * np.array([HM / IMG_HW[1], HM / IMG_HW[0]])
    maps = np.asarray(render_heatmaps(jnp.asarray(kp_hm, jnp.float32), HM, HM, sigma=2.0))
    maps = maps * peak_logit - 3.0  # logits: peak ~ +3, background ~ -3
    for j in drop_joints:
        maps[j] = -3.0  # low-confidence everywhere
    return jnp.asarray(maps), px


def test_single_view_recovery():
    rng = np.random.default_rng(0)
    angles = rng.uniform(-1.2, 1.2, size=7)
    rvec = np.array([0.2, -0.4, 0.1])
    tvec = np.array([0.1, -0.05, 1.7])
    heatmaps, px = make_view(angles, rvec, tvec)

    res = recover_pose_single_view(
        heatmaps, jnp.asarray(angles, jnp.float32), FR3, K, IMG_HW, view=None,
        key=jax.random.PRNGKey(1),
    )
    assert res.success
    # Heatmap quantization limits accuracy to ~ a heatmap cell (10px in
    # image space here).
    R1 = np.asarray(rodrigues_to_matrix(jnp.asarray(res.rvec, jnp.float32)))
    R2 = np.asarray(rodrigues_to_matrix(jnp.asarray(rvec, jnp.float32)))
    ang = np.degrees(np.arccos(np.clip((np.trace(R1.T @ R2) - 1) / 2, -1, 1)))
    assert ang < 5.0
    assert np.linalg.norm(res.tvec - tvec) < 0.12


def test_single_view_fallback_on_low_confidence():
    rng = np.random.default_rng(1)
    angles = rng.uniform(-1.0, 1.0, size=7)
    rvec = np.array([0.1, 0.2, -0.1])
    tvec = np.array([0.0, 0.0, 1.5])
    # Drop all but 3 joints below the confidence gate -> PnP must refuse.
    heatmaps, _ = make_view(angles, rvec, tvec, drop_joints=(0, 1, 2, 3, 4))

    fb = (np.array([9.0, 9.0, 9.0]), np.array([9.0, 9.0, 9.0]))
    res = recover_pose_single_view(
        heatmaps, jnp.asarray(angles, jnp.float32), FR3, K, IMG_HW,
        fallback_extrinsic=fb, key=jax.random.PRNGKey(0),
    )
    assert not res.success
    assert res.used_fallback
    np.testing.assert_array_equal(res.rvec, fb[0])


def test_multiview_triangulation_recovery():
    rng = np.random.default_rng(2)
    angles = rng.uniform(-1.0, 1.0, size=7)
    pts_world = np.asarray(forward_kinematics(FR3, jnp.asarray(angles, jnp.float32)))

    rvecs, tvecs, maps = [], [], []
    for i in range(4):
        rvec = np.array([0.1 * i, 0.5 * i - 0.7, 0.05])
        tvec = np.array([0.2 * i - 0.3, 0.05, 1.9])
        hm, _ = make_view(angles, rvec, tvec)
        rvecs.append(rvec)
        tvecs.append(tvec)
        maps.append(np.asarray(hm))

    pts3d, obs = recover_pose_multiview(
        jnp.asarray(np.stack(maps)),
        jnp.ones(4, dtype=bool),
        jnp.asarray(np.stack(rvecs), jnp.float32),
        jnp.asarray(np.stack(tvecs), jnp.float32),
        jnp.asarray(np.stack([K] * 4), jnp.float32),
        IMG_HW,
    )
    assert np.asarray(obs).sum() >= 6
    err = np.linalg.norm(np.asarray(pts3d) - pts_world, axis=-1)
    # Heatmap-cell quantization (~10px) at ~1.9m depth -> ~2-3cm.
    assert np.median(err[np.asarray(obs) > 0]) < 0.05


def test_recover_pose_batch_jitted():
    """Whole-rig jitted pose recovery: per-camera poses in one call."""
    from mvropose_tpu.pose import recover_pose_batch

    rng = np.random.default_rng(5)
    angles = rng.uniform(-1.0, 1.0, size=7)
    rvecs, tvecs, maps = [], [], []
    for i in range(3):
        rvec = np.array([0.15 * i, 0.4 * i - 0.5, 0.02])
        tvec = np.array([0.15 * i - 0.2, 0.03, 1.8])
        hm, _ = make_view(angles, rvec, tvec)
        rvecs.append(rvec); tvecs.append(tvec); maps.append(np.asarray(hm))

    out = recover_pose_batch(
        jnp.asarray(np.stack(maps)),
        jnp.asarray(angles, jnp.float32),
        jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (3, 1, 1))),
        jnp.asarray(np.stack([K] * 3), jnp.float32),
        FR3,
        IMG_HW,
        key=jax.random.PRNGKey(0),
        n_hypotheses=32,
    )
    assert out["rvec"].shape == (3, 3)
    assert bool(np.asarray(out["success"]).all())
    for i in range(3):
        t_err = np.linalg.norm(np.asarray(out["tvec"][i]) - tvecs[i])
        assert t_err < 0.12, (i, t_err)


def test_pose_error_metrics_math():
    """pose_rotation_err_deg / pose_translation_err_m: exact closed-form cases."""
    from mvropose_tpu.train.metrics import pose_rotation_err_deg, pose_translation_err_m

    rv = jnp.asarray([[0.3, -0.2, 0.5], [0.0, 0.0, 0.0]], jnp.float32)
    # Identical rotations -> 0 deg.
    np.testing.assert_allclose(np.asarray(pose_rotation_err_deg(rv, rv)), 0.0, atol=1e-3)
    # A pure 30-deg z-rotation vs identity -> exactly 30 deg.
    rz = jnp.asarray([0.0, 0.0, np.radians(30.0)], jnp.float32)
    err = float(pose_rotation_err_deg(rz, jnp.zeros(3, jnp.float32)))
    assert abs(err - 30.0) < 1e-3
    t1 = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    t2 = jnp.asarray([[0.3, 0.4, 1.0]], jnp.float32)
    np.testing.assert_allclose(np.asarray(pose_translation_err_m(t1, t2)), 0.5, atol=1e-6)


def test_pose_error_metrics_on_perfect_heatmaps():
    """End-to-end 6D pose-recovery error on exact GT heatmaps + GT angles:
    the full decode -> FK -> RANSAC-PnP path must land within heatmap-cell
    quantization of the true camera pose (the quantified version of the
    reference's eyeballed reprojection overlays, Fr5_model_train.ipynb
    cell 14)."""
    from mvropose_tpu.pose import recover_pose_batch
    from mvropose_tpu.train.metrics import pose_rotation_err_deg, pose_translation_err_m

    rng = np.random.default_rng(11)
    angles = rng.uniform(-1.0, 1.0, size=7)
    rvecs, tvecs, maps = [], [], []
    for i in range(3):
        rvec = np.array([0.15 * i - 0.1, 0.4 * i - 0.5, 0.02])
        tvec = np.array([0.15 * i - 0.2, 0.03, 1.8])
        hm, _ = make_view(angles, rvec, tvec)
        rvecs.append(rvec); tvecs.append(tvec); maps.append(np.asarray(hm))

    def recover(decode_mode):
        out = recover_pose_batch(
            jnp.asarray(np.stack(maps)),
            jnp.asarray(angles, jnp.float32),
            jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (3, 1, 1))),
            jnp.asarray(np.stack([K] * 3), jnp.float32),
            FR3,
            IMG_HW,
            key=jax.random.PRNGKey(3),
            n_hypotheses=32,
            decode_mode=decode_mode,
        )
        assert bool(np.asarray(out["success"]).all())
        rot = np.asarray(
            pose_rotation_err_deg(out["rvec"], jnp.asarray(np.stack(rvecs), jnp.float32))
        )
        trans = np.asarray(
            pose_translation_err_m(out["tvec"], jnp.asarray(np.stack(tvecs), jnp.float32))
        )
        assert rot.shape == (3,) and trans.shape == (3,)
        return rot, trans

    # Hard argmax (reference parity): bounded by the 10-image-px heatmap-cell
    # quantization at 1.8 m depth.
    rot_err, trans_err = recover("argmax")
    assert rot_err.max() < 6.0, rot_err
    assert trans_err.max() < 0.2, trans_err
    # Peak-refined subpixel decode: substantially tighter on exact heatmaps.
    rot_ref, trans_ref = recover("refine")
    assert rot_ref.max() < 2.0, rot_ref
    assert trans_ref.max() < 0.06, trans_ref
    assert trans_ref.mean() < trans_err.mean()  # refinement strictly helps here


def test_triangulated_frame_is_base_rotated_fk():
    """The eval's triangulated-ADD frame fix, as geometry: GT keypoints are
    projected through base_rotation @ FK (data/dataset.py gt_keypoints), so
    points triangulated back from those views live in the BASE-ROTATED FK
    frame - comparing against raw FK (the round-1 bug) reports ~0.5 m of
    garbage while fk @ base.T matches at centimeter level."""
    rng = np.random.default_rng(5)
    angles = rng.uniform(-1.0, 1.0, size=7)
    fk = np.asarray(forward_kinematics(FR3, jnp.asarray(angles, jnp.float32)))
    base = np.asarray(FR3.base_rotation("view1"))
    pts_world = fk @ base.T  # rows: base @ p (the ArUco world frame)

    rvecs, tvecs, maps = [], [], []
    for i in range(4):
        rvec = np.array([0.1 * i, 0.5 * i - 0.7, 0.05])
        tvec = np.array([0.2 * i - 0.3, 0.05, 1.9])
        px = np.asarray(
            project_points(
                jnp.asarray(pts_world, jnp.float32),
                jnp.asarray(rvec, jnp.float32), jnp.asarray(tvec, jnp.float32),
                jnp.asarray(K, jnp.float32), None,
            )
        )
        kp_hm = px * np.array([HM / IMG_HW[1], HM / IMG_HW[0]])
        hm = np.asarray(render_heatmaps(jnp.asarray(kp_hm, jnp.float32), HM, HM, sigma=2.0))
        maps.append(hm * 6.0 - 3.0)
        rvecs.append(rvec)
        tvecs.append(tvec)

    pts3d, obs = recover_pose_multiview(
        jnp.asarray(np.stack(maps), jnp.float32),
        jnp.ones(4, dtype=bool),
        jnp.asarray(np.stack(rvecs), jnp.float32),
        jnp.asarray(np.stack(tvecs), jnp.float32),
        jnp.asarray(np.stack([K] * 4), jnp.float32),
        IMG_HW,
    )
    got = np.asarray(pts3d)
    ob = np.asarray(obs) > 0
    assert ob.sum() >= 6
    err_rotated = np.linalg.norm(got - pts_world, axis=-1)[ob]
    err_raw_fk = np.linalg.norm(got - fk, axis=-1)[ob]
    assert np.median(err_rotated) < 0.05       # correct frame: cm-level
    assert np.median(err_raw_fk) > 5 * np.median(err_rotated)  # the bug's frame


def test_recovery_with_keypoint_fk_subset():
    """DREAM-style keypoint sets (7 named links, 8-origin chain): the PnP
    path must pair heatmap channel k with FK origin keypoint_fk_indices[k]
    (the 7-vs-8 shape mismatch this guards regressed cli eval --robot dream)."""
    from mvropose_tpu.geometry.robots import DREAM_PANDA
    from mvropose_tpu.pose import recover_pose_single_view

    assert DREAM_PANDA.n_keypoints == 7
    rng = np.random.default_rng(3)
    angles = rng.uniform(-1.0, 1.0, size=7)
    rvec = np.array([0.15, -0.3, 0.05])
    tvec = np.array([0.05, -0.1, 1.6])

    pts = DREAM_PANDA.keypoints_from_fk(
        forward_kinematics(DREAM_PANDA, jnp.asarray(angles, jnp.float32))
    )
    assert pts.shape == (7, 3)
    px = np.asarray(
        project_points(
            pts, jnp.asarray(rvec, jnp.float32), jnp.asarray(tvec, jnp.float32),
            jnp.asarray(K, jnp.float32), None,
        )
    )
    kp_hm = px * np.array([HM / IMG_HW[1], HM / IMG_HW[0]])
    maps = np.asarray(render_heatmaps(jnp.asarray(kp_hm, jnp.float32), HM, HM, sigma=2.0))
    heatmaps = jnp.asarray(maps * 6.0 - 3.0)

    res = recover_pose_single_view(
        heatmaps, jnp.asarray(angles, jnp.float32), DREAM_PANDA, K, IMG_HW,
        view=None, key=jax.random.PRNGKey(1),
    )
    assert res.success
    R_rec = np.asarray(rodrigues_to_matrix(jnp.asarray(res.rvec, jnp.float32)))
    R_gt = np.asarray(rodrigues_to_matrix(jnp.asarray(rvec, jnp.float32)))
    ang_err = np.degrees(
        np.arccos(np.clip((np.trace(R_rec @ R_gt.T) - 1) / 2, -1, 1))
    )
    # link6/link7 origins coincide exactly (6 distinct points effectively);
    # decode quantization at 128px heatmaps bounds accuracy, not the pairing.
    assert ang_err < 8.0, ang_err
    assert np.linalg.norm(res.tvec - tvec) < 0.15


def test_kabsch_gt_pose_matches_pnp_frame():
    """The eval's GT-pose-by-alignment path (DREAM: no extrinsic shipped,
    camera-frame 3D keypoints stored): kabsch(FK(gt angles) -> stored points)
    must live in the SAME frame the PnP serve path solves in, so that
    pose_rotation_err between them is ~decode noise, not a convention
    mismatch."""
    from mvropose_tpu.geometry.robots import DREAM_PANDA
    from mvropose_tpu.geometry.rotations import kabsch, matrix_to_rodrigues
    from mvropose_tpu.pose import recover_pose_single_view

    rng = np.random.default_rng(11)
    angles = rng.uniform(-1.0, 1.0, size=7).astype(np.float32)
    rvec = np.array([0.2, -0.25, 0.1], np.float32)
    tvec = np.array([0.0, -0.05, 1.5], np.float32)
    R_true = np.asarray(rodrigues_to_matrix(jnp.asarray(rvec)))

    fk_kp = DREAM_PANDA.keypoints_from_fk(
        forward_kinematics(DREAM_PANDA, jnp.asarray(angles))
    )  # (7, 3) base frame
    loc_cam = np.asarray(fk_kp) @ R_true.T + tvec  # what DREAM stores

    # 1) Alignment-GT is exact.
    R_hat, t_hat = kabsch(fk_kp, jnp.asarray(loc_cam))
    np.testing.assert_allclose(np.asarray(R_hat), R_true, atol=1e-4)
    np.testing.assert_allclose(np.asarray(t_hat), tvec, atol=1e-4)
    rv_gt = np.asarray(matrix_to_rodrigues(R_hat))

    # 2) PnP on perfect heatmaps recovers a pose in the same frame: the
    #    geodesic error vs the alignment-GT is decode-quantization small.
    px = np.asarray(
        project_points(
            fk_kp, jnp.asarray(rvec), jnp.asarray(tvec), jnp.asarray(K, jnp.float32), None
        )
    )
    kp_hm = px * np.array([HM / IMG_HW[1], HM / IMG_HW[0]])
    maps = np.asarray(render_heatmaps(jnp.asarray(kp_hm, jnp.float32), HM, HM, sigma=2.0))
    res = recover_pose_single_view(
        jnp.asarray(maps * 6.0 - 3.0), jnp.asarray(angles), DREAM_PANDA, K, IMG_HW,
        view=None, key=jax.random.PRNGKey(0),
    )
    assert res.success
    R_pnp = np.asarray(rodrigues_to_matrix(jnp.asarray(res.rvec, jnp.float32)))
    R_gt = np.asarray(rodrigues_to_matrix(jnp.asarray(rv_gt, jnp.float32)))
    ang_err = np.degrees(np.arccos(np.clip((np.trace(R_pnp @ R_gt.T) - 1) / 2, -1, 1)))
    assert ang_err < 8.0, ang_err
    assert np.linalg.norm(res.tvec - np.asarray(t_hat)) < 0.15


def test_pnp_add_frame_with_nonidentity_base_rotation():
    """Eval's PnP-ADD transform and Kabsch GT must use the SAME object
    points PnP solves against: base-rotated FK. With a non-identity
    per-view base rotation (e.g. FR3's zyx 90/180/0), transforming
    UN-rotated FK through the recovered pose reports a large constant
    frame-mismatch 'error' on perfect data; base-rotated FK reports ~0.
    Pins cli eval's pose_errors/Kabsch frame handling for any future
    kp3d-carrying dataset with base corrections (dream_panda's is
    identity, so the CLI path alone cannot catch this)."""
    from mvropose_tpu.decode import decode_keypoints
    from mvropose_tpu.geometry.rotations import kabsch
    from mvropose_tpu.pose import solve_rig_pnp

    base = np.asarray(FR3.base_rotation("view1"), np.float32)  # non-identity
    assert not np.allclose(base, np.eye(3), atol=1e-6)
    angles = jnp.asarray([0.3, -0.4, 0.25, -1.2, 0.5, 1.1, -0.3], jnp.float32)
    fk_kp = np.asarray(forward_kinematics(FR3, angles))  # (8, 3) base frame
    fk_obj = fk_kp @ base.T  # the object points PnP solves against

    rvec = jnp.asarray([0.15, -0.2, 0.1], jnp.float32)
    tvec = jnp.asarray([0.02, -0.05, 1.4], jnp.float32)
    R_cam = np.asarray(rodrigues_to_matrix(rvec))
    loc_cam = fk_obj @ R_cam.T + np.asarray(tvec)  # camera-frame GT points

    # Perfect heatmaps rendered from the projections of the SAME chain.
    px = np.asarray(
        project_points(jnp.asarray(fk_obj), rvec, tvec, jnp.asarray(K, jnp.float32), None)
    )
    kp_hm = px * np.array([HM / IMG_HW[1], HM / IMG_HW[0]])
    maps = render_heatmaps(jnp.asarray(kp_hm, jnp.float32), HM, HM, sigma=2.0) * 6.0 - 3.0

    xy, conf = decode_keypoints(maps[None], image_hw=IMG_HW, mode="refine")
    out = solve_rig_pnp(
        xy, conf, angles, jnp.asarray(base)[None], jnp.asarray(K, jnp.float32)[None],
        FR3, key=jax.random.PRNGKey(5),
    )
    assert bool(out["success"][0])
    Rp = np.asarray(rodrigues_to_matrix(out["rvec"][0]))
    tp = np.asarray(out["tvec"][0])

    add_rotated = np.linalg.norm(fk_obj @ Rp.T + tp - loc_cam, axis=-1).mean()
    add_unrotated = np.linalg.norm(fk_kp @ Rp.T + tp - loc_cam, axis=-1).mean()
    assert add_rotated < 0.02, add_rotated  # decode-noise floor
    assert add_unrotated > 0.2, add_unrotated  # frame mismatch, the old bug

    # Kabsch GT on base-rotated FK lands in the recovered pose's frame.
    R_gt, t_gt = kabsch(jnp.asarray(fk_obj), jnp.asarray(loc_cam))
    ang = np.degrees(np.arccos(np.clip(
        (np.trace(Rp @ np.asarray(R_gt).T) - 1) / 2, -1, 1)))
    assert ang < 3.0, ang
    assert np.linalg.norm(tp - np.asarray(t_gt)) < 0.05

"""Calibration layer: conf parsing (against the real checked-in SN conf
values), ArUco averaging, registry assembly."""

import json
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from mvropose_tpu.calib import (
    load_zed_intrinsics,
    load_stereo_params,
    average_marker_detections,
    compute_view_pose,
    stereo_right_from_left,
    load_rig,
)

CONF_TEXT = """\
[LEFT_CAM_FHD]
cx = 974.584
cy = 612.68
fx = 737.118
fy = 737.085
k1 = -0.005643106304680097
k2 = -0.04613633865985787
k3 = 0.014788022640489918
p1 = 0.00013427180750958065
p2 = 0.000311206091784389

[RIGHT_CAM_FHD]
cx = 960.0
cy = 600.0
fx = 700.0
fy = 700.0
k1 = 0.001
k2 = 0.002
k3 = 0.003
p1 = 0.0001
p2 = 0.0002

[LEFT_CAM_FHD1200]
cx = 974.584
cy = 552.68
fx = 737.118
fy = 737.085
k1 = -0.005643106304680097
k2 = -0.04613633865985787
k3 = 0.014788022640489918
p1 = 0.00013427180750958065
p2 = 0.000311206091784389

[STEREO]
Baseline = 119.847
TY = 0.01
TZ = -0.02
RX_FHD1200 = 0.001
CV_FHD1200 = 0.002
RZ_FHD1200 = 0.003
"""


@pytest.fixture
def conf_file(tmp_path):
    p = tmp_path / "SN41182735.conf"
    p.write_text(CONF_TEXT)
    return p


def test_load_intrinsics_fhd(conf_file):
    intr = load_zed_intrinsics(conf_file, "LEFT", "FHD")
    assert intr.camera_matrix[0, 0] == 737.118
    assert intr.camera_matrix[1, 2] == 612.68
    # Coefficient order is (k1, k2, p1, p2, k3) - the cv2/reference order.
    np.testing.assert_allclose(
        intr.distortion_coeffs,
        [-0.005643106304680097, -0.04613633865985787, 0.00013427180750958065,
         0.000311206091784389, 0.014788022640489918],
    )


def test_load_intrinsics_fhd1200_and_right(conf_file):
    left1200 = load_zed_intrinsics(conf_file, "LEFT", "FHD1200")
    assert left1200.camera_matrix[1, 2] == 552.68  # cy differs from FHD
    right = load_zed_intrinsics(conf_file, "RIGHT", "FHD")
    assert right.camera_matrix[0, 0] == 700.0


def test_load_stereo(conf_file):
    s = load_stereo_params(conf_file, "FHD1200")
    assert s["baseline"] == 119.847
    assert s["rz"] == 0.003


def test_average_marker_detections_outlier_rejection(rng):
    base_q = R.from_rotvec([0.2, -0.1, 0.4])
    dets = []
    for i in range(10):
        q = (base_q * R.from_rotvec(rng.normal(size=3) * 0.002)).as_quat()
        dets.append(
            {
                "position_m": {"x": 1.0 + rng.normal() * 1e-4, "y": 2.0, "z": 3.0},
                "rotation_quat": {"x": q[0], "y": q[1], "z": q[2], "w": q[3]},
            }
        )
    # One outlier rotation: ~5.7 deg off, which drags the initial chordal
    # mean by only ~0.5 deg, so the 1-deg gate keeps all 10 good detections
    # while rejecting the outlier (same failure-mode the reference gate has
    # with very large outliers - the initial mean includes them).
    q_bad = (base_q * R.from_rotvec([0.1, 0, 0])).as_quat()
    dets.append(
        {
            "position_m": {"x": 5.0, "y": 5.0, "z": 5.0},
            "rotation_quat": {"x": q_bad[0], "y": q_bad[1], "z": q_bad[2], "w": q_bad[3]},
        }
    )
    avg = average_marker_detections(dets, angular_outlier_deg=1.0)
    assert avg["n_used"] == 10 and avg["n_total"] == 11
    assert abs(avg["position_m"]["x"] - 1.0) < 1e-3  # outlier position excluded
    q_avg = np.array([avg["rotation_quat"][k] for k in "xyzw"])
    ang = (base_q.inv() * R.from_quat(q_avg)).magnitude()
    assert ang < 0.01


def test_average_marker_detections_requires_two():
    assert average_marker_detections([{"position_m": {}, "rotation_quat": {}}]) is None


def test_compute_view_pose_offsets():
    # Two markers whose offset-corrected positions coincide: mean = that point.
    q = R.identity().as_quat()
    poses = {
        "1": {
            "position_m": {"x": 1.0, "y": 0.0, "z": 2.0},
            "rotation_quat": {"x": q[0], "y": q[1], "z": q[2], "w": q[3]},
        },
        "2": {
            "position_m": {"x": 0.8, "y": 0.0, "z": 2.0},
            "rotation_quat": {"x": q[0], "y": q[1], "z": q[2], "w": q[3]},
        },
        "99": {  # no offset defined -> ignored
            "position_m": {"x": 9.0, "y": 9.0, "z": 9.0},
            "rotation_quat": {"x": q[0], "y": q[1], "z": q[2], "w": q[3]},
        },
    }
    offsets = {"1": np.array([-0.1, 0.0, 0.0]), "2": np.array([0.1, 0.0, 0.0])}
    out = compute_view_pose(poses, offsets)
    assert out["n_markers"] == 2
    np.testing.assert_allclose(out["tvec"], [0.9, 0.0, 2.0], atol=1e-6)
    np.testing.assert_allclose(out["rvec"], [0, 0, 0], atol=1e-6)


def test_stereo_right_from_left():
    stereo = {"baseline": 120.0, "ty": 0.0, "tz": 0.0, "rx": 0.0, "ry": 0.0, "rz": 0.0}
    rvec_l = np.zeros(3)
    tvec_l = np.array([0.1, 0.2, 1.5])
    rvec_r, tvec_r = stereo_right_from_left(rvec_l, tvec_l, stereo)
    np.testing.assert_allclose(rvec_r, 0, atol=1e-6)
    np.testing.assert_allclose(tvec_r, [0.1 - 0.120, 0.2, 1.5], atol=1e-6)


def _reference_stereo_transfer(rvec_l, tvec_l, stereo):
    """Verbatim scipy/numpy transcription of the reference stage-3 math
    (Meca_insertion_preprocessing.py:327-346), used as the golden oracle."""
    import cv2

    R_marker_in_left, _ = cv2.Rodrigues(np.asarray(rvec_l, np.float64))
    T_marker_to_left = np.eye(4)
    T_marker_to_left[:3, :3], T_marker_to_left[:3, 3] = R_marker_in_left, tvec_l
    t_right_in_left = np.array(
        [p / 1000.0 for p in [stereo["baseline"], stereo["ty"], stereo["tz"]]]
    )
    R_right_in_left = R.from_euler(
        "zyx", [stereo["rz"], stereo["ry"], stereo["rx"]]
    ).as_matrix()
    T_right_to_left = np.eye(4)
    T_right_to_left[:3, :3], T_right_to_left[:3, 3] = R_right_in_left, t_right_in_left
    T_left_to_right = np.linalg.inv(T_right_to_left)
    T_marker_to_right = T_left_to_right @ T_marker_to_left
    rvec_r, _ = cv2.Rodrigues(T_marker_to_right[:3, :3])
    return rvec_r.ravel(), T_marker_to_right[:3, 3]


def test_stereo_right_from_left_matches_reference_math():
    """Golden parity: nonzero factory rotations + ty/tz, a rotated left pose,
    and the reference's manual correction offset."""
    stereo = {
        "baseline": 119.91,
        "ty": -0.285,
        "tz": 0.52,
        "rx": 0.0038,
        "ry": -0.0021,
        "rz": 0.0009,
    }
    rvec_l = np.array([0.21, -1.37, 0.08])
    tvec_l = np.array([-0.32, 0.11, 1.84])
    ref_r, ref_t = _reference_stereo_transfer(rvec_l, tvec_l, stereo)
    offset = np.array([-0.025, 0.0, 0.0])  # RIGHT_CAM_CORRECTION_OFFSET
    got_r, got_t = stereo_right_from_left(rvec_l, tvec_l, stereo, correction_offset=offset)
    np.testing.assert_allclose(got_t, ref_t + offset, atol=1e-9)
    np.testing.assert_allclose(got_r, ref_r, atol=1e-5)  # f32 Rodrigues round-trip


def test_load_rig_units(tmp_path):
    """FR5 rig: rvec stored in degrees must come out radians."""
    calib_dir = tmp_path / "calib"
    calib_dir.mkdir()
    (calib_dir / "top_30779426_leftcam_calib.json").write_text(
        json.dumps(
            {
                "camera_matrix": [[700.0, 0, 960], [0, 700.0, 540], [0, 0, 1]],
                "distortion_coeffs": [0.0] * 5,
            }
        )
    )
    summary = tmp_path / "Fr5_aruco_pose_summary.json"
    summary.write_text(
        json.dumps(
            [
                {
                    "view": "top",
                    "cam": "leftcam",
                    "tvec_x": 0.0,
                    "tvec_y": -0.01,
                    "tvec_z": 0.75,
                    "rvec_x": 90.0,
                    "rvec_y": 0.0,
                    "rvec_z": -45.0,
                }
            ]
        )
    )
    rig = load_rig(
        "fr5",
        "fr5",
        {"30779426": "top"},
        calib_dir=calib_dir,
        aruco_summary_paths=summary,
    )
    extr = rig.extrinsics["top_leftcam"]
    np.testing.assert_allclose(extr.rvec, np.deg2rad([90.0, 0.0, -45.0]))
    assert rig.calibs["top_leftcam"].camera_matrix[0, 0] == 700.0
    # Static view index table is deterministic.
    assert rig.view_index("30779426", "leftcam") == 0
    assert rig.view_index("30779426", "rightcam") == 1


def test_solve_marker_pose_from_corners():
    """Stage-2 marker re-solve recovers a synthetic marker pose."""
    import cv2

    from mvropose_tpu.calib.aruco import solve_marker_pose_from_corners

    K = np.array([[700.0, 0, 640], [0, 700.0, 360], [0, 0, 1]])
    size = 0.05
    # Reference top-left-origin object points
    # (Meca_insertion_preprocessing.py:211-213).
    obj = np.array([[0, 0, 0], [size, 0, 0], [size, size, 0], [0, size, 0]], float)
    rvec_gt = np.array([0.3, -0.2, 0.1])
    tvec_gt = np.array([0.05, -0.02, 0.6])
    corners, _ = cv2.projectPoints(obj, rvec_gt, tvec_gt, K, np.zeros(5))
    out = solve_marker_pose_from_corners(corners.reshape(4, 2), size, K)
    assert out["reproj_error_px"] < 0.5
    np.testing.assert_allclose(out["tvec"], tvec_gt, atol=2e-3)


def test_load_dream_camera_settings(tmp_path):
    (tmp_path / "_camera_settings.json").write_text(json.dumps({
        "camera_settings": [{
            "intrinsic_settings": {"fx": 615.5, "fy": 615.5, "cx": 320.0, "cy": 240.0}
        }]
    }))
    from mvropose_tpu.calib import load_dream_camera_settings

    intr = load_dream_camera_settings(tmp_path / "_camera_settings.json")
    assert intr.camera_matrix[0, 0] == 615.5
    assert intr.camera_matrix[1, 2] == 240.0
    np.testing.assert_array_equal(intr.distortion_coeffs, np.zeros(5))


def test_load_dream_rig(tmp_path):
    from mvropose_tpu.calib import load_dream_rig

    for name, fx in (("panda-3cam_azure", 600.0), ("panda-orb", 500.0)):
        d = tmp_path / name
        d.mkdir()
        (d / "_camera_settings.json").write_text(json.dumps({
            "camera_settings": [{"intrinsic_settings": {"fx": fx, "fy": fx, "cx": 320, "cy": 240}}]
        }))
    rig = load_dream_rig([tmp_path / "panda-3cam_azure", tmp_path / "panda-orb"])
    assert rig.calibs["panda-3cam_azure_leftcam"].camera_matrix[0, 0] == 600.0
    assert rig.calibs["panda-orb_leftcam"].camera_matrix[0, 0] == 500.0
    assert rig.robot.name == "dream_panda"


def test_extrinsic_record_unit_tag_wins_over_robot_convention():
    """Summaries can mix origins: reference files store the robot's
    conventional unit (FR5/Meca degrees) with NO tag, while this CLI's
    calibrate extrinsics/corners/stereo-transfer write RADIANS with an
    explicit rvec_unit tag. The loader must honor the tag - otherwise a
    radian record in a deg-robot summary is silently shrunk ~57x."""
    from mvropose_tpu.calib.registry import _load_extrinsic_record

    base = {"tvec_x": 0.0, "tvec_y": 0.0, "tvec_z": 1.0,
            "rvec_x": 90.0, "rvec_y": 0.0, "rvec_z": 0.0}
    # Untagged record in a deg-robot summary: reference convention applies.
    ex = _load_extrinsic_record(base, "deg")
    np.testing.assert_allclose(ex.rvec[0], np.pi / 2, rtol=1e-6)
    # Tagged radian record in the SAME deg-robot summary: tag wins.
    ex = _load_extrinsic_record({**base, "rvec_x": 1.5, "rvec_unit": "rad"}, "deg")
    np.testing.assert_allclose(ex.rvec[0], 1.5, rtol=1e-6)
    # Tagged deg record for a rad robot: tag wins the other way too.
    ex = _load_extrinsic_record({**base, "rvec_unit": "deg"}, "rad")
    np.testing.assert_allclose(ex.rvec[0], np.pi / 2, rtol=1e-6)

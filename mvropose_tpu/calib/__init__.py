"""Calibration layer: ZED .conf intrinsics, ArUco extrinsic averaging, rig registry."""

from mvropose_tpu.calib.zed_conf import (
    load_zed_intrinsics,
    load_stereo_params,
    load_dream_camera_settings,
)
from mvropose_tpu.calib.aruco import (
    average_marker_detections,
    compute_view_pose,
    stereo_right_from_left,
)
from mvropose_tpu.calib.registry import (
    CameraCalib,
    CameraExtrinsic,
    RigSpec,
    load_rig,
    load_dream_rig,
)

__all__ = [
    "load_zed_intrinsics",
    "load_dream_camera_settings",
    "load_stereo_params",
    "average_marker_detections",
    "compute_view_pose",
    "stereo_right_from_left",
    "CameraCalib",
    "CameraExtrinsic",
    "RigSpec",
    "load_rig",
    "load_dream_rig",
]

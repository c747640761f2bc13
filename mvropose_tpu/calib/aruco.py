"""ArUco multi-marker extrinsic calibration: averaging, outlier rejection,
offsets, stereo transfer.

jnp reimplementation of the reference's three-stage pipeline
(/root/reference/dataset/Fr5_preprocessing.py:81-143 & 191-313,
Meca_insertion_preprocessing.py:84-93 & 316-377):
  stage 1: per-marker averaging of repeated detections (quaternion eigen-mean
           + angular/positional outlier rejection)
  stage 2: per-view pose = mean over markers of (marker pose + board offset)
  stage 3: derive the right-cam pose from the left via the ZED [STEREO]
           baseline transform.

Host-side numpy/jnp hybrid: this runs once at calibration time, so clarity
beats kernel fusion; the math reuses the jnp rotation utilities (tested
against scipy) rather than scipy itself.
"""

from __future__ import annotations

from typing import Mapping, Sequence

import numpy as np
import jax.numpy as jnp

from mvropose_tpu.geometry.rotations import (
    average_quaternion,
    quat_angular_distance,
    quat_to_matrix,
    matrix_to_rodrigues,
    rodrigues_to_matrix,
)


def average_marker_detections(
    detections: Sequence[Mapping],
    angular_outlier_deg: float = 1.0,
    position_outlier_m: float | None = None,
) -> dict | None:
    """Average repeated detections of ONE marker with outlier rejection.

    detections: iterable of {"position_m": {x, y, z},
                             "rotation_quat": {x, y, z, w}} dicts (the raw
    capture JSON schema). Returns the same schema averaged, or None if fewer
    than 2 detections survive (the reference requires >= 2,
    Fr5_preprocessing.py:103).
    """
    if len(detections) < 2:
        return None
    pos = np.array(
        [[m["position_m"]["x"], m["position_m"]["y"], m["position_m"]["z"]] for m in detections]
    )
    quat = np.array(
        [
            [m["rotation_quat"]["x"], m["rotation_quat"]["y"], m["rotation_quat"]["z"], m["rotation_quat"]["w"]]
            for m in detections
        ]
    )
    q0 = np.asarray(average_quaternion(jnp.asarray(quat)))
    ang = np.array(
        [np.degrees(float(quat_angular_distance(jnp.asarray(q0), jnp.asarray(q)))) for q in quat]
    )
    keep = ang <= angular_outlier_deg
    if position_outlier_m is not None:
        dist = np.linalg.norm(pos - pos.mean(axis=0), axis=1)
        keep &= dist < position_outlier_m
    if not keep.any():
        return None
    pos_k, quat_k = pos[keep], quat[keep]
    avg_pos = pos_k.mean(axis=0)
    avg_quat = np.asarray(average_quaternion(jnp.asarray(quat_k)))
    return {
        "position_m": {"x": float(avg_pos[0]), "y": float(avg_pos[1]), "z": float(avg_pos[2])},
        "rotation_quat": {
            "x": float(avg_quat[0]),
            "y": float(avg_quat[1]),
            "z": float(avg_quat[2]),
            "w": float(avg_quat[3]),
        },
        "n_used": int(keep.sum()),
        "n_total": len(detections),
    }


def compute_view_pose(
    marker_poses: Mapping[str, Mapping],
    marker_offsets: Mapping[str, np.ndarray],
) -> dict | None:
    """Per-view rig pose: mean over markers of (marker pose + board offset).

    Only markers present in BOTH the detections and the offset table are used
    (Fr5_preprocessing.py:221-235). Returns {"rvec": (3,), "tvec": (3,)}
    (radians / meters, world->camera) or None if no usable marker.
    """
    tvecs, quats = [], []
    for mid, offset in marker_offsets.items():
        if mid not in marker_poses:
            continue
        p = marker_poses[mid]
        t = np.array([p["position_m"]["x"], p["position_m"]["y"], p["position_m"]["z"]])
        q = np.array([p["rotation_quat"][k] for k in ("x", "y", "z", "w")])
        Rm = np.asarray(quat_to_matrix(jnp.asarray(q)))
        tvecs.append(t + Rm @ np.asarray(offset))
        quats.append(q)
    if not tvecs:
        return None
    mean_t = np.mean(tvecs, axis=0)
    mean_q = np.asarray(average_quaternion(jnp.asarray(np.stack(quats))))
    mean_r = np.asarray(matrix_to_rodrigues(quat_to_matrix(jnp.asarray(mean_q))))
    return {"rvec": mean_r, "tvec": mean_t, "n_markers": len(tvecs)}


def solve_marker_pose_from_corners(
    corners_px: np.ndarray,  # (4, 2) pixel corners, TL TR BR BL order
    marker_size_m: float,
    K: np.ndarray,
    dist: np.ndarray | None = None,
) -> dict:
    """Re-solve one marker's pose from its corner pixels (reference stage 2,
    /root/reference/dataset/Meca_insertion_preprocessing.py:210-249: solvePnP
    + solvePnPRefineLM). Uses our planar PnP + LM refine; returns
    {"rvec", "tvec", "reproj_error_px"}."""
    import jax.numpy as jnp

    from mvropose_tpu.geometry.pnp import solve_pnp
    from mvropose_tpu.geometry.camera import project_points

    h = marker_size_m / 2.0
    obj = np.array(
        [[-h, h, 0.0], [h, h, 0.0], [h, -h, 0.0], [-h, -h, 0.0]], dtype=np.float32
    )
    img = np.asarray(corners_px, dtype=np.float32)
    dist_j = jnp.asarray(dist, jnp.float32) if dist is not None else None
    rvec, tvec, _ = solve_pnp(
        jnp.asarray(obj), jnp.asarray(img), jnp.asarray(K, jnp.float32), dist=dist_j
    )
    proj = np.asarray(
        project_points(jnp.asarray(obj), rvec, tvec, jnp.asarray(K, jnp.float32), dist_j)
    )
    err = float(np.linalg.norm(proj - img, axis=-1).mean())
    return {"rvec": np.asarray(rvec), "tvec": np.asarray(tvec), "reproj_error_px": err}


def stereo_right_from_left(
    rvec_left: np.ndarray,
    tvec_left: np.ndarray,
    stereo: Mapping[str, float],
    correction_offset: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Derive the right camera's extrinsic from the left via the ZED factory
    stereo transform (baseline mm + small rotations), reference stage 3
    (Meca_insertion_preprocessing.py:316-377).

    world->right = (left->right) o (world->left).
    """
    R_wl = np.asarray(rodrigues_to_matrix(jnp.asarray(rvec_left, jnp.float32)))
    t_wl = np.asarray(tvec_left, dtype=np.float64)

    # left->right: translate by -baseline along x (ZED convention: right cam
    # is baseline mm to the left cam's +x), small factory rotation.
    t_lr = np.array([-stereo["baseline"] / 1000.0, stereo.get("ty", 0.0), stereo.get("tz", 0.0)])
    r_lr = np.array([stereo.get("rx", 0.0), stereo.get("ry", 0.0), stereo.get("rz", 0.0)])
    R_lr = np.asarray(rodrigues_to_matrix(jnp.asarray(r_lr, jnp.float32)))

    R_wr = R_lr @ R_wl
    t_wr = R_lr @ t_wl + t_lr
    if correction_offset is not None:
        t_wr = t_wr + np.asarray(correction_offset)
    rvec_right = np.asarray(matrix_to_rodrigues(jnp.asarray(R_wr, jnp.float32)))
    return rvec_right, t_wr

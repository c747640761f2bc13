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
    capture JSON schema). Returns the same schema averaged, or None when
    fewer than 2 RAW detections arrive or no detection survives the outlier
    gates (a single survivor is returned unaveraged, matching the reference,
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


def average_detections_with_corners(
    detections: Sequence[Mapping],
    position_outlier_m: float = 0.001,
    angular_outlier_deg: float = 3.0,
) -> dict | None:
    """Meca-insertion stage-1 averaging: joint positional (1 mm) + angular
    (3 deg) outlier rejection against the mean, survivors must be >= half of
    the detections, and the corner pixels are averaged over the same mask
    (reference Meca_insertion_preprocessing.py:84-93, 181-205).

    detections carry {"position_m", "rotation_quat", "corners_pixel"}; returns
    the same schema averaged, or None when too few survive. A single
    detection is passed through unchanged (reference :184-186).
    """
    if not detections:
        return None
    if len(detections) < 2:
        return dict(detections[0])
    pos = np.array([[m["position_m"][k] for k in "xyz"] for m in detections])
    quat = np.array([[m["rotation_quat"][k] for k in "xyzw"] for m in detections])
    corners = np.array([m["corners_pixel"] for m in detections], dtype=np.float32)

    avg_pos = pos.mean(axis=0)
    avg_quat = np.asarray(average_quaternion(jnp.asarray(quat)))
    pos_mask = np.linalg.norm(pos - avg_pos, axis=1) < position_outlier_m
    ang = np.array(
        [np.degrees(float(quat_angular_distance(jnp.asarray(avg_quat), jnp.asarray(q)))) for q in quat]
    )
    mask = pos_mask & (ang < angular_outlier_deg)
    if mask.sum() == 0 or mask.sum() < len(detections) / 2:
        return None
    out_pos = pos[mask].mean(axis=0)
    out_quat = np.asarray(average_quaternion(jnp.asarray(quat[mask])))
    out_corners = corners[mask].mean(axis=0)
    return {
        "position_m": dict(zip("xyz", (float(v) for v in out_pos))),
        "rotation_quat": dict(zip("xyzw", (float(v) for v in out_quat))),
        "corners_pixel": out_corners.tolist(),
        "n_used": int(mask.sum()),
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
    + solvePnPRefineLM). Object points use the reference's TOP-LEFT-origin
    convention ([[0,0,0],[s,0,0],[s,s,0],[0,s,0]],
    Meca_insertion_preprocessing.py:211-213) so the recovered tvec is the
    top-left corner, not the marker center. Uses our planar PnP + LM refine;
    returns {"rvec", "tvec", "reproj_error_px"}."""
    from mvropose_tpu.geometry.pnp import solve_pnp
    from mvropose_tpu.geometry.camera import project_points

    s = marker_size_m
    obj = np.array(
        [[0.0, 0.0, 0.0], [s, 0.0, 0.0], [s, s, 0.0], [0.0, s, 0.0]], dtype=np.float32
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


def _euler_zyx_rad_to_matrix_np(rz: float, ry: float, rx: float) -> np.ndarray:
    """float64 host equivalent of scipy `Rotation.from_euler('zyx', [rz, ry,
    rx])` (lowercase = extrinsic): R = Rx(rx) @ Ry(ry) @ Rz(rz)."""
    cz, sz = np.cos(rz), np.sin(rz)
    cy, sy = np.cos(ry), np.sin(ry)
    cx, sx = np.cos(rx), np.sin(rx)
    Rz = np.array([[cz, -sz, 0.0], [sz, cz, 0.0], [0.0, 0.0, 1.0]])
    Ry = np.array([[cy, 0.0, sy], [0.0, 1.0, 0.0], [-sy, 0.0, cy]])
    Rx = np.array([[1.0, 0.0, 0.0], [0.0, cx, -sx], [0.0, sx, cx]])
    return Rx @ Ry @ Rz


def stereo_right_from_left(
    rvec_left: np.ndarray,
    tvec_left: np.ndarray,
    stereo: Mapping[str, float],
    correction_offset: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Derive the right camera's extrinsic from the left via the ZED factory
    stereo transform, matching reference stage 3 exactly
    (Meca_insertion_preprocessing.py:333-346):

      1. right-in-left transform from the conf: t = [Baseline, TY, TZ] / 1000
         (all three stored in mm), R = euler-zyx([RZ, CV, RX], radians);
      2. invert it -> T_left_to_right;
      3. world->right = T_left_to_right o (world->left);
      4. optional manual correction offset added to tvec_right
         (`RIGHT_CAM_CORRECTION_OFFSET`, Meca_insertion_preprocessing.py:316).

    Host calibration-time code, so float64 numpy throughout.
    """
    R_wl = np.asarray(
        rodrigues_to_matrix(jnp.asarray(rvec_left, jnp.float32)), dtype=np.float64
    )
    t_wl = np.asarray(tvec_left, dtype=np.float64)

    t_rl = np.array(
        [stereo["baseline"], stereo.get("ty", 0.0), stereo.get("tz", 0.0)]
    ) / 1000.0
    R_rl = _euler_zyx_rad_to_matrix_np(
        stereo.get("rz", 0.0), stereo.get("ry", 0.0), stereo.get("rx", 0.0)
    )
    # T_left_to_right = inv(T_right_to_left)
    R_lr = R_rl.T
    t_lr = -R_rl.T @ t_rl

    R_wr = R_lr @ R_wl
    t_wr = R_lr @ t_wl + t_lr
    if correction_offset is not None:
        t_wr = t_wr + np.asarray(correction_offset)
    rvec_right = np.asarray(matrix_to_rodrigues(jnp.asarray(R_wr, jnp.float32)))
    return rvec_right, t_wr

"""Serve path: model outputs -> 6D pose recovery.

TPU-native equivalent of the reference's notebook serve cells
(/root/reference/model/Fr5_model_train.ipynb cell 14): heatmaps -> decoded
keypoints + confidences -> FK(predicted angles) as the 3D model points ->
RANSAC PnP -> camera pose, with the ArUco-extrinsic fallback on failure.
Everything through PnP is one jitted, batched function - no host round-trip
per view.

Additions beyond the reference: multi-view DLT triangulation of the keypoints
(`recover_pose_multiview`) and pose error metrics against the calibrated
extrinsics.
"""

from __future__ import annotations

import dataclasses
import functools
import jax
import jax.numpy as jnp
import numpy as np

from mvropose_tpu.decode import decode_keypoints
from mvropose_tpu.geometry.pnp import solve_pnp_ransac
from mvropose_tpu.geometry.robots import RobotSpec, forward_kinematics
from mvropose_tpu.geometry.triangulation import projection_matrix, triangulate_keypoints
from mvropose_tpu.geometry.camera import project_points
from mvropose_tpu.pose.refine import refine_rig_pose_angles

# The reference's serve gate: keypoint confidence >= 0.6 and >= 4 points
# (Fr5_model_train.ipynb cell 14, line 1545 and 1419-1428).
DEFAULT_CONFIDENCE_THRESHOLD = 0.6


@dataclasses.dataclass
class PoseResult:
    rvec: np.ndarray  # (3,)
    tvec: np.ndarray  # (3,)
    success: bool
    n_inliers: int
    keypoints_2d: np.ndarray  # (J, 2) decoded, image px
    scores: np.ndarray  # (J,)
    used_fallback: bool


def recover_pose_single_view(
    heatmaps: jnp.ndarray,  # (J, Hm, Wm) raw logits
    pred_angles: jnp.ndarray,  # (A,) native units
    robot: RobotSpec,
    K: np.ndarray,
    image_hw: tuple[int, int],
    view: str | None = None,
    confidence_threshold: float = DEFAULT_CONFIDENCE_THRESHOLD,
    fallback_extrinsic: tuple[np.ndarray, np.ndarray] | None = None,
    key: jax.Array | None = None,
) -> PoseResult:
    """Decode + FK + RANSAC PnP for one view; ArUco fallback on failure."""
    xy, conf = decode_keypoints(heatmaps, image_hw=image_hw, use_pallas=jax.default_backend() == "tpu")
    base = robot.base_rotation(view)
    obj = robot.keypoints_from_fk(forward_kinematics(robot, pred_angles, jnp.asarray(base)))
    weights = (conf >= confidence_threshold).astype(jnp.float32)
    result = solve_pnp_ransac(
        obj,
        xy,
        jnp.asarray(K, jnp.float32),
        weights=weights,
        key=key if key is not None else jax.random.PRNGKey(0),
    )
    success = bool(result["success"])
    if success:
        return PoseResult(
            rvec=np.asarray(result["rvec"]),
            tvec=np.asarray(result["tvec"]),
            success=True,
            n_inliers=int(result["n_inliers"]),
            keypoints_2d=np.asarray(xy),
            scores=np.asarray(conf),
            used_fallback=False,
        )
    if fallback_extrinsic is not None:
        rvec, tvec = fallback_extrinsic
        return PoseResult(
            rvec=np.asarray(rvec),
            tvec=np.asarray(tvec),
            success=False,
            n_inliers=int(result["n_inliers"]),
            keypoints_2d=np.asarray(xy),
            scores=np.asarray(conf),
            used_fallback=True,
        )
    return PoseResult(
        rvec=np.asarray(result["rvec"]),
        tvec=np.asarray(result["tvec"]),
        success=False,
        n_inliers=int(result["n_inliers"]),
        keypoints_2d=np.asarray(xy),
        scores=np.asarray(conf),
        used_fallback=False,
    )


@functools.partial(jax.jit, static_argnames=("robot", "n_hypotheses"))
def solve_rig_pnp(
    xy: jnp.ndarray,  # (V, J, 2) decoded keypoints, image px
    conf: jnp.ndarray,  # (V, J) decode confidences
    pred_angles: jnp.ndarray,  # (A,) shared robot state
    base_rotations: jnp.ndarray,  # (V, 3, 3) per-view base corrections
    Ks: jnp.ndarray,  # (V, 3, 3)
    robot: RobotSpec,
    confidence_threshold: float = DEFAULT_CONFIDENCE_THRESHOLD,
    key: jax.Array | None = None,
    n_hypotheses: int = 16,
):
    """Per-camera RANSAC PnP from already-decoded keypoints.

    The decode-free core of `recover_pose_batch`, for callers that already
    hold decoded keypoints (e.g. eval solving PnP twice per frame - once with
    predicted angles, once with measured/GT angles - from one decode pass).
    The recovered pose maps base-rotated FK points into the camera frame.
    """
    V = xy.shape[0]
    weights = (conf >= confidence_threshold).astype(jnp.float32)  # (V, J)
    if key is None:
        key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, V)

    def per_view(base, xy_v, w_v, K_v, k_v):
        # Keypoint k pairs with FK origin keypoint_fk_indices[k] (DREAM's 7
        # named links vs the 8-origin chain; identity for fr3/fr5/meca).
        obj = robot.keypoints_from_fk(forward_kinematics(robot, pred_angles, base))
        return solve_pnp_ransac(
            obj, xy_v, K_v, weights=w_v, key=k_v, n_hypotheses=n_hypotheses
        )

    result = jax.vmap(per_view)(base_rotations, xy, weights, Ks, keys)
    result["keypoints_xy"] = xy
    result["confidence"] = conf
    return result


@functools.partial(
    jax.jit,
    static_argnames=("robot", "image_hw", "n_hypotheses", "use_pallas",
                     "decode_mode", "refine"),
)
def recover_pose_batch(
    heatmaps: jnp.ndarray,  # (V, J, Hm, Wm) raw logits, one per camera
    pred_angles: jnp.ndarray,  # (A,) shared robot state
    base_rotations: jnp.ndarray,  # (V, 3, 3) per-view base corrections
    Ks: jnp.ndarray,  # (V, 3, 3)
    robot: RobotSpec,
    image_hw: tuple[int, int],
    confidence_threshold: float = DEFAULT_CONFIDENCE_THRESHOLD,
    key: jax.Array | None = None,
    n_hypotheses: int = 16,
    use_pallas: bool = False,
    decode_mode: str = "argmax",
    refine: bool = False,
    refine_sigma_px: float = 1.2,
    refine_sigma_prior: float = 0.2,
):
    """Fully-jitted per-camera 6D pose recovery for a whole rig tick.

    decode -> FK(pred angles) -> RANSAC PnP, vmapped over the V cameras - the
    batched serve-path closure of the reference's per-view host loop
    (Fr5_model_train.ipynb cell 14 main loop). Returns dict with rvec (V, 3),
    tvec (V, 3), n_inliers (V,), success (V,), keypoints_xy (V, J, 2),
    confidence (V, J).

    decode_mode "argmax" is the reference-parity hard peak; "refine" is the
    subpixel peak-local softmax centroid — at 128px heatmaps for a 1280x720
    image the hard peak quantizes to 10 image px, which caps pose accuracy
    well above what the model's heatmaps support (measured in
    test_pose_error_metrics_on_perfect_heatmaps: refine cuts recovered-pose
    error ~3x on exact heatmaps).
    """
    xy, conf = decode_keypoints(
        heatmaps, image_hw=image_hw, mode=decode_mode, use_pallas=use_pallas
    )
    out = solve_rig_pnp(
        xy, conf, pred_angles, base_rotations, Ks, robot,
        confidence_threshold=confidence_threshold, key=key,
        n_hypotheses=n_hypotheses,
    )
    if refine:
        # Joint (pose, angles) refinement: the predicted angles become a
        # PRIOR instead of fixed PnP object points (pose/refine.py - the
        # production answer to the reference protocol's angle-error
        # sensitivity). Shares the decode; angles are refined jointly across
        # the rig's views.
        ref = refine_rig_pose_angles(
            xy, conf, pred_angles, out["rvec"], out["tvec"], base_rotations,
            Ks, robot,
            key if key is not None else jax.random.PRNGKey(0),
            sigma_px=refine_sigma_px, sigma_prior=refine_sigma_prior,
            confidence_threshold=confidence_threshold,
        )
        out["rvec"], out["tvec"] = ref["rvec"], ref["tvec"]
        out["refined_angles"] = ref["angles"]
        out["success"] = out["success"] | (conf >= confidence_threshold).any(-1)
    return out


@functools.partial(jax.jit, static_argnames=("image_hw",))
def recover_pose_multiview(
    heatmaps: jnp.ndarray,  # (V, J, Hm, Wm)
    view_mask: jnp.ndarray,  # (V,)
    rvecs: jnp.ndarray,  # (V, 3) calibrated world->cam extrinsics
    tvecs: jnp.ndarray,  # (V, 3)
    Ks: jnp.ndarray,  # (V, 3, 3)
    image_hw: tuple[int, int],
    confidence_threshold: float = DEFAULT_CONFIDENCE_THRESHOLD,
):
    """Triangulate the robot's 3D keypoints from all confident views.

    Returns (points3d (J, 3) world frame, per-keypoint observability (J,)).
    A keypoint is triangulated from every view where its confidence clears
    the gate; fewer than 2 observing views -> observability 0.
    """
    V = heatmaps.shape[0]
    xy, conf = decode_keypoints(heatmaps, image_hw=image_hw, use_pallas=False)
    weights = (conf >= confidence_threshold).astype(jnp.float32) * view_mask.astype(
        jnp.float32
    )[:, None]  # (V, J)
    projs = jax.vmap(projection_matrix)(rvecs, tvecs, Ks)  # (V, 3, 4)
    pts3d = triangulate_keypoints(xy, projs, weights)  # (J, 3)
    observable = (jnp.sum(weights > 0, axis=0) >= 2).astype(jnp.float32)
    return pts3d, observable


def reprojection_errors(
    points3d: jnp.ndarray,  # (J, 3)
    keypoints_2d: jnp.ndarray,  # (J, 2)
    rvec: jnp.ndarray,
    tvec: jnp.ndarray,
    K: jnp.ndarray,
) -> jnp.ndarray:
    proj = project_points(points3d, rvec, tvec, K, None)
    return jnp.linalg.norm(proj - keypoints_2d, axis=-1)


__all__ = [
    "PoseResult",
    "solve_rig_pnp",
    "recover_pose_batch",
    "recover_pose_single_view",
    "recover_pose_multiview",
    "reprojection_errors",
    "refine_rig_pose_angles",
    "DEFAULT_CONFIDENCE_THRESHOLD",
]

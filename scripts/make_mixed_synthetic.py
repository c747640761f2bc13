"""Generate per-robot synthetic single-view datasets in each robot's NATIVE
artifact schema, for the mixed-robot training regime (BASELINE config 4).

For every requested robot it writes, under --out-dir:
  * images  `<robot>/<...>/zed_<serial>_left_<ts>.jpg` (blob renders at the
    rig-GT keypoint locations; FR3 images sit under a pose1/ directory as
    the reference's FR3 capture layout requires)
  * a CSV in the robot's synced-row schema (fr5/meca: joint_1..N native
    units; fr3: position_fr3_joint1..7 radians)
  * shared `calib/` `{view}_{serial}_{cam}_calib.json` files and per-robot
    ArUco summary JSONs (`<robot>_aruco_pose_summary.json`, FR3's named
    `pose1_aruco_pose_summary.json` for the pose-prefix convention)

Self-consistency is by construction: the generator builds the SAME RigSpec
the trainer will load (calib.registry.load_rig over the files it just
wrote) and renders blobs at `_RigGeometry.gt_keypoints` output - the exact
FK + base-rotation + projection chain `cli train` supervises against
(reference GT chain: /root/reference/model/MvRoPose_FR3.py:65-141).

Usage:
    python scripts/make_mixed_synthetic.py --out-dir data_synth/mixed \
        --robots fr5 fr3 --n-samples 2000 --seed 0
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# One camera per robot; disjoint VIEW names keep a SHARED calib dir clean
# (calib files and extrinsic records key by {view}_{cam} with no serial, so
# two robots reusing a view name would collide). meca_insertion runs Meca500
# kinematics on its own rig (registry MECA_INSERTION_SERIAL_TO_VIEW serial
# 41182735 -> "front"; do not combine it with meca500 in one generated set -
# they share the view name); its native artifact is robot_data.txt
# (timestamp + 7 joints + 5 cartesian,
# /root/reference/sync/Meca_insertion_sync.py:48-54), synced to a CSV by the
# real sync_meca_insertion path below - not a hand-written CSV.
ROBOT_CAMERA = {
    "fr5": {"serial": "38007749", "view": "left", "robot_name": "fr5"},
    "fr3": {"serial": "41182735", "view": "view1", "robot_name": "fr3"},
    "meca500": {"serial": "41182735", "view": "front", "robot_name": "meca500"},
    "meca_insertion": {"serial": "41182735", "view": "front", "robot_name": "meca500"},
}
# Native-unit angle half-ranges (keeps every FK keypoint in frame at the
# default camera; degrees for fr5/meca, radians for fr3).
ANGLE_HALF = {"fr5": 45.0, "fr3": 0.55, "meca500": 40.0, "meca_insertion": 40.0}


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out-dir", required=True)
    p.add_argument("--robots", nargs="+", default=["fr5", "fr3"], choices=sorted(ROBOT_CAMERA))
    p.add_argument("--n-samples", type=int, default=2000)
    p.add_argument("--image-hw", type=int, nargs=2, default=(128, 128))
    p.add_argument("--focal-scale", type=float, default=0.96)
    p.add_argument("--noise-std", type=float, default=0.05)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--calib-from", default=None,
                   help="reuse an EXISTING generated set's calib/ and aruco "
                        "summaries instead of placing new cameras. A "
                        "held-out EVAL set must share the train set's "
                        "cameras (the camera center derives from an FK "
                        "probe cloud fed by --seed, so a fresh seed would "
                        "move the camera and confound the eval with a "
                        "train/test geometry shift); pass the train "
                        "--out-dir here and a new --seed for fresh angles.")
    args = p.parse_args()

    import cv2
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")

    from mvropose_tpu.calib.registry import load_rig
    from mvropose_tpu.data.dataset import SingleViewSample, _RigGeometry
    from mvropose_tpu.data.synthetic import _look_at, render_blob_images, joint_palette
    from mvropose_tpu.geometry.robots import forward_kinematics, get_robot
    from mvropose_tpu.geometry.rotations import matrix_to_rodrigues

    out = Path(args.out_dir)
    calib_dir = out / "calib"
    calib_dir.mkdir(parents=True, exist_ok=True)
    h, w = args.image_hw
    K = np.array(
        [[args.focal_scale * w, 0, w / 2.0], [0, args.focal_scale * w, h / 2.0], [0, 0, 1]],
        dtype=np.float32,
    )

    rng = np.random.default_rng(args.seed)
    for rname in args.robots:
        spec = ROBOT_CAMERA[rname]
        serial, view = spec["serial"], spec["view"]
        robot = get_robot(spec["robot_name"])

        prefix = "pose1" if rname == "fr3" else rname
        if args.calib_from:
            # Held-out eval regime: share the TRAIN set's cameras exactly;
            # only the sample angles (and image noise) are fresh.
            src = Path(args.calib_from)
            calib_dir = src / "calib"
            summary = src / f"{prefix}_aruco_pose_summary.json"
        else:
            # Aim the camera at the robot's ACTUAL workspace: per-view base
            # rotations re-orient the arm in world frame (fr3's view1 points
            # it -z; fr5's left swaps axes), so a fixed make_rig target
            # would look at the wrong half-space. Probe the FK keypoint
            # cloud, look at its centroid from a distance scaled to its
            # radius.
            half_probe = ANGLE_HALF[rname]
            probe = rng.uniform(-half_probe, half_probe, size=(256, robot.n_joints)).astype(np.float32)
            base = jnp.asarray(robot.base_rotation(view))
            cloud = np.asarray(
                jax.vmap(lambda a: robot.keypoints_from_fk(forward_kinematics(robot, a, base)))(
                    jnp.asarray(probe)
                )
            ).reshape(-1, 3)
            centroid = cloud.mean(axis=0)
            radius = float(np.linalg.norm(cloud - centroid, axis=1).max())
            # Distance so the cloud's full extent spans ~70% of the frame.
            dist = 2.0 * radius * args.focal_scale / 0.35
            center = centroid + dist * np.array([0.83, 0.35, 0.43])/ np.linalg.norm([0.83, 0.35, 0.43])
            R = _look_at(center, centroid)
            cam_rvec = np.asarray(matrix_to_rodrigues(jnp.asarray(R, dtype=jnp.float32)))
            cam_tvec = (-R @ center).astype(np.float32)

            (calib_dir / f"{view}_{serial}_leftcam_calib.json").write_text(json.dumps({
                "camera_matrix": K.tolist(),
                "distortion_coeffs": [0.0] * 5,
            }))
            # Extrinsic record in radians with an explicit unit tag (the
            # loader honors per-record tags over the robot's legacy default
            # unit).
            rec = {
                "view": view, "cam": "leftcam", "rvec_unit": "rad",
                "rvec_x": float(cam_rvec[0]),
                "rvec_y": float(cam_rvec[1]),
                "rvec_z": float(cam_rvec[2]),
                "tvec_x": float(cam_tvec[0]),
                "tvec_y": float(cam_tvec[1]),
                "tvec_z": float(cam_tvec[2]),
            }
            summary = out / f"{prefix}_aruco_pose_summary.json"
            summary.write_text(json.dumps([rec]))

        rig = load_rig(
            rname, spec["robot_name"], {serial: view},
            calib_dir=calib_dir,
            aruco_summary_paths={"pose1": summary} if rname == "fr3" else summary,
        )
        geom = _RigGeometry(rig, (h, w))
        ckey = f"{view}_leftcam"
        ekey = f"pose1_{ckey}" if rname == "fr3" else ckey

        half = ANGLE_HALF[rname]
        angles = rng.uniform(-half, half, size=(args.n_samples, robot.n_joints)).astype(np.float32)
        img_dir = out / rname / ("pose1" if rname == "fr3" else "images")
        img_dir.mkdir(parents=True, exist_ok=True)
        txt_lines = ["timestamp,j1,j2,j3,j4,j5,j6,j7,x,y,z,a,b"]  # meca_insertion only

        palette = jnp.asarray(joint_palette(rig.num_keypoints))
        rows = []
        kps = np.stack([
            geom.gt_keypoints(
                SingleViewSample(image_path="", camera_key=ckey, view=view, angles=a),
                ekey,
            )
            for a in angles
        ])  # (N, J, 2)
        oob = ((kps[..., 0] < 0) | (kps[..., 0] >= w) | (kps[..., 1] < 0) | (kps[..., 1] >= h))
        print(f"{rname}: {args.n_samples} samples, OOB keypoint frac {oob.mean():.4f}")
        batch = 256
        for s in range(0, args.n_samples, batch):
            e = min(s + batch, args.n_samples)
            noise = args.noise_std * rng.standard_normal((e - s, h, w, 3)).astype(np.float32)
            imgs = np.asarray(
                render_blob_images(jnp.asarray(kps[s:e]), (h, w), palette, noise=jnp.asarray(noise))
            )
            imgs = ((imgs * 0.5 + 0.5) * 255.0).clip(0, 255).astype(np.uint8)
            for i in range(s, e):
                ts = 1000.0 + i
                path = img_dir / f"zed_{serial}_left_{ts}.jpg"
                cv2.imwrite(str(path), imgs[i - s][..., ::-1])
                if rname == "meca_insertion":
                    # Native log row: ts + 7 joints (6 actuated + tool
                    # channel) + 5 cartesian; the CSV comes from the REAL
                    # sync path after the loop.
                    txt_lines.append(",".join(
                        [f"{ts}"]
                        + [f"{float(angles[i, j])}" for j in range(robot.n_joints)]
                        + ["0.0"] + ["0.0"] * 5
                    ))
                    continue
                if rname == "fr3":
                    row = {"image_path": str(path)}
                    row.update({f"position_fr3_joint{j + 1}": float(angles[i, j])
                                for j in range(robot.n_joints)})
                else:
                    row = {"image_path": str(path)}
                    row.update({f"joint_{j + 1}": float(angles[i, j])
                                for j in range(robot.n_joints)})
                rows.append(row)
        if rname == "meca_insertion":
            from mvropose_tpu.data.sync import SyncConfig, sync_meca_insertion

            txt = out / rname / "robot_data.txt"
            txt.write_text("\n".join(txt_lines))
            df = sync_meca_insertion([img_dir], txt, SyncConfig(tolerance_s=0.05))
            df.to_csv(out / f"{rname}.csv", index=False)
            print(f"wrote {out / f'{rname}.csv'} ({len(df)} rows via sync_meca_insertion)")
            continue
        import pandas as pd

        pd.DataFrame(rows).to_csv(out / f"{rname}.csv", index=False)
        print(f"wrote {out / f'{rname}.csv'} ({len(rows)} rows)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Generate a synthetic dataset in the DREAM file schema (stored keypoints).

The reference's single-view DREAM pipeline (sync/DREAM_sync.py +
model/DREAM_Train.py) trains on the public DREAM captures: per-frame
`xxxx.json` files carrying `sim_state.joints` and 7 named keypoints with a
precomputed 3D `location` + 2D `projected_location`, next to `xxxx.rgb.jpg`
and a per-subset `_camera_settings.json`. Those images are not available
offline, so this script renders the framework's own synthetic analogue IN
THAT EXACT SCHEMA - the one data path where heatmap GT comes from STORED
keypoints instead of FK-on-the-fly (reference DREAM_Train.py:72-129) - so
`cli sync dream` -> `_camera_settings` intrinsics -> build_dream_single_view
-> `cli train --robot dream` is driven end to end exactly as the real DREAM
data would drive it, at convergence scale (not just the few-step e2e test).

Images are rendered with the synthetic-rig blob renderer at the STORED
projected keypoint locations, so the stored-keypoint task is exactly
learnable and a converged run certifies the whole stored-kpt chain (sync
column layout, builder keypoint ordering, heatmap scaling, decode, PCK).

The 7 DREAM keypoint names map to panda (FR3-chain) FK joint origins by a
fixed arbitrary assignment - the names are schema, the geometry is the
framework's own FK, matching how the synthetic harness treats the other
robot families.

Usage:
    python scripts/make_dream_synthetic.py --out-dir /tmp/dream_synth \
        --n-samples 2000 --image-hw 128 128
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out-dir", required=True)
    p.add_argument("--n-samples", type=int, default=2000)
    p.add_argument("--image-hw", type=int, nargs=2, default=(128, 128))
    p.add_argument("--angle-scale", type=float, default=0.6)
    p.add_argument("--noise-std", type=float, default=0.05)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--focal-scale", type=float, default=0.55,
                   help="focal length as a multiple of image width. The "
                        "default matches the multi-robot synthetic rig; "
                        "0.96 matches DREAM-real's angular resolution "
                        "(fx/width = 615.5/640 for its RealSense captures) "
                        "- at 0.55 the robot subtends ~2x fewer pixels, so "
                        "decode noise costs ~2x more recovered-pose error")
    p.add_argument("--distance", type=float, default=1.6,
                   help="camera ring radius in meters (make_rig distance_m)")
    args = p.parse_args()

    import cv2
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")  # host-side data generation

    from mvropose_tpu.data.sync import DREAM_KEYPOINT_NAMES
    from mvropose_tpu.data.synthetic import make_rig, render_blob_images, joint_palette
    from mvropose_tpu.geometry.camera import project_points
    from mvropose_tpu.geometry.robots import forward_kinematics, get_robot
    from mvropose_tpu.geometry.rotations import rodrigues_to_matrix

    robot = get_robot("dream_panda")  # FR3 chain, radians
    # Name->FK-origin assignment comes from the robot spec (the same mapping
    # the PnP serve path uses to pair heatmap channels with FK points).
    fk_idx = np.asarray(robot.keypoint_fk_indices, dtype=np.int64)
    assert len(fk_idx) == len(DREAM_KEYPOINT_NAMES)

    h, w = args.image_hw
    rig = make_rig(
        n_views=1, image_hw=(h, w),
        distance_m=args.distance, focal_scale=args.focal_scale,
    )
    K, rvec, tvec = rig.K, rig.rvecs[0], rig.tvecs[0]

    rng = np.random.default_rng(args.seed)
    half = args.angle_scale * np.pi / 2.0
    angles = rng.uniform(-half, half, size=(args.n_samples, robot.n_joints)).astype(np.float32)

    # FK -> 3D (world) -> select 7 -> project -> render blobs at the STORED 2D.
    kp3d_w = jax.vmap(lambda a: forward_kinematics(robot, a))(jnp.asarray(angles))
    kp3d_w = np.asarray(kp3d_w)[:, fk_idx]  # (N, 7, 3)
    kp2d = np.asarray(
        jax.vmap(lambda p: project_points(p, jnp.asarray(rvec), jnp.asarray(tvec), jnp.asarray(K), None))(
            jnp.asarray(kp3d_w)
        )
    )  # (N, 7, 2)
    # DREAM stores keypoint `location` in the CAMERA frame.
    R = np.asarray(rodrigues_to_matrix(jnp.asarray(rvec)))
    kp3d_c = kp3d_w @ R.T + tvec[None, None]

    out = Path(args.out_dir) / "panda_synth"
    out.mkdir(parents=True, exist_ok=True)
    (out / "_camera_settings.json").write_text(
        json.dumps(
            {
                "camera_settings": [
                    {
                        "name": "camera",
                        "intrinsic_settings": {
                            "fx": float(K[0, 0]),
                            "fy": float(K[1, 1]),
                            "cx": float(K[0, 2]),
                            "cy": float(K[1, 2]),
                        },
                        "captured_image_size": {"width": w, "height": h},
                    }
                ]
            },
            indent=2,
        )
    )

    palette = jnp.asarray(joint_palette(len(fk_idx)))
    batch = 256
    for s in range(0, args.n_samples, batch):
        e = min(s + batch, args.n_samples)
        noise = args.noise_std * rng.standard_normal((e - s, h, w, 3)).astype(np.float32)
        imgs = np.asarray(
            render_blob_images(jnp.asarray(kp2d[s:e]), (h, w), palette, noise=jnp.asarray(noise))
        )
        imgs = ((imgs * 0.5 + 0.5) * 255.0).clip(0, 255).astype(np.uint8)
        for i in range(s, e):
            cv2.imwrite(str(out / f"{i:04d}.rgb.jpg"), imgs[i - s][..., ::-1])
            rec = {
                "sim_state": {
                    "joints": [
                        {"name": f"panda_joint{j + 1}", "position": float(angles[i, j])}
                        for j in range(robot.n_joints)
                    ]
                },
                "objects": [
                    {
                        "class": "panda_synth",
                        "keypoints": [
                            {
                                "name": n,
                                "location": [float(x) for x in kp3d_c[i, k]],
                                "projected_location": [float(x) for x in kp2d[i, k]],
                            }
                            for k, n in enumerate(DREAM_KEYPOINT_NAMES)
                        ],
                    }
                ],
            }
            (out / f"{i:04d}.json").write_text(json.dumps(rec))
    print(f"wrote {args.n_samples} DREAM-schema samples to {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

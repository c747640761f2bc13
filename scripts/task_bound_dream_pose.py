"""PnP pose-recovery BOUND for a DREAM-schema set vs decode noise.

Answers "how much of the measured pose error is geometry, not model?": run
the EXACT pose protocol `cli eval` uses (solve_rig_pnp on GT-angle FK object
points, Kabsch-aligned GT pose, all-frames PnP-ADD) but with keypoints =
stored GT projections + isotropic N(0, sigma_px) noise instead of a heatmap
decode. sigma_px=0 isolates PnP/solver conditioning; sigma_px at the
estimator's measured kp_px_err (e.g. 1.2 px on dream5_eval at 128px) gives
the floor an ideal-up-to-decode-noise model can reach on this camera
geometry. DREAM-real's angular resolution (fx/w = 0.96, RealSense 615.5/640
- reference sync/DREAM_sync.py schema ships these intrinsics per subset) is
~2x narrower-FOV than the earlier synthetic rig (0.55): perspective cues
shrink, so the SAME pixel noise costs ~2x more recovered rot/trans error.

Usage:
  python scripts/task_bound_dream_pose.py --csv data_synth/dream5_eval.csv \
      --dream-dirs data_synth/dream5_eval/panda_synth \
      --out runs/task_bound_dream5_pose.json --noise-px 0 0.5 1.2
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--csv", required=True)
    p.add_argument("--dream-dirs", nargs="+", required=True)
    p.add_argument("--image-hw", type=int, nargs=2, default=(128, 128))
    p.add_argument("--noise-px", type=float, nargs="+", default=[0.0, 0.5, 1.2])
    p.add_argument("--out", required=True)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import pandas as pd

    jax.config.update("jax_platforms", "cpu")

    from mvropose_tpu.calib.registry import load_dream_rig
    from mvropose_tpu.data import builders
    from mvropose_tpu.geometry.robots import forward_kinematics_batch
    from mvropose_tpu.geometry.rotations import kabsch, matrix_to_rodrigues
    from mvropose_tpu.pose import solve_rig_pnp
    from mvropose_tpu.train.metrics import (
        pass_rate_auc,
        pose_rotation_err_deg,
        pose_translation_err_m,
    )

    rig = load_dream_rig(args.dream_dirs)
    df = pd.read_csv(args.csv)
    ds = builders.build_dream_single_view(df, rig, tuple(args.image_hw))
    ds.with_extrinsics = True

    # Gather the whole set in one pass (bound sets are small).
    kp2d, kp3c, angles, Ks, bases = [], [], [], [], []
    for batch in ds.batches(64):
        w = batch["sample_weight"] > 0
        kp2d.append(batch["keypoints_2d"][w])
        kp3c.append(batch["keypoints_3d_cam"][w])
        angles.append(batch["angles"][w])
        Ks.append(batch["K"][w])
        bases.append(batch["base_rotation"][w])
    kp2d = jnp.asarray(np.concatenate(kp2d))        # (N, J, 2)
    kp3c = jnp.asarray(np.concatenate(kp3c))        # (N, J, 3) camera frame
    angles = jnp.asarray(np.concatenate(angles))    # (N, A)
    Ks = jnp.asarray(np.concatenate(Ks))            # (N, 3, 3)
    bases = jnp.asarray(np.concatenate(bases))      # (N, 3, 3)
    N = kp2d.shape[0]
    print(f"{N} samples")

    # GT pose per sample: Kabsch of base-rotated GT-angle FK onto the stored
    # camera-frame keypoints (identical to cli eval's pose_gt_by_alignment).
    robot = rig.robot
    fk = robot.keypoints_from_fk(forward_kinematics_batch(robot, angles))
    fk_obj = jnp.einsum("bij,bkj->bki", bases, fk)
    R_gt, t_gt = jax.vmap(kabsch)(fk_obj, kp3c)
    rv_gt = jax.vmap(matrix_to_rodrigues)(R_gt)[:, None]  # (N, 1, 3)
    tv_gt = t_gt[:, None]

    rng = np.random.default_rng(args.seed)
    keys = jax.random.split(jax.random.PRNGKey(13), N)
    solve = jax.jit(
        jax.vmap(
            lambda xy_s, c_s, ang_s, base_s, K_s, k: solve_rig_pnp(
                xy_s, c_s, ang_s, base_s, K_s, robot, key=k
            )
        )
    )

    from mvropose_tpu.geometry.rotations import rodrigues_to_matrix

    report = {
        "csv": args.csv,
        "samples": int(N),
        "protocol": "solve_rig_pnp on GT-angle FK object points; keypoints = "
                    "stored GT projections + N(0, noise_px); pose vs Kabsch GT; "
                    "all-frames PnP-ADD (failed solve = inf)",
        "bounds": [],
    }
    for sig in args.noise_px:
        noisy = kp2d + jnp.asarray(
            rng.standard_normal(kp2d.shape) * sig, jnp.float32
        )
        conf = jnp.ones(kp2d.shape[:-1], jnp.float32)
        out = solve(
            noisy[:, None], conf[:, None], angles, bases[:, None], Ks[:, None], keys
        )
        rot = np.asarray(pose_rotation_err_deg(out["rvec"], rv_gt))
        trans = np.asarray(pose_translation_err_m(out["tvec"], tv_gt))
        succ = np.asarray(out["success"]).reshape(-1)
        Rp = jax.vmap(jax.vmap(rodrigues_to_matrix))(out["rvec"])
        pts_cam = (
            jnp.einsum("bvij,bkj->bvki", Rp, fk_obj) + out["tvec"][:, :, None, :]
        )[:, 0]
        add = np.asarray(jnp.mean(jnp.linalg.norm(pts_cam - kp3c, axis=-1), axis=-1))
        add_all = np.where(succ, add, np.inf)
        row = {
            "noise_px": sig,
            "pose_success_rate": float(succ.mean()),
            "pose_rot_err_deg": float(rot[succ[:, None]].mean()),
            "pose_trans_err_m": float(trans[succ[:, None]].mean()),
            "pnp_add_pass@10cm": float((add_all <= 0.10).mean()),
            "pnp_add_auc@10cm": float(pass_rate_auc(jnp.asarray(add_all))),
        }
        report["bounds"].append(row)
        print(json.dumps(row))

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

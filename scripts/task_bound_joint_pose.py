"""JOINT (pose, angles) estimation bounds for a DREAM-schema set.

scripts/task_bound_dream_pose.py bounds the GT-ANGLES protocol (PnP with the
robot's measured joint states). The pred-angle protocol estimates pose AND
angles from the image alone, which is a strictly harder problem: this script
measures its ladder of floors with the production estimator
(pose/refine.py::refine_rig_pose_angles), all on keypoints = stored GT
projections + N(0, sigma_px):

  gt_angle_floor    solve_rig_pnp on GT-angle FK object points - the known-
                    joint-states deployment regime (same row the other script
                    emits; repeated here so one artifact carries the ladder).
  oracle_joint      refinement initialized AND prior-centered at the truth:
                    the local maximum-likelihood estimator of the joint
                    problem. No pred-angle pipeline can beat this - the gap
                    to gt_angle_floor is the PRICE OF NOT KNOWING THE ANGLES,
                    an information limit, not model or optimizer slack.
  pred_pipeline     the shipped serve chain: PnP on FK(perturbed angles) ->
                    multi-start joint refinement with the perturbed angles as
                    prior (sigma_prior = the angle head's measured MAE).

Pose rot/trans are reported BOTH raw and as the gauge-invariant camera-frame
ADD protocol (pass@10cm / AUC): rotating the arm about the base joint-1 axis
while counter-rotating the camera is an exact reprojection symmetry, so raw
rot error unavoidably contains the prior's joint-1 error while ADD does not
(tests/test_refine.py pins this decomposition).

Usage:
  python scripts/task_bound_joint_pose.py --csv data_synth/dream256_eval.csv \
      --dream-dirs data_synth/dream256_eval/panda_synth --image-hw 256 256 \
      --noise-px 1.2 --sigma-prior 0.2 --out runs/task_bound_joint256.json
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
    p.add_argument("--noise-px", type=float, default=1.2)
    p.add_argument("--sigma-prior", type=float, default=0.2,
                   help="angle-prior std in radians; set to the angle head's "
                        "measured MAE (the perturbation uses the same value, "
                        "so the prior is calibrated)")
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
    from mvropose_tpu.geometry.rotations import (
        kabsch,
        matrix_to_rodrigues,
        rodrigues_to_matrix,
    )
    from mvropose_tpu.pose import refine_rig_pose_angles, solve_rig_pnp
    from mvropose_tpu.train.metrics import (
        pass_rate_auc,
        pose_rotation_err_deg,
        pose_translation_err_m,
    )

    rig = load_dream_rig(args.dream_dirs)
    df = pd.read_csv(args.csv)
    ds = builders.build_dream_single_view(df, rig, tuple(args.image_hw))
    ds.with_extrinsics = True
    kp2d, kp3c, angles, Ks, bases = [], [], [], [], []
    for batch in ds.batches(64):
        w = batch["sample_weight"] > 0
        kp2d.append(batch["keypoints_2d"][w])
        kp3c.append(batch["keypoints_3d_cam"][w])
        angles.append(batch["angles"][w])
        Ks.append(batch["K"][w])
        bases.append(batch["base_rotation"][w])
    kp2d = jnp.asarray(np.concatenate(kp2d))
    kp3c = jnp.asarray(np.concatenate(kp3c))
    angles = jnp.asarray(np.concatenate(angles))
    Ks = jnp.asarray(np.concatenate(Ks))
    bases = jnp.asarray(np.concatenate(bases))
    robot = rig.robot
    N = kp2d.shape[0]
    print(f"{N} samples")

    fk = robot.keypoints_from_fk(forward_kinematics_batch(robot, angles))
    fk_obj = jnp.einsum("bij,bkj->bki", bases, fk)
    R_gt, t_gt = jax.vmap(kabsch)(fk_obj, kp3c)
    rv_gt = jax.vmap(matrix_to_rodrigues)(R_gt)[:, None]
    tv_gt = t_gt[:, None]

    rng = np.random.default_rng(args.seed)
    noisy = kp2d + jnp.asarray(
        rng.standard_normal(kp2d.shape) * args.noise_px, jnp.float32
    )
    pred = angles + jnp.asarray(
        rng.standard_normal(angles.shape) * args.sigma_prior, jnp.float32
    )
    conf = jnp.ones(kp2d.shape[:-1], jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(13), N)
    solve = jax.jit(jax.vmap(
        lambda xy, c, a, b, K, k: solve_rig_pnp(xy, c, a, b, K, robot, key=k)))

    def row(rvec, tvec, theta, succ=None):
        """rot/trans vs Kabsch GT + gauge-invariant all-frames PnP-ADD."""
        rot = np.asarray(pose_rotation_err_deg(rvec[:, None], rv_gt)).reshape(-1)
        trans = np.asarray(pose_translation_err_m(tvec[:, None], tv_gt)).reshape(-1)
        fk_t = robot.keypoints_from_fk(forward_kinematics_batch(robot, theta))
        obj = jnp.einsum("bij,bkj->bki", bases, fk_t)
        Rp = jax.vmap(rodrigues_to_matrix)(rvec)
        pts = jnp.einsum("bij,bkj->bki", Rp, obj) + tvec[:, None]
        add = np.asarray(jnp.mean(jnp.linalg.norm(pts - kp3c, axis=-1), axis=-1))
        ok = np.ones(N, bool) if succ is None else np.asarray(succ).reshape(-1)
        add_all = np.where(ok, add, np.inf)
        return {
            "pose_rot_err_deg": float(rot[ok].mean()),
            "pose_rot_err_deg_median": float(np.median(rot[ok])),
            "pose_trans_err_m": float(trans[ok].mean()),
            "pnp_add_pass@10cm": float((add_all <= 0.10).mean()),
            "pnp_add_auc@10cm": float(pass_rate_auc(jnp.asarray(add_all))),
            "success_rate": float(ok.mean()),
        }

    report = {
        "csv": args.csv, "samples": int(N), "noise_px": args.noise_px,
        "sigma_prior_rad": args.sigma_prior,
        "protocol": "keypoints = stored GT projections + N(0, noise_px); "
                    "pose vs Kabsch GT; ADD protocol is gauge-invariant "
                    "(see module docstring)",
    }

    out = solve(noisy[:, None], conf[:, None], angles, bases[:, None],
                Ks[:, None], keys)
    report["gt_angle_floor"] = row(
        out["rvec"][:, 0], out["tvec"][:, 0], angles, out["success"])

    ref = jax.jit(jax.vmap(
        lambda xy, c, prior, rv0, tv0, b, K, k: refine_rig_pose_angles(
            xy[None], c[None], prior, rv0[None], tv0[None], b[None], K[None],
            robot, k, sigma_px=args.noise_px, sigma_prior=args.sigma_prior,
        )))
    rkeys = jax.random.split(jax.random.PRNGKey(7), N)

    orc = ref(noisy, conf, angles, rv_gt[:, 0], tv_gt[:, 0], bases, Ks, rkeys)
    report["oracle_joint"] = row(orc["rvec"][:, 0], orc["tvec"][:, 0], orc["angles"])

    init = solve(noisy[:, None], conf[:, None], pred, bases[:, None],
                 Ks[:, None], keys)
    report["pred_pnp_init"] = row(
        init["rvec"][:, 0], init["tvec"][:, 0], pred, init["success"])
    pipe = ref(noisy, conf, pred, init["rvec"][:, 0], init["tvec"][:, 0],
               bases, Ks, rkeys)
    report["pred_pipeline"] = row(pipe["rvec"][:, 0], pipe["tvec"][:, 0],
                                  pipe["angles"])
    report["pred_pipeline"]["refined_angle_mae_rad"] = float(
        jnp.abs(pipe["angles"] - angles).mean())

    for k in ("gt_angle_floor", "oracle_joint", "pred_pnp_init", "pred_pipeline"):
        print(k, json.dumps(report[k]))
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

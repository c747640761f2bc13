"""Multi-view angle-estimation task bounds: MLPs on EXACT geometry.

PARITY.md's single-view dissection bounds what any image model can achieve by
training an MLP on the exact GT keypoints. This script computes the
*multi-view* counterparts on the same synthetic rig, bounding the
geometric3d head (runs/synth_mv_tri):

  2d   : exact per-view 2D keypoints, concatenated     (what `geometric` sees)
  tri3d: exact 3D points DLT-triangulated from exact 2D (what the DLT branch adds)
  fk3d : exact FK 3D joint positions                    (oracle 3D -> pure IK bound)

All three share the MLP architecture/width/optimizer of GeometricAngleHead
so the comparison isolates the INPUT featurization, not capacity. Angles are
sampled exactly as the training harness samples them (uniform
+-0.6 * 90 deg, FR5 degrees).

Usage: python scripts/task_bound_mv.py --views 4 --steps 10000 --out runs/task_bound_mv.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--views", type=int, default=4)
    p.add_argument("--robot", default="fr5",
                   help="registry name; the bound uses the robot's keypoint "
                        "set (e.g. dream_panda's 7 named links) and angle unit")
    p.add_argument("--steps", type=int, default=10000)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--hidden", type=int, default=256)
    p.add_argument("--depth", type=int, default=3)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--image-size", type=int, default=128)
    p.add_argument("--noise-px", type=float, default=0.0,
                   help="N(0, noise_px) heatmap-pixel noise added to the 2D "
                        "keypoints before featurization/triangulation - the "
                        "decode-noise-aware bound. At this rig (f=0.55*W, "
                        "1.6 m) one image px ~ 2.3 cm in 3D, so j4/j5 "
                        "(0.26/0.18 cm per deg) are noise-limited long "
                        "before the exact bound.")
    p.add_argument("--noise-file", default=None,
                   help=".npy of measured decode residuals (N, J, 2) in "
                        "IMAGE px (train_synthetic.py writes "
                        "workdir/decode_residuals.npy at final eval). "
                        "Sampled with replacement per (sample, view, "
                        "keypoint) - the bound under the estimator's REAL "
                        "error distribution (heavy tails, per-keypoint "
                        "structure) instead of an isotropic Gaussian. "
                        "Overrides --noise-px.")
    p.add_argument("--variants", nargs="+", default=["2d", "tri3d", "fk3d"],
                   choices=["2d", "tri3d", "fk3d"],
                   help="subset to run (fk3d is noise-independent)")
    p.add_argument("--out", default="runs/task_bound_mv.json")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (the env-var override is "
                        "ignored under the axon sitecustomize)")
    args = p.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    import flax.linen as nn
    import optax

    from mvropose_tpu.data.synthetic import make_rig, rig_tuple
    from mvropose_tpu.geometry.robots import forward_kinematics, get_robot
    from mvropose_tpu.geometry.camera import project_points
    from mvropose_tpu.geometry.triangulation import (
        heatmap_projection_matrices,
        triangulate_keypoints,
    )

    robot = get_robot(args.robot)
    # Angle sampling range: +-0.6 * quarter-turn in the robot's native unit
    # (matches the synthetic harness / make_dream_synthetic angle_scale 0.6).
    half = 0.6 * (90.0 if robot.angle_unit == "deg" else np.pi / 2.0)
    to_deg = 1.0 if robot.angle_unit == "deg" else 180.0 / np.pi
    V = args.views
    S = args.image_size
    hm = S // 2
    rig = make_rig(n_views=V, image_hw=(S, S))
    K, rvecs, tvecs = rig_tuple(rig)
    projs = heatmap_projection_matrices(rvecs, tvecs, K, (S, S), (hm, hm))

    noise_pool = None
    if args.noise_file:
        # Measured residuals arrive in image px; the featurization works in
        # heatmap px. Drop non-finite rows (masked/failed decodes).
        pool = np.load(args.noise_file).astype(np.float32) * (hm / S)
        pool = pool[np.isfinite(pool).all(axis=(1, 2))]
        assert pool.shape[1] == robot.n_keypoints, (
            f"noise pool has {pool.shape[1]} keypoints, robot expects "
            f"{robot.n_keypoints}"
        )
        noise_pool = jnp.asarray(pool)
        print(f"noise pool: {pool.shape[0]} samples, per-kp rms (hm px) "
              f"{np.sqrt((pool ** 2).mean(axis=(0, 2))).round(2).tolist()}")

    def features(key, n, variant):
        """angles + the requested exact featurization, all on device.

        Featurization is gated per variant so the '2d' and 'fk3d' bounds do
        not pay the per-keypoint SVD triangulation cost they never use.
        """
        k_ang, k_noise = jax.random.split(key)
        angles = jax.random.uniform(
            k_ang, (n, robot.n_joints), minval=-half, maxval=half
        ).astype(jnp.float32)
        kp3d = jax.vmap(
            lambda a: robot.keypoints_from_fk(forward_kinematics(robot, a))
        )(angles)  # (B, J, 3)

        def proj_view(rv, tv):
            return jax.vmap(lambda pts: project_points(pts, rv, tv, K, None))(kp3d)

        kp2d = jnp.transpose(jax.vmap(proj_view)(rvecs, tvecs), (1, 0, 2, 3))  # (B,V,J,2)
        kp2d_hm = kp2d * (hm / S)
        if noise_pool is not None:
            J = kp2d_hm.shape[2]
            idx = jax.random.randint(
                k_noise, (n, kp2d_hm.shape[1], J), 0, noise_pool.shape[0]
            )
            kp2d_hm = kp2d_hm + noise_pool[idx, jnp.arange(J)[None, None, :]]
        elif args.noise_px > 0:
            kp2d_hm = kp2d_hm + args.noise_px * jax.random.normal(
                k_noise, kp2d_hm.shape
            )
        if variant == "2d":
            feat = kp2d_hm.reshape(n, -1) / hm  # normalized, like the head
        elif variant == "tri3d":
            w = jnp.ones(kp2d_hm.shape[:-1], jnp.float32)
            tri = jax.vmap(lambda xy, wt: triangulate_keypoints(xy, projs, wt))(
                kp2d_hm, w
            )
            feat = jnp.concatenate(
                [kp2d_hm.reshape(n, -1) / hm, tri.reshape(n, -1)], axis=-1
            )
        else:  # fk3d
            feat = kp3d.reshape(n, -1)
        return angles, feat

    class MLP(nn.Module):
        @nn.compact
        def __call__(self, x):
            for i in range(args.depth):
                x = nn.gelu(nn.Dense(args.hidden, name=f"fc{i}")(x))
            return nn.Dense(robot.n_joints, name="out")(x)

    features_j = jax.jit(features, static_argnums=(1, 2))
    results = {}
    for variant in args.variants:
        model = MLP()
        a0, f0 = features_j(jax.random.PRNGKey(0), 8, variant)
        params = model.init(jax.random.PRNGKey(1), f0)
        tx = optax.adam(args.lr)
        opt = tx.init(params)

        @jax.jit
        def step(params, opt, x, y):
            def loss(p):
                return jnp.mean(optax.huber_loss(model.apply(p, x), y))

            l, g = jax.value_and_grad(loss)(params)
            up, opt = tx.update(g, opt, params)
            return optax.apply_updates(params, up), opt, l

        t0 = time.time()
        key = jax.random.PRNGKey(7)
        for i in range(args.steps):
            key, bk = jax.random.split(key)
            ang, fts = features_j(bk, args.batch, variant)
            params, opt, l = step(params, opt, fts, ang)
        ang_te, fts_te = features_j(jax.random.PRNGKey(999_999), 2048, variant)  # held out
        pred = model.apply(params, fts_te)
        mae = np.asarray(jnp.mean(jnp.abs(pred - ang_te), axis=0)) * to_deg
        results[variant] = {
            "per_joint_mae_deg": mae.round(2).tolist(),
            "mae_deg": float(mae.mean().round(3)),
            "wall_s": round(time.time() - t0, 1),
        }
        print(variant, json.dumps(results[variant]), flush=True)

    results.update(
        views=V, steps=args.steps, batch=args.batch, hidden=args.hidden,
        depth=args.depth, image_size=S, backend=jax.default_backend(),
        robot=robot.name,
    )
    if noise_pool is not None:
        results["noise_file"] = args.noise_file
        results["noise_pool_rms_hm_px"] = [
            round(float(v), 3)
            for v in np.sqrt((np.asarray(noise_pool) ** 2).mean(axis=(0, 2)))
        ]
    elif args.noise_px > 0:
        results["noise_px"] = args.noise_px
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps(results, indent=2))
    print("FINAL", json.dumps(results))


if __name__ == "__main__":
    main()

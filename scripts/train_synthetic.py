"""Convergence-evidence runs on framework-rendered synthetic data.

Trains the single-view and multi-view estimators on data rendered by
mvropose_tpu.data.synthetic (FK -> projection -> colored joint blobs) and
commits PCK/ADD/angle-MAE numbers. This is the accuracy counterpart of the
reference's loss-curve evidence (/root/reference/model/Fr5_model_train.ipynb
cell 13, Franka_research3_model_train.ipynb cell 7 outputs), made
reproducible: the data generator lives in-repo, streams fresh batches every
step (so the reported PCK is *held-out* accuracy, not overfit recall), and
the whole run takes minutes on one TPU chip.

The backbone is a small trainable ViT (no pretrained weights exist offline;
TrainConfig.freeze_backbone=False). Everything else is the production stack:
the same estimators, train steps, optimizer groups, decode and metrics that
`cli train` wires.

Usage:
  python scripts/train_synthetic.py --mode single --steps 1500 --workdir runs/synth_sv
  python scripts/train_synthetic.py --mode multi  --steps 1500 --workdir runs/synth_mv
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


def build_model(mode: str, robot, image_size: int, on_tpu: bool, angle_head: str = "query",
                n_views: int = 4,
                freeze_backbone: bool = False, with_layerscale: bool = False,
                extra_keypoints: int = 0):
    from mvropose_tpu.models import (
        EstimatorConfig,
        MultiViewPoseEstimator,
        SingleViewPoseEstimator,
    )
    from mvropose_tpu.models.vit import ViTConfig

    vit = ViTConfig(
        image_size=image_size,
        patch_size=16,
        hidden_size=192,
        num_layers=4,
        num_heads=4,
        # DINO checkpoints carry LayerScale params; the graft validates tree
        # structure, so the config must host them when converting one.
        layerscale_init=1e-5 if with_layerscale else None,
        dtype="bfloat16" if on_tpu else "float32",
    )
    cfg = EstimatorConfig(
        vit=vit,
        num_joints=robot.n_keypoints + extra_keypoints,
        num_angles=robot.n_joints,
        heatmap_size=(image_size // 2, image_size // 2),
        # nn.Embed returns NaN rows for out-of-range ids under jit, so the
        # view-embedding table must cover every requested view.
        max_views=max(4, n_views),
        num_fusion_queries=8,
        num_angle_queries=4,
        freeze_backbone=freeze_backbone,
        dtype=vit.dtype,
        angle_head=angle_head,
    )
    model = (SingleViewPoseEstimator if mode == "single" else MultiViewPoseEstimator)(cfg)
    return model, cfg


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=("single", "multi"), default="single")
    p.add_argument("--robot", default="fr5")
    p.add_argument("--steps", type=int, default=1500)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--dataset-size", type=int, default=0,
                   help="finite train pool size (0 = infinite stream). The "
                   "reference's regime is a finite capture set iterated for "
                   "many epochs (DREAM_Train.py:756: 14k images x 100 epochs); "
                   "a finite pool is what lets the angle head converge.")
    p.add_argument("--lr-ang", type=float, default=None,
                   help="angle-group lr (defaults to --lr)")
    p.add_argument("--angle-head", choices=("query", "geometric", "geometric3d"),
                   default="query",
                   help="geometric = soft-argmax of predicted heatmaps -> MLP "
                        "(beyond-reference head; see models.GeometricAngleHead); "
                        "geometric3d (multi mode) adds the differentiable-DLT "
                        "triangulated-3D branch")
    p.add_argument("--fk-loss-weight", type=float, default=0.0,
                   help="differentiable FK-consistency loss weight (single "
                        "mode): puts the angle gradient in keypoint-pixel "
                        "space, which conditions the weakly-observable "
                        "joints far better than the huber angle loss alone")
    p.add_argument("--freeze-backbone", action="store_true",
                   help="the reference's actual training regime: frozen "
                        "backbone, heads-only optimization "
                        "(DREAM_Train.py:133-142 requires_grad=False). The "
                        "backbone is a random-init ViT unless --backbone-ckpt "
                        "grafts converted weights.")
    p.add_argument("--backbone-ckpt", default=None,
                   help="graft a converted DINO checkpoint (.npz/.pth, timm "
                        "or HF naming) into the backbone before training - "
                        "exercises models.dino_convert in the training path")
    p.add_argument("--render", choices=("blob", "link"), default="blob",
                   help="blob: joint-origin dots (minimal task). link: full "
                        "link segments + an oriented tool marker whose tip "
                        "joins the keypoint set - makes the wrist roll "
                        "observable, as on real captures (the regime the "
                        "PARITY observability caveat is about)")
    p.add_argument("--views", type=int, default=3)
    p.add_argument("--image-size", type=int, default=128)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--eval-every", type=int, default=100)
    p.add_argument("--eval-batches", type=int, default=4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--workdir", default="runs/synth_sv")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (the env-var override is "
                        "ignored under the axon sitecustomize)")
    args = p.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    on_tpu = jax.default_backend() != "cpu"

    from mvropose_tpu.data.synthetic import (
        make_rig,
        rig_tuple,
        single_view_batch,
        synthesize_multiview_batch,
    )
    from mvropose_tpu.geometry.heatmap import argmax_decode
    from mvropose_tpu.geometry.robots import forward_kinematics, get_robot
    from mvropose_tpu.train import (
        TrainConfig,
        add_auc,
        add_metric,
        angle_mae,
        create_train_state,
        make_multi_view_train_step,
        make_single_view_train_step,
        pck_at_k,
    )
    from mvropose_tpu.utils.metrics_writer import MetricWriter

    robot = get_robot(args.robot)
    assert not (args.render == "link" and args.fk_loss_weight > 0), \
        "FK-consistency loss projects the J-joint chain; link mode adds a keypoint"
    assert not (robot.keypoint_fk_indices is not None and args.fk_loss_weight > 0), (
        "FK-consistency loss projects the full FK chain, but this robot's "
        "keypoint set is a subset of chain origins (keypoint_fk_indices); "
        "the projected points would not align with keypoints_2d"
    )
    single = args.mode == "single"
    V = 1 if single else args.views
    rig = make_rig(n_views=max(V, 1), image_hw=(args.image_size, args.image_size))
    rig_arrs = rig_tuple(rig)
    hm = args.image_size // 2

    def make_batch_sized(key, n):
        mv = synthesize_multiview_batch(
            robot, rig_arrs, key, n,
            image_hw=(args.image_size, args.image_size), heatmap_hw=(hm, hm),
            render=args.render,
        )
        b = single_view_batch(mv) if single else mv
        if single and args.fk_loss_weight > 0:
            # Per-sample camera/extrinsic fields for the differentiable
            # FK-consistency loss (same rig arrays the renderer projected
            # through; no base rotation in the synthetic world frame).
            K_rig, rv_rig, tv_rig = rig_arrs
            Km = K_rig if K_rig.ndim == 2 else K_rig[0]
            b["rvec"] = jnp.tile(rv_rig[0][None], (n, 1))
            b["tvec"] = jnp.tile(tv_rig[0][None], (n, 1))
            b["K"] = jnp.tile(Km[None], (n, 1, 1))
            b["base_rotation"] = jnp.tile(jnp.eye(3)[None], (n, 1, 1))
        return b

    def make_batch(key):
        return make_batch_sized(key, args.batch)

    # Finite train pool (the reference's regime): pregenerate once on device,
    # then each step gathers a random batch by index - still zero host IO.
    pool = None
    if args.dataset_size > 0:
        chunk = min(args.dataset_size, 256)
        sizes = [chunk] * (args.dataset_size // chunk)
        if args.dataset_size % chunk:
            sizes.append(args.dataset_size % chunk)
        chunks = [
            make_batch_sized(jax.random.PRNGKey(50_000 + i), n)
            for i, n in enumerate(sizes)
        ]
        pool = jax.tree_util.tree_map(lambda *xs: jnp.concatenate(xs), *chunks)

        # Pool is an ARGUMENT, not a closure: closed-over device arrays get
        # embedded as constants in the lowered program, which blows past the
        # remote-compile request size limit on the tunneled TPU (HTTP 413).
        @jax.jit
        def draw(pool, key):
            idx = jax.random.randint(key, (args.batch,), 0, args.dataset_size)
            return jax.tree_util.tree_map(lambda x: jnp.take(x, idx, axis=0), pool)

    model, ecfg = build_model(
        args.mode, robot, args.image_size, on_tpu, args.angle_head,
        n_views=V,
        freeze_backbone=args.freeze_backbone,
        with_layerscale=args.backbone_ckpt is not None,
        extra_keypoints=1 if args.render == "link" else 0,
    )
    tcfg = TrainConfig(
        num_epochs=1,
        steps_per_epoch=args.steps,
        lr_kpt=args.lr,
        lr_ang=args.lr_ang if args.lr_ang is not None else args.lr,
        loss_weight_kpt=100.0,
        loss_weight_fk=args.fk_loss_weight,
        freeze_backbone=args.freeze_backbone,
    )

    key = jax.random.PRNGKey(args.seed)
    init_batch = make_batch(jax.random.PRNGKey(10_000))
    # Init on the host CPU backend: the remote-TPU compile of a full init
    # graph costs minutes through the tunnel and contributes nothing (same
    # trick as bench.py, but with REAL random init, then one H2D transfer).
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        if single:
            init_imgs = jnp.zeros((1, args.image_size, args.image_size, 3), jnp.float32)
            variables = model.init(jax.random.PRNGKey(1), init_imgs)
        else:
            init_imgs = jnp.zeros((1, V, args.image_size, args.image_size, 3), jnp.float32)
            variables = model.init(
                jax.random.PRNGKey(1), init_imgs,
                jnp.zeros((1, V), jnp.int32), jnp.ones((1, V), bool),
                proj_mats=jnp.zeros((1, V, 3, 4), jnp.float32),
            )
    if args.backbone_ckpt:
        from mvropose_tpu.cli.main import _graft_backbone_ckpt

        variables = _graft_backbone_ckpt(variables, args.backbone_ckpt, ecfg.vit)
        print(f"grafted backbone weights from {args.backbone_ckpt}", flush=True)
    variables = jax.device_put(variables, jax.devices()[0])
    frozen_backbone_init = (
        jax.tree_util.tree_map(np.asarray, variables["params"]["backbone"])
        if args.freeze_backbone else None
    )
    train_step = (
        make_single_view_train_step(tcfg, robot=robot)
        if single else make_multi_view_train_step(tcfg)
    )
    state = create_train_state(model, variables, tcfg)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
    print(f"init done ({n_params/1e6:.2f}M params), building eval pool...", flush=True)

    # Held-out eval pool: seeds disjoint from the training stream.
    eval_batches = [
        make_batch(jax.random.PRNGKey(20_000 + i)) for i in range(args.eval_batches)
    ]

    @jax.jit
    def eval_metrics(state, batch):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        if single:
            pred_hm, pred_ang = state.apply_fn(variables, batch["images"])
        else:
            pred_hm, pred_ang = state.apply_fn(
                variables, batch["images"], batch["view_ids"], batch["view_mask"],
                proj_mats=batch.get("proj_mats"),
            )
        pred_xy, _ = argmax_decode(pred_hm)
        scale = args.image_size / hm  # heatmap px -> image px
        gt_xy = batch["keypoints_2d"]
        pck5 = pck_at_k(pred_xy * scale, gt_xy, k_px=5.0)
        pck2 = pck_at_k(pred_xy * scale, gt_xy, k_px=2.0 + scale)  # quantization-aware tight PCK
        fk_pred = jax.vmap(lambda a: forward_kinematics(robot, a))(pred_ang)
        # Robots whose keypoint set is a subset of chain origins (DREAM
        # panda) compare on that subset; the full chain would shape-mismatch.
        fk_pred = robot.keypoints_from_fk(fk_pred)
        # In link mode the GT keypoint set carries the extra tool-marker tip;
        # ADD compares the FK chain (joint origins) only.
        gt3 = batch["keypoints_3d"][..., : fk_pred.shape[-2], :]
        add_m = add_metric(fk_pred, gt3)
        auc = add_auc(fk_pred, gt3, max_threshold_m=0.10)
        mae = angle_mae(pred_ang, batch["angles"])
        # Per-joint MAE: FR5 joint 6 is a pure wrist roll that moves NO
        # joint-origin keypoint (FK jacobian column is exactly zero), so it
        # is information-theoretically unlearnable from blob keypoints and
        # pins the aggregate MAE; joints 4-5 are ~10x less keypoint-
        # sensitive than 1-3. Reporting per joint separates "didn't learn"
        # from "cannot be learned from this rendering".
        mae_per = jnp.mean(jnp.abs(pred_ang - batch["angles"]), axis=0)
        out = {"pck5": pck5, "pck_tight": pck2, "add_m": add_m,
               "add_auc_10cm": auc, "angle_mae": mae,
               "angle_mae_per_joint": mae_per}
        if not single:
            # Triangulated ADD: decoded 2D keypoints from all views -> DLT
            # triangulation through the rig's calibrated extrinsics -> 3D
            # skeleton vs GT FK points. Proves the full L7 geometry path
            # (decode + calibration + triangulation) numerically - with
            # PCK ~= 1 this lands at millimeters.
            from mvropose_tpu.geometry.triangulation import (
                projection_matrix,
                triangulate_keypoints,
            )

            K_rig, rv_rig, tv_rig = rig_arrs
            projs = jax.vmap(lambda r, t: projection_matrix(r, t, K_rig))(rv_rig, tv_rig)
            w = jnp.ones(pred_xy.shape[:-1], jnp.float32)  # (B, V, J)
            tri = jax.vmap(lambda xy_b, w_b: triangulate_keypoints(xy_b, projs, w_b))(
                pred_xy * scale, w
            )  # (B, J, 3)
            out["triangulated_add_m"] = add_metric(tri, batch["keypoints_3d"])
        return out

    def run_eval(state, batches=None):
        # `batches or eval_batches` would silently swap in the held-out pool
        # for an empty train-pool list and mislabel the numbers.
        batches = eval_batches if batches is None else batches
        if not batches:
            raise ValueError("run_eval called with an empty batch list")
        ms = [eval_metrics(state, b) for b in batches]
        out = {}
        for k in ms[0]:
            avg = np.mean(np.stack([np.asarray(m[k]) for m in ms]), axis=0)
            out[k] = avg.round(4).tolist() if avg.ndim else float(avg)
        return out

    workdir = Path(args.workdir)
    workdir.mkdir(parents=True, exist_ok=True)
    writer = MetricWriter(workdir / "logs")

    print(
        f"mode={args.mode} robot={robot.name} backend={jax.default_backend()} "
        f"params={n_params/1e6:.2f}M batch={args.batch} views={V} "
        f"img={args.image_size} steps={args.steps}",
        flush=True,
    )

    t0 = time.time()
    samples = 0
    for step_i in range(args.steps):
        key, bk, sk = jax.random.split(key, 3)
        batch = draw(pool, bk) if pool is not None else make_batch(bk)
        state, m = train_step(state, batch, sk)
        samples += args.batch
        if (step_i + 1) % args.eval_every == 0 or step_i == 0:
            ev = run_eval(state)
            rec = {
                "step": step_i + 1,
                "loss": float(m["loss"]),
                "loss_kpt": float(m["loss_kpt"]),
                "loss_ang": float(m["loss_ang"]),
                "samples_per_sec": samples / (time.time() - t0),
                **ev,
            }
            writer.write(step_i + 1, rec)
            print(json.dumps(rec), flush=True)

    final = run_eval(state)
    if frozen_backbone_init is not None:
        # The regime's invariant, asserted on the actual run (not just the
        # unit test): the frozen backbone's params are bit-identical after
        # `steps` optimizer updates through the set_to_zero group.
        drift = jax.tree_util.tree_map(
            lambda a, b: float(np.max(np.abs(np.asarray(a) - b))),
            state.params["backbone"], frozen_backbone_init,
        )
        max_drift = max(jax.tree_util.tree_leaves(drift))
        assert max_drift == 0.0, f"frozen backbone drifted: {max_drift}"
        final["frozen_backbone"] = True
        final["frozen_backbone_max_drift"] = max_drift
        final["backbone_ckpt"] = args.backbone_ckpt

    # 6D camera-pose recovery error: the headline capability the reference
    # only ever eyeballed (Fr5_model_train.ipynb cell 14 reprojection
    # overlays). Decoded predicted heatmaps + FK(predicted angles) ->
    # RANSAC PnP per view, scored against the rig's GT extrinsics; the
    # gt-angles variant isolates the decode+PnP geometry path from
    # angle-head error.
    from mvropose_tpu.pose import recover_pose_batch
    from mvropose_tpu.train import pose_rotation_err_deg, pose_translation_err_m

    K_rig, rv_rig, tv_rig = rig_arrs
    eye_base = jnp.tile(jnp.eye(3, dtype=jnp.float32)[None], (V, 1, 1))
    Ks = jnp.tile(K_rig[None], (V, 1, 1))

    def pose_eval(batches, use_gt_angles):
        rots, trans, succ = [], [], []
        for b in batches:
            variables_ = {"params": state.params, "batch_stats": state.batch_stats}
            if single:
                hm_b, ang_b = state.apply_fn(variables_, b["images"])
                hm_b = hm_b[:, None]  # (B, 1, J, Hm, Wm)
            else:
                hm_b, ang_b = state.apply_fn(
                    variables_, b["images"], b["view_ids"], b["view_mask"],
                    proj_mats=b.get("proj_mats"),
                )
            angles_b = b["angles"] if use_gt_angles else ang_b
            # PnP object points are the FK chain: drop any extra keypoint
            # channels (link mode's tool-marker tip).
            hm_b = hm_b[:, :, : robot.n_keypoints]
            out = jax.vmap(
                lambda hm_s, ang_s, k: recover_pose_batch(
                    hm_s, ang_s, eye_base[: hm_b.shape[1]], Ks[: hm_b.shape[1]],
                    robot, (args.image_size, args.image_size),
                    key=k, decode_mode="refine",
                )
            )(hm_b, angles_b, jax.random.split(jax.random.PRNGKey(3), hm_b.shape[0]))
            gt_rv = rv_rig[None, : hm_b.shape[1]]
            gt_tv = tv_rig[None, : hm_b.shape[1]]
            rots.append(np.asarray(pose_rotation_err_deg(out["rvec"], gt_rv)).ravel())
            trans.append(np.asarray(pose_translation_err_m(out["tvec"], gt_tv)).ravel())
            succ.append(np.asarray(out["success"]).ravel())
        ok = np.concatenate(succ) > 0
        r, t = np.concatenate(rots), np.concatenate(trans)
        # Errors are reported over SUCCESSFUL recoveries (failed PnP returns
        # sentinel values); success_rate carries the failure information.
        return {
            "rot_err_deg": float(r[ok].mean()) if ok.any() else None,
            "trans_err_m": float(t[ok].mean()) if ok.any() else None,
            "success_rate": float(ok.mean()),
        }

    # Decode-error residual pool: refined-decode (pred - GT) per keypoint on
    # the held-out batches, in IMAGE px. This is the estimator's MEASURED
    # decode-noise distribution - task_bound_mv.py --noise-file feeds it to
    # the exact-geometry MLP bounds so "j5 sits at the decode-noise floor"
    # is testable against the model's real (heavy-tailed, per-keypoint)
    # errors instead of an isotropic Gaussian.
    from mvropose_tpu.decode import decode_keypoints as _decode_kp

    res = []
    for b in eval_batches:
        variables_ = {"params": state.params, "batch_stats": state.batch_stats}
        if single:
            hm_b, _ = state.apply_fn(variables_, b["images"])
            hm_b, gt = hm_b[:, None], b["keypoints_2d"][:, None]
        else:
            hm_b, _ = state.apply_fn(
                variables_, b["images"], b["view_ids"], b["view_mask"],
                proj_mats=b.get("proj_mats"),
            )
            gt = b["keypoints_2d"]
        xy, _ = jax.vmap(
            lambda h: _decode_kp(
                h, image_hw=(args.image_size, args.image_size), mode="refine"
            )
        )(hm_b)
        res.append(np.asarray(xy - gt).reshape(-1, gt.shape[-2], 2))
    np.save(workdir / "decode_residuals.npy", np.concatenate(res))

    pe = pose_eval(eval_batches, use_gt_angles=False)
    pe_gt = pose_eval(eval_batches, use_gt_angles=True)
    final["pose_rot_err_deg"] = pe["rot_err_deg"]
    final["pose_trans_err_m"] = pe["trans_err_m"]
    final["pose_success_rate"] = pe["success_rate"]
    final["pose_rot_err_deg_gt_angles"] = pe_gt["rot_err_deg"]
    final["pose_trans_err_m_gt_angles"] = pe_gt["trans_err_m"]

    if pool is not None:
        # Train-pool accuracy (the regime the reference reports: metrics on
        # the finite capture set it trains on), prefixed to keep the held-out
        # numbers unambiguous.
        pool_batches = [
            jax.tree_util.tree_map(
                lambda x: x[i * args.batch : (i + 1) * args.batch], pool
            )
            for i in range(min(args.eval_batches, args.dataset_size // args.batch))
        ]
        if pool_batches:  # pool smaller than one batch -> no trainset metrics
            final.update(
                {f"trainset_{k}": v for k, v in run_eval(state, pool_batches).items()}
            )
        final["dataset_size"] = args.dataset_size
    final.update(
        mode=args.mode,
        robot=robot.name,
        steps=args.steps,
        batch=args.batch,
        views=V,
        image_size=args.image_size,
        params_m=round(n_params / 1e6, 3),
        backend=jax.default_backend(),
        wall_s=round(time.time() - t0, 1),
        train_samples_per_sec=round(samples / (time.time() - t0), 1),
        held_out=True,
    )
    (workdir / "final_metrics.json").write_text(json.dumps(final, indent=2))
    print("FINAL " + json.dumps(final), flush=True)

    # Qualitative panel: pred-vs-GT keypoints on the first eval images.
    try:
        from mvropose_tpu.utils.viz import prediction_panel

        b = eval_batches[0]
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        if single:
            pred_hm, _ = state.apply_fn(variables, b["images"][:4])
            imgs, gts, hms = b["images"][:4], b["heatmaps"][:4], pred_hm
        else:
            pred_hm, _ = state.apply_fn(
                variables, b["images"][:4], b["view_ids"][:4], b["view_mask"][:4],
                proj_mats=None if b.get("proj_mats") is None else b["proj_mats"][:4],
            )
            imgs, gts, hms = b["images"][:4, 0], b["heatmaps"][:4, 0], pred_hm[:, 0]
        panel = np.vstack([
            prediction_panel(np.asarray(imgs[i]), np.asarray(gts[i]), np.asarray(hms[i]))
            for i in range(4)
        ])
        try:
            from PIL import Image

            Image.fromarray(panel).save(workdir / "panel.png")
        except ImportError:
            np.save(workdir / "panel.npy", panel)
    except Exception as e:  # viz is best-effort; never fail the run for it
        print(f"panel skipped: {e}", flush=True)


if __name__ == "__main__":
    main()

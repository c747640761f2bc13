"""CLI: sync / group / calibrate / train / eval / serve subcommands.

One entry point replaces the reference's loose per-robot scripts
(sync/*.py, dataset/*_Calib_cam_save.py, dataset/*_preprocessing.py, the
trainer mains and DIP_REAL.py). Outputs keep the reference's file schemas
(matched CSVs, calib JSONs, aruco summary JSONs) so artifacts interoperate.

Usage examples:
  python -m mvropose_tpu.cli sync fr5 --base-dirs d1 d2 --out fr5.csv
  python -m mvropose_tpu.cli group --csv fr3.csv --max-views 8
  python -m mvropose_tpu.cli calibrate intrinsics --conf SN1.conf --serial 1 \
      --view top --resolution FHD --out-dir calib/
  python -m mvropose_tpu.cli calibrate manual --view front --cam leftcam \
      --tvec 0 -0.01 0.75 --rvec-deg 96 98 -45 --out summary.json
  python -m mvropose_tpu.cli train --robot fr5 ... (see train --help)
  python -m mvropose_tpu.cli serve --replay-dir frames/ --views 4
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

import numpy as np


def _cmd_sync(args) -> int:
    import pandas as pd

    from mvropose_tpu.data import sync as S

    cfg = S.SyncConfig(tolerance_s=args.tolerance, image_delay_s=args.image_delay)
    if args.robot == "fr5":
        df = S.sync_fr5(args.base_dirs, cfg)
    elif args.robot == "fr3":
        df = S.sync_fr3(args.base_dirs, args.joint_dir, cfg)
    elif args.robot == "dream":
        dfs = [S.sync_dream(d) for d in args.base_dirs]
        df = pd.concat(dfs, ignore_index=True) if dfs else pd.DataFrame()
    elif args.robot == "meca500":
        df = S.sync_meca500(args.base_dirs[0], args.joint_dir)
    elif args.robot == "meca_insertion":
        df = S.sync_meca_insertion(args.base_dirs, args.joint_dir, cfg)
    else:
        raise SystemExit(f"unknown robot {args.robot}")
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    df.to_csv(args.out, index=False)
    print(f"synced {len(df)} rows -> {args.out}")
    if args.strict and len(df) == 0:
        print("error: --strict and no rows matched (check paths/tolerance)", file=sys.stderr)
        return 1
    return 0


def _cmd_group(args) -> int:
    import pandas as pd

    from mvropose_tpu.data.grouping import group_by_time_tolerance, tolerance_grid_search

    df = pd.read_csv(args.csv)
    ts_col = args.ts_col
    cands = np.round(np.arange(0.05, 0.101, 0.01), 2)
    best, dist = tolerance_grid_search(df, cands, args.max_views, ts_col=ts_col)
    for tol, counts in dist.items():
        print(f"tolerance {tol:.2f}: {dict(sorted(counts.items(), reverse=True))}")
    print(f"recommended tolerance: {best}")
    groups = group_by_time_tolerance(
        df, args.tolerance, args.max_views, ts_col=ts_col, min_views=args.min_views
    )
    print(f"final: {len(groups)} groups at tolerance {args.tolerance}")
    if args.out:
        Path(args.out).write_text(json.dumps(groups, default=str))
        print(f"wrote {args.out}")
    return 0


def _cmd_calibrate(args) -> int:
    from mvropose_tpu.calib import load_zed_intrinsics

    if args.calib_cmd == "intrinsics":
        out_dir = Path(args.out_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        for side, name in (("LEFT", "leftcam"), ("RIGHT", "rightcam")):
            intr = load_zed_intrinsics(args.conf, side, args.resolution)
            path = out_dir / f"{args.view}_{args.serial}_{name}_calib.json"
            path.write_text(json.dumps(intr.to_json_dict(), indent=4))
            print(f"wrote {path}")
        return 0

    if args.calib_cmd == "manual":
        # Meca500-style precomputed extrinsic (reference
        # dataset/Meca500_preprocessing.py) - rvec stored in DEGREES, per the
        # reference schema for deg-unit robots.
        rec = {
            "view": args.view,
            "cam": args.cam,
            "tvec_x": args.tvec[0], "tvec_y": args.tvec[1], "tvec_z": args.tvec[2],
            "rvec_x": args.rvec_deg[0], "rvec_y": args.rvec_deg[1], "rvec_z": args.rvec_deg[2],
            # Explicit unit tag: load_rig honors it over the robot's default
            # summary convention, so mixed-origin summaries stay consistent.
            "rvec_unit": "deg",
        }
        out = Path(args.out)
        records = json.loads(out.read_text()) if out.exists() else []
        records = [r for r in records if not (r["view"] == args.view and r["cam"] == args.cam)]
        records.append(rec)
        out.write_text(json.dumps(records, indent=2))
        print(f"wrote {out} ({len(records)} records)")
        return 0

    if args.calib_cmd == "extrinsics":
        from mvropose_tpu.calib.aruco import average_marker_detections, compute_view_pose

        raw_dir = Path(args.aruco_dir)
        offsets = json.loads(Path(args.offsets).read_text())  # {view: {mid: [x,y,z]}}
        # Group detection JSONs by (view, cam) from filenames view_*_cam_*.json
        from collections import defaultdict

        per_cam: dict = defaultdict(lambda: defaultdict(list))
        for f in sorted(raw_dir.glob("*.json")):
            parts = f.name.split("_")
            view, cam = parts[0], parts[2]
            content = json.loads(f.read_text())
            for mid, det in content.items():
                per_cam[(view, cam)][mid].append(det)
        records = []
        for (view, cam), markers in per_cam.items():
            averaged = {}
            for mid, dets in markers.items():
                avg = average_marker_detections(
                    dets, angular_outlier_deg=args.outlier_deg,
                    position_outlier_m=args.outlier_pos,
                )
                if avg is not None:
                    averaged[mid] = avg
            view_offsets = {
                mid: np.asarray(v) for mid, v in offsets.get(view, {}).items()
            }
            pose = compute_view_pose(averaged, view_offsets)
            if pose is None:
                print(f"[{view}/{cam}] no usable markers, skipped")
                continue
            records.append(
                {
                    "view": view, "cam": cam,
                    "tvec_x": float(pose["tvec"][0]), "tvec_y": float(pose["tvec"][1]),
                    "tvec_z": float(pose["tvec"][2]),
                    "rvec_x": float(pose["rvec"][0]), "rvec_y": float(pose["rvec"][1]),
                    "rvec_z": float(pose["rvec"][2]),
                    "rvec_unit": "rad",  # compute_view_pose outputs radians
                    "n_markers": pose["n_markers"],
                }
            )
            print(f"[{view}/{cam}] pose from {pose['n_markers']} markers")
        Path(args.out).write_text(json.dumps(records, indent=2))
        print(f"wrote {args.out}")
        return 0

    if args.calib_cmd == "corners":
        # Meca-insertion full corner pipeline: stage-1 joint outlier-filtered
        # averaging with corner averaging -> stage-2 per-marker PnP re-solve
        # from the averaged corner pixels -> stage-3 offsets + summary
        # (reference Meca_insertion_preprocessing.py:181-313). Follow with
        # `calibrate stereo-transfer --correction-offset` for rightcam.
        from collections import defaultdict

        from mvropose_tpu.calib.aruco import (
            average_detections_with_corners,
            compute_view_pose,
            solve_marker_pose_from_corners,
        )
        from mvropose_tpu.geometry.rotations import matrix_to_quat, rodrigues_to_matrix
        import jax.numpy as jnp

        raw_dir = Path(args.aruco_dir)
        offsets = json.loads(Path(args.offsets).read_text())  # {view: {mid: [x,y,z]}}
        serial_map = json.loads(Path(args.serial_map).read_text())  # {view: serial}
        per_cam: dict = defaultdict(lambda: defaultdict(list))
        for f in sorted(raw_dir.glob("*.json")):
            parts = f.name.split("_")
            view, cam = parts[0], parts[2]
            content = json.loads(f.read_text())
            for mid, det in content.items():
                per_cam[(view, cam)][mid].append(det)
        records = []
        for (view, cam), markers in sorted(per_cam.items()):
            serial = serial_map.get(view)
            calib_path = Path(args.calib_dir) / f"{view}_{serial}_{cam}_calib.json"
            if serial is None or not calib_path.exists():
                print(f"[{view}/{cam}] no calib file, skipped")
                continue
            calib = json.loads(calib_path.read_text())
            K = np.asarray(calib["camera_matrix"], np.float64)
            dist = np.asarray(calib["distortion_coeffs"], np.float64).reshape(-1)
            resolved = {}
            for mid, dets in markers.items():
                avg = average_detections_with_corners(dets)
                if avg is None or "corners_pixel" not in avg:
                    continue
                solved = solve_marker_pose_from_corners(
                    np.asarray(avg["corners_pixel"], np.float32),
                    args.marker_size, K, dist,
                )
                q = np.asarray(
                    matrix_to_quat(rodrigues_to_matrix(jnp.asarray(solved["rvec"], jnp.float32)))
                )
                resolved[mid] = {
                    "position_m": dict(zip("xyz", (float(v) for v in solved["tvec"]))),
                    "rotation_quat": dict(zip("xyzw", (float(v) for v in q))),
                }
            view_offsets = {
                mid: np.asarray(v) for mid, v in offsets.get(view, {}).items()
            }
            pose = compute_view_pose(resolved, view_offsets)
            if pose is None:
                print(f"[{view}/{cam}] no usable markers, skipped")
                continue
            records.append(
                {
                    "view": view, "cam": cam,
                    "tvec_x": float(pose["tvec"][0]), "tvec_y": float(pose["tvec"][1]),
                    "tvec_z": float(pose["tvec"][2]),
                    "rvec_x": float(pose["rvec"][0]), "rvec_y": float(pose["rvec"][1]),
                    "rvec_z": float(pose["rvec"][2]),
                    "rvec_unit": "rad",  # compute_view_pose outputs radians
                    "n_markers": pose["n_markers"],
                }
            )
            print(f"[{view}/{cam}] pose from {pose['n_markers']} corner-resolved markers")
        Path(args.out).write_text(json.dumps(records, indent=2))
        print(f"wrote {args.out}")
        return 0

    if args.calib_cmd == "stereo-transfer":
        # Derive rightcam extrinsics from leftcam via the ZED [STEREO]
        # factory transform (reference Meca-insertion stage 3,
        # Meca_insertion_preprocessing.py:316-377).
        from mvropose_tpu.calib import load_stereo_params, stereo_right_from_left

        serial_map = json.loads(Path(args.serial_map).read_text())  # {view: serial}
        records = json.loads(Path(args.summary).read_text())
        by_key = {(r["view"], r["cam"]): r for r in records}
        added = 0
        for (view, cam), rec in list(by_key.items()):
            if cam != "leftcam" or (view, "rightcam") in by_key:
                continue
            serial = serial_map.get(view)
            if serial is None:
                continue
            conf = Path(args.conf_dir) / f"SN{serial}.conf"
            if not conf.exists():
                print(f"[{view}] no conf for serial {serial}, skipped")
                continue
            stereo = load_stereo_params(conf, args.resolution)
            rvec_l = np.array([rec["rvec_x"], rec["rvec_y"], rec["rvec_z"]])
            # stereo_right_from_left needs RADIANS; honor the record's
            # explicit unit tag, else --rvec-unit (reference Meca summaries
            # store degrees, Meca_insertion_preprocessing.py:303).
            if rec.get("rvec_unit", args.rvec_unit) == "deg":
                rvec_l = np.deg2rad(rvec_l)
            tvec_l = np.array([rec["tvec_x"], rec["tvec_y"], rec["tvec_z"]])
            offset = (
                np.asarray(args.correction_offset, np.float64)
                if args.correction_offset is not None else None
            )
            rvec_r, tvec_r = stereo_right_from_left(
                rvec_l, tvec_l, stereo, correction_offset=offset
            )
            records.append(
                {
                    "view": view, "cam": "rightcam",
                    "tvec_x": float(tvec_r[0]), "tvec_y": float(tvec_r[1]),
                    "tvec_z": float(tvec_r[2]),
                    "rvec_x": float(rvec_r[0]), "rvec_y": float(rvec_r[1]),
                    "rvec_z": float(rvec_r[2]),
                    "rvec_unit": "rad",
                    "derived_from": "stereo_baseline",
                }
            )
            added += 1
        Path(args.summary).write_text(json.dumps(records, indent=2))
        print(f"derived {added} rightcam extrinsics -> {args.summary}")
        return 0
    raise SystemExit("unknown calibrate subcommand")


def _load_rig_from_args(args):
    from mvropose_tpu.calib.registry import (
        FR3_SERIAL_TO_VIEW,
        FR5_SERIAL_TO_VIEW,
        MECA_INSERTION_SERIAL_TO_VIEW,
        load_dream_rig,
        load_rig,
    )

    if args.robot == "dream" and getattr(args, "dream_dirs", None):
        return load_dream_rig(args.dream_dirs, sigma=args.sigma)

    serial_maps = {
        "fr5": FR5_SERIAL_TO_VIEW,
        "fr3": FR3_SERIAL_TO_VIEW,
        "meca500": {"41182735": "front"},
        "dream_panda": {"00000000": "cam"},
        "meca_insertion": MECA_INSERTION_SERIAL_TO_VIEW,
    }
    robot = {"meca_insertion": "meca500", "dream": "dream_panda"}.get(args.robot, args.robot)
    aruco = None
    if args.aruco_summary:
        import re

        # A summary named pose<N>_... keys its extrinsics with that pose
        # prefix (FR3's pose1/pose2 convention); other names are unprefixed.
        # Several unprefixed summaries accumulate (mixed-robot runs share one
        # artifact set; load_rig merges the record lists).
        aruco = {}
        for p in (Path(p) for p in args.aruco_summary):
            tok = p.stem.split("_")[0]
            prefix = tok if re.fullmatch(r"pose\d+", tok) else ""
            aruco.setdefault(prefix, []).append(p)
    return load_rig(
        args.robot,
        robot,
        serial_maps.get(args.robot, {}),
        calib_dir=args.calib_dir,
        aruco_summary_paths=aruco,
        sigma=args.sigma,
    )


def _graft_backbone_ckpt(variables, ckpt_path, vit_cfg):
    """Replace the initialized backbone params with a converted DINO
    checkpoint (the reference's frozen-pretrained workflow,
    DREAM_Train.py:137 / MvRoPose_FR3.py:334).

    Accepts a torch ``.pth``/``.pt``/``.bin`` state dict (timm or HF naming)
    or a ``.npz`` of the same keys. Tree structure and shapes are validated
    against the initialized params so a config/checkpoint mismatch fails
    loudly instead of silently training a half-random backbone.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mvropose_tpu.models.dino_convert import convert_dino_state_dict

    p = str(ckpt_path)
    if p.endswith(".npz"):
        sd = dict(np.load(p))
    else:
        from mvropose_tpu.models.dino_convert import load_torch_checkpoint

        sd = load_torch_checkpoint(p)
    converted = convert_dino_state_dict(
        sd, vit_cfg.num_layers, vit_cfg.num_heads, vit_cfg.hidden_size
    )
    init_bb = variables["params"]["backbone"]
    init_paths = {jax.tree_util.keystr(k): v.shape
                  for k, v in jax.tree_util.tree_leaves_with_path(init_bb)}
    conv_paths = {jax.tree_util.keystr(k): np.shape(v)
                  for k, v in jax.tree_util.tree_leaves_with_path(converted)}
    if init_paths.keys() != conv_paths.keys():
        missing = sorted(init_paths.keys() - conv_paths.keys())
        extra = sorted(conv_paths.keys() - init_paths.keys())
        raise ValueError(
            f"backbone checkpoint structure mismatch: missing={missing[:5]} "
            f"extra={extra[:5]} (check --hidden-size/--num-layers/"
            f"--register-tokens/--backbone-native-size; a DINOv3 RoPE "
            f"checkpoint additionally needs --rope - it has no pos_embed)"
        )
    bad = [k for k in init_paths if init_paths[k] != tuple(conv_paths[k])]
    if bad:
        raise ValueError(
            f"backbone checkpoint shape mismatch at {bad[:5]}: "
            f"{[(init_paths[k], conv_paths[k]) for k in bad[:5]]}"
        )
    grafted = jax.tree_util.tree_map(
        lambda init, w: jnp.asarray(w, init.dtype), init_bb, converted
    )
    out = dict(variables)
    out["params"] = dict(variables["params"])
    out["params"]["backbone"] = grafted
    return out


def _write_model_config(workdir, cfg, multi_view: bool, model_size: int) -> None:
    """Persist the model architecture next to the checkpoints.

    A checkpoint without its architecture is a dead end: eval/serve would have
    to reconstruct the exact ViTConfig/EstimatorConfig from CLI flags, and any
    mismatch (patch size, register tokens, angle head...) surfaces as an
    opaque KeyError deep in load_params_npz. Training writes
    model_config.json; eval/serve rebuild the model from it when present.
    """
    import dataclasses

    d = {
        "kind": "multi_view" if multi_view else "single_view",
        "model_size": model_size,
        "vit": dataclasses.asdict(cfg.vit),
        "num_joints": cfg.num_joints,
        "num_angles": cfg.num_angles,
        "heatmap_size": list(cfg.heatmap_size),
        "max_views": cfg.max_views,
        "num_fusion_queries": cfg.num_fusion_queries,
        "num_angle_queries": cfg.num_angle_queries,
        "angle_head": cfg.angle_head,
    }
    Path(workdir).mkdir(parents=True, exist_ok=True)
    (Path(workdir) / "model_config.json").write_text(json.dumps(d, indent=2))


def _read_model_config(params_path):
    """(EstimatorConfig, model_size, kind) from the model_config.json sitting
    next to a params file, or None if absent (pre-r3 checkpoints)."""
    from mvropose_tpu.models import EstimatorConfig
    from mvropose_tpu.models.vit import ViTConfig

    p = Path(params_path).parent / "model_config.json"
    if not p.exists():
        return None
    d = json.loads(p.read_text())
    cfg = EstimatorConfig(
        vit=ViTConfig(**d["vit"]),
        num_joints=d["num_joints"],
        num_angles=d["num_angles"],
        heatmap_size=tuple(d["heatmap_size"]),
        max_views=d["max_views"],
        num_fusion_queries=d["num_fusion_queries"],
        num_angle_queries=d["num_angle_queries"],
        angle_head=d["angle_head"],
    )
    return cfg, int(d["model_size"]), d["kind"]


def _load_params_checked(params_path, init_params, angle_head: str):
    """load_params_npz with an actionable error on architecture mismatch."""
    from mvropose_tpu.train.checkpoint import load_params_npz

    try:
        return load_params_npz(params_path, init_params)
    except (KeyError, ValueError) as e:
        raise SystemExit(
            f"checkpoint/architecture mismatch loading {params_path}: {e}\n"
            f"The constructed model (angle_head={angle_head!r}) does not match "
            "the trained one. If the run predates model_config.json, pass the "
            "training-time --angle-head/--model-size/--hidden-size/--num-layers/"
            "--patch-size/--register-tokens/--backbone-native-size; otherwise "
            "copy model_config.json from the training workdir next to the "
            "params file."
        ) from e


def _load_variables_checked(params_path, variables, angle_head: str):
    """Restore BOTH trained collections into an eval_shape'd variables tree:
    params, and the BatchNorm running stats (batch_stats) the stem/UNet head
    carry. Inference with init-valued (let alone zero-valued) running stats
    is silently wrong - a torch state_dict bundles running stats with the
    weights, and so does save_params_npz since batch_stats were added."""
    from mvropose_tpu.train.checkpoint import load_batch_stats_npz

    variables = dict(variables)
    variables["params"] = _load_params_checked(
        params_path, variables["params"], angle_head
    )
    if "batch_stats" in variables:
        variables["batch_stats"], n_loaded, n_total = load_batch_stats_npz(
            params_path, variables["batch_stats"]
        )
        if 0 < n_loaded < n_total:
            # A partial match means the file was exported from a different
            # architecture whose param shapes happened to coincide - the
            # unmatched BN modules would silently run with init stats.
            raise SystemExit(
                f"{params_path}: batch_stats only partially match the model "
                f"({n_loaded}/{n_total} leaves) - the file was exported from "
                "a different architecture. Check --patch-size/--angle-head/"
                "model_config.json against the training run."
            )
        if n_loaded == 0:
            print(
                f"WARNING: {params_path} has no batch_stats (saved before they "
                "were bundled); BatchNorm runs with init running stats - "
                "re-export from the training workdir's orbax checkpoint for "
                "correct inference."
            )
    return variables


def _robot_arg(value: str) -> str:
    """Validate a robot name or comma list of them (mixed-robot training)."""
    valid = {"fr5", "fr3", "dream", "meca500", "meca_insertion"}
    names = [v.strip() for v in value.split(",")]
    bad = [n for n in names if n not in valid]
    if bad or not names:
        raise argparse.ArgumentTypeError(
            f"unknown robot(s) {bad}; choose from {sorted(valid)} "
            "(comma-separate for mixed training)"
        )
    return ",".join(names)


def _cmd_train(args) -> int:
    import pandas as pd
    import jax
    import jax.numpy as jnp

    from mvropose_tpu.data import builders
    from mvropose_tpu.data.dataset import make_device_preprocessor
    from mvropose_tpu.models import (
        EstimatorConfig,
        MultiViewPoseEstimator,
        SingleViewPoseEstimator,
    )
    from mvropose_tpu.models.vit import ViTConfig
    from mvropose_tpu.parallel import make_mesh
    from mvropose_tpu.train import (
        TrainConfig,
        create_train_state,
        make_eval_step,
        make_multi_view_train_step,
        make_single_view_train_step,
    )
    from mvropose_tpu.train.loop import fit

    image_hw = tuple(args.image_hw)
    robots = [r.strip() for r in args.robot.split(",")]
    mixed = len(robots) > 1

    def _build_single_view(robot_name, df_r, rig_r):
        if robot_name == "dream":
            return builders.build_dream_single_view(df_r, rig_r, image_hw)
        if robot_name == "fr5":
            return builders.build_fr5_single_view(df_r, rig_r, image_hw)
        if robot_name == "meca500":
            return builders.build_meca500_single_view(df_r, rig_r, image_hw)
        if robot_name == "meca_insertion":
            return builders.build_meca_insertion_single_view(df_r, rig_r, image_hw)
        return builders.build_fr3_single_view(df_r, rig_r, image_hw)

    if mixed:
        # BASELINE config 4 (mixed-robot training): one model over several
        # robots via padded heterogeneous batches (data/mixed.py). One --csv
        # per robot, paired in --robot order; calib/aruco artifacts are
        # shared directories (each robot's builder binds only the cameras
        # its serial->view map and CSV paths reference).
        if len(args.csv) != len(robots):
            raise SystemExit(
                f"--robot {args.robot} needs exactly {len(robots)} --csv "
                "files (one per robot, in order)"
            )
        if args.fk_loss_weight > 0:
            # The FK term projects FK(pred angles) through per-sample
            # extrinsics; with heterogeneous robots that would need a
            # robot-indexed lax.switch over FK chains PLUS per-robot
            # extrinsics in the padded batches, which data/mixed.py does not
            # ship (its children run with_extrinsics=False by construction).
            raise SystemExit("--fk-loss-weight is not supported with mixed robots")
        if args.angle_head == "geometric3d":
            # geometric3d is multi-view only (its DLT branch triangulates
            # across views); mixed batches are single-image rows.
            raise SystemExit(
                "mixed-robot training supports --angle-head query or "
                "geometric (geometric3d is multi-view only)"
            )
        # "geometric" works mixed as-is: it regresses angles from the
        # model's own decoded keypoints + confidences, which are
        # robot-agnostic features (padded channels train to zero heatmaps,
        # decode to ~0 confidence, and the angle_mask drops padded angle
        # slots from the loss) - no FK chain enters the head.
        # fr3 in a mixed run always contributes its single-view regime
        # (heterogeneous batches are single-image rows; --single-view implied).
        from mvropose_tpu.data.mixed import MixedRobotDataset

        children = []
        for rname, csvp in zip(robots, args.csv):
            sub = argparse.Namespace(**vars(args))
            sub.robot = rname
            rig_r = _load_rig_from_args(sub)
            children.append(_build_single_view(rname, pd.read_csv(csvp), rig_r))
            print(f"  {rname}: {len(children[-1])} samples")
        ds = MixedRobotDataset(children, robots)
        rig = children[0].geometry.rig  # hw/heatmap/sigma binding only
        multi_view = False
    else:
        rig = _load_rig_from_args(args)
        df = pd.concat([pd.read_csv(c) for c in args.csv], ignore_index=True)
        multi_view = args.robot == "fr3" and not args.single_view
        if multi_view:
            ds = builders.build_fr3_multi_view(df, rig, image_hw, tolerance_s=args.tolerance)
        else:
            ds = _build_single_view(args.robot, df, rig)
    if args.fk_loss_weight > 0 and not rig.extrinsics:
        # Without calibrated extrinsics the dataset would ship its identity
        # placeholder pose at full sample weight and the FK-consistency term
        # would silently train against a bogus camera (DREAM rigs store
        # camera-frame keypoints and no world->cam extrinsic).
        raise SystemExit(
            "--fk-loss-weight needs calibrated extrinsics (an ArUco summary); "
            f"the {args.robot} rig has none"
        )
    if args.fk_loss_weight > 0 and any(
        s.roi is not None for s in getattr(ds, "samples", [])
    ):
        # ROI samples rescale keypoints into the crop frame while the FK
        # term would project with the full-frame K - the two sides of the
        # L2 would live in different pixel frames.
        raise SystemExit(
            "--fk-loss-weight is not supported with ROI-cropped datasets "
            "(keypoints are in the crop frame, the FK projection in the "
            "full camera frame)"
        )
    if args.fk_loss_weight > 0 and hasattr(ds, "with_extrinsics"):
        ds.with_extrinsics = True
    if multi_view and args.angle_head == "geometric3d":
        ds.with_extrinsics = True  # per-sample P matrices for the DLT branch
    train_ds, val_ds = builders.train_val_split(ds, args.val_split)
    print(f"dataset: {len(train_ds)} train / {len(val_ds)} val")

    # The backbone's native grid may differ from the run resolution: converted
    # DINO checkpoints keep their pretraining pos-embed grid (e.g. 518/14) and
    # ViTBackbone interpolates at apply time (torch-exact bicubic), exactly as
    # the reference runs timm's 518-native ViT at 512 (MvRoPose_FR3.py:334).
    vit = ViTConfig(
        image_size=args.backbone_native_size or args.model_size,
        patch_size=args.patch_size,
        hidden_size=args.hidden_size, num_layers=args.num_layers,
        num_heads=args.hidden_size // 64,
        num_register_tokens=args.register_tokens,
        dtype="bfloat16",
        use_rope=args.rope,
        layer_norm_eps=1e-5 if args.rope else 1e-6,  # DINOv3 vs DINOv2/timm
    )
    freeze = not args.no_freeze_backbone
    # Mixed runs size the heads to the WIDEST robot (padded batches carry
    # per-sample angle masks; padded heatmap channels train to zero).
    n_kp = ds.num_keypoints if mixed else rig.num_keypoints
    n_ang = ds.num_angles if mixed else rig.robot.n_joints
    cfg = EstimatorConfig(
        vit=vit, num_joints=n_kp, num_angles=n_ang,
        heatmap_size=rig.heatmap_size, max_views=2 * len(rig.serial_to_view),
        freeze_backbone=freeze, angle_head=args.angle_head,
    )
    model = (MultiViewPoseEstimator if multi_view else SingleViewPoseEstimator)(cfg)
    _write_model_config(args.workdir, cfg, multi_view, args.model_size)

    # Parallel host input pipeline (the reference fed its GPUs with 8
    # DataLoader worker processes for BOTH trainers,
    # /root/reference/model/DREAM_Train.py:734, MvRoPose_FR3.py:958-965).
    # grain workers cover decode + ROI + host undistort; geometry
    # (resolution, FK, projection) stays in the parent / on device. Covers
    # single-view AND multi-view/grouped datasets, including the
    # extrinsics-carrying variants (FK loss, multi-view geometric3d). The
    # grain path drops the final partial batch (static shapes, no padding),
    # so it only engages when the dataset has at least one full batch; the
    # mixed-robot dataset keeps its in-process loader (its batches interleave
    # per-child maps with per-robot angle rescaling and arity padding).
    use_grain = (
        args.num_workers > 0
        and not mixed
        and len(train_ds) >= args.batch_size
    )
    if args.num_workers > 0 and not use_grain:
        print(
            "note: --num-workers parallel loading needs a non-mixed dataset "
            "with >= 1 full batch; using in-process loading"
        )

    mesh = make_mesh(*args.mesh) if args.mesh else make_mesh()
    tcfg = TrainConfig(
        num_epochs=args.epochs,
        # Serial path: ceil, not floor - the datasets PAD the final partial
        # batch (shapes stay static), so an epoch runs ceil(len/bs) optimizer
        # steps; a floor here would end the cosine schedule early and train
        # the tail of every run at the eta_min floor. Grain path: floor,
        # because grain DROPS the remainder instead of padding it.
        steps_per_epoch=(
            len(train_ds) // args.batch_size
            if use_grain
            else max(1, -(-len(train_ds) // args.batch_size))
        ),
        lr_kpt=args.lr_kpt, lr_ang=args.lr_ang,
        loss_weight_kpt=args.loss_weight_kpt,
        loss_weight_fk=args.fk_loss_weight,
        freeze_backbone=freeze,
    )
    from mvropose_tpu.data.augment import AugmentConfig

    aug_cfg = None if args.no_augment else AugmentConfig()
    pre = make_device_preprocessor(
        ds.geometry, args.model_size, rig.heatmap_size, rig.sigma,
        out_dtype="float32", augment_cfg=aug_cfg,
    )
    aug_rng = jax.random.PRNGKey(args.seed if hasattr(args, "seed") else 0)

    def to_device(batch, augment=False):
        nonlocal aug_rng
        rng = None
        if augment and aug_cfg is not None:
            aug_rng, rng = jax.random.split(aug_rng)
        imgs, hms = pre(
            jnp.asarray(batch["images_u8"]),
            jnp.asarray(batch["cam_idx"]),
            jnp.asarray(batch["keypoints_2d"]),
            rng,
        )
        out = {"images": imgs, "heatmaps": hms, "angles": jnp.asarray(batch["angles"])}
        if multi_view:
            out["view_ids"] = jnp.asarray(batch["view_ids"])
            out["view_mask"] = jnp.asarray(batch["view_mask"])
            if args.angle_head == "geometric3d":
                from mvropose_tpu.geometry.triangulation import heatmap_projection_matrices

                out["proj_mats"] = jax.vmap(
                    lambda r, t, K: heatmap_projection_matrices(
                        r, t, K, image_hw, rig.heatmap_size
                    )
                )(jnp.asarray(batch["rvec"]), jnp.asarray(batch["tvec"]),
                  jnp.asarray(batch["K"]))
        else:
            out["sample_weight"] = jnp.asarray(batch["sample_weight"])
            for k in ("rvec", "tvec", "K", "base_rotation", "angle_mask"):
                if k in batch:
                    out[k] = jnp.asarray(batch[k])
            if args.fk_loss_weight > 0:
                out["keypoints_2d"] = jnp.asarray(batch["keypoints_2d"])
        return out

    grain_state = {"stream": None}
    if use_grain:
        from mvropose_tpu.data.grain_loader import make_grain_loader

        # One endless stream (shuffle-before-repeat reshuffles every epoch
        # with an epoch-derived seed); the epoch boundary is steps_per_epoch
        # batches. Worker processes stay warm across epochs - tearing the
        # pool down per epoch would pay the spawn cost len(epochs) times.
        # The stream is created LAZILY at the first epoch fit() actually
        # serves and seeded from that epoch: a checkpoint-resumed run
        # (start_epoch > 0) therefore gets a fresh permutation instead of
        # silently replaying epoch 0's order (VERDICT r4 #7); the serial
        # path reseeds per epoch and has the same property.
        def train_batches(epoch):
            if grain_state["stream"] is None:
                if epoch > 0:
                    print(
                        f"grain: resuming at epoch {epoch}; stream reseeded "
                        f"with seed {args.seed} + epoch (sample order differs "
                        "from an uninterrupted run, matching the serial "
                        "path's per-epoch reshuffle semantics)"
                    )
                grain_state["stream"] = iter(
                    make_grain_loader(
                        train_ds, args.batch_size, shuffle=True,
                        seed=args.seed + 1000003 * epoch,
                        num_workers=args.num_workers, num_epochs=None,
                    )
                )
            for _ in range(tcfg.steps_per_epoch):
                yield to_device(next(grain_state["stream"]), augment=True)

    else:

        def train_batches(epoch):
            for b in train_ds.batches(args.batch_size, shuffle=True, seed=epoch):
                yield to_device(b, augment=True)

    def val_batches():
        for b in val_ds.batches(args.batch_size):
            yield to_device(b)

    # Init ON THE HOST CPU DEVICE with zero tensors of the model's input
    # shapes: flax init runs eagerly, and through the tunneled TPU every op
    # is a ~30 ms round trip - a 4-layer model's init alone costs minutes
    # there (same trick as scripts/train_synthetic.py / bench.py). Going
    # through to_device here would additionally remote-compile the
    # preprocessor at the init batch size. One H2D transfer follows when the
    # train step shards the state.
    raw = next(iter(train_ds.batches(min(args.batch_size, 2))))
    B0 = raw["images_u8"].shape[0]
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        if multi_view:
            V0 = raw["images_u8"].shape[1]
            imgs0 = np.zeros((B0, V0, args.model_size, args.model_size, 3), np.float32)
            pm0 = (
                np.zeros((B0, V0, 3, 4), np.float32)
                if args.angle_head == "geometric3d" else None
            )
            variables = model.init(
                jax.random.PRNGKey(0), imgs0,
                np.asarray(raw["view_ids"]), np.asarray(raw["view_mask"]),
                proj_mats=pm0,
            )
        else:
            imgs0 = np.zeros((B0, args.model_size, args.model_size, 3), np.float32)
            variables = model.init(jax.random.PRNGKey(0), imgs0)
    if multi_view:
        step = make_multi_view_train_step(tcfg, mesh)
    else:
        step = make_single_view_train_step(tcfg, mesh, robot=rig.robot)
    if args.backbone_ckpt:
        variables = _graft_backbone_ckpt(variables, args.backbone_ckpt, vit)
        print(f"loaded backbone weights from {args.backbone_ckpt}")
    state = create_train_state(model, variables, tcfg)
    eval_step = make_eval_step(tcfg, multi_view, mesh)

    # Per-epoch prediction panels (the reference saved pred-vs-GT overlays to
    # results_ddp/ and wandb on best epochs, MvRoPose_FR3.py:1176).
    from mvropose_tpu.utils.metrics_writer import MetricWriter
    from mvropose_tpu.utils.viz import multi_view_panel, prediction_panel

    writer = MetricWriter(Path(args.workdir) / "logs", use_wandb=args.wandb)

    def on_epoch_end(epoch, state_, record):
        if (epoch + 1) % args.viz_every != 0:
            return
        try:
            batch = next(iter(val_batches()))
        except StopIteration:
            return
        out = eval_step(state_, batch)
        imgs = np.asarray(batch["images"])
        gt = np.asarray(batch["heatmaps"])
        pred = np.asarray(out["pred_heatmaps"])
        if multi_view:
            panel = multi_view_panel(imgs[0], gt[0], pred[0], np.asarray(batch["view_mask"])[0])
        else:
            panel = prediction_panel(imgs[0], gt[0], pred[0])
        writer.write_image(int(state_.step), "val_predictions", panel)

    try:
        with mesh:
            result = fit(
                state, step, eval_step, train_batches, val_batches, tcfg, args.workdir,
                metric_writer=writer, on_epoch_end=on_epoch_end, mesh=mesh,
            )
    finally:
        if grain_state["stream"] is not None:
            # The endless stream never exhausts; close it so the worker
            # processes don't linger past the run (long-lived hosts, tests).
            close = getattr(grain_state["stream"], "close", None)
            if close is not None:
                close()
    print(f"done: best val loss {result.best_val_loss:.6f} over {result.epochs_run} epochs")
    return 0


def _eval_mixed(args) -> int:
    """Per-robot metrics of a mixed-robot checkpoint (BASELINE config 4).

    Reports PCK@k / angle MAE (native units) / FK-space ADD PER ROBOT so the
    mixed model is directly comparable with its single-robot twins. The
    PnP-pose protocol stays per-robot-single-robot (extrinsics and pose
    frames are rig-specific); pose evidence lives in the single-robot evals.
    """
    import pandas as pd
    import jax
    import jax.numpy as jnp

    from mvropose_tpu.data import builders
    from mvropose_tpu.data.dataset import make_device_preprocessor
    from mvropose_tpu.data.mixed import MixedRobotDataset, PAD_KEYPOINT
    from mvropose_tpu.models import SingleViewPoseEstimator
    from mvropose_tpu.geometry.heatmap import argmax_decode
    from mvropose_tpu.geometry.robots import forward_kinematics_batch

    robots = args.robot.split(",")
    if len(args.csv) != len(robots):
        raise SystemExit(f"--robot {args.robot} needs {len(robots)} --csv files (one per robot)")
    image_hw = tuple(args.image_hw)
    build = {
        "fr5": builders.build_fr5_single_view,
        "fr3": builders.build_fr3_single_view,
        "meca500": builders.build_meca500_single_view,
        "meca_insertion": builders.build_meca_insertion_single_view,
        "dream": builders.build_dream_single_view,
    }
    children = []
    for rname, csvp in zip(robots, args.csv):
        sub = argparse.Namespace(**vars(args))
        sub.robot = rname
        rig_r = _load_rig_from_args(sub)
        children.append(build[rname](pd.read_csv(csvp), rig_r, image_hw))
    ds = MixedRobotDataset(children, robots)

    saved = _read_model_config(args.params)
    if saved is None:
        raise SystemExit("mixed eval needs model_config.json beside --params")
    cfg, model_size, kind = saved
    if kind != "single_view":
        raise SystemExit(f"mixed eval expects a single_view checkpoint, got {kind}")
    if cfg.num_joints < ds.num_keypoints or cfg.num_angles < ds.num_angles:
        raise SystemExit(
            f"checkpoint arity ({cfg.num_joints} kp / {cfg.num_angles} ang) is "
            f"narrower than the widest robot ({ds.num_keypoints}/{ds.num_angles})"
        )
    model = SingleViewPoseEstimator(cfg)
    rig0 = children[0].geometry.rig
    pre = make_device_preprocessor(ds.geometry, model_size, cfg.heatmap_size, rig0.sigma)

    first = next(iter(ds.batches(1)))
    imgs0, _ = pre(
        jnp.asarray(first["images_u8"]), jnp.asarray(first["cam_idx"]),
        jnp.asarray(first["keypoints_2d"]),
    )
    shapes = jax.eval_shape(lambda k: model.init(k, imgs0), jax.random.PRNGKey(0))
    variables = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    variables = _load_variables_checked(args.params, variables, cfg.angle_head)
    apply_fn = jax.jit(lambda v, x: model.apply(v, x))

    img_h, img_w = image_hw
    stats = {r: {"pck_n": 0.0, "pck_d": 0.0, "mae": 0.0, "add": 0.0, "n": 0.0} for r in robots}
    for batch in ds.batches(args.batch_size):
        imgs, _ = pre(
            jnp.asarray(batch["images_u8"]), jnp.asarray(batch["cam_idx"]),
            jnp.asarray(batch["keypoints_2d"]),
        )
        hm, ang = apply_fn(variables, imgs)
        xy, _ = argmax_decode(hm)
        scale = np.asarray([img_w / hm.shape[-1], img_h / hm.shape[-2]], np.float32)
        pred_xy = np.asarray(xy) * scale
        pred_ang = np.asarray(ang)
        gt_xy = batch["keypoints_2d"]
        w = batch["sample_weight"] > 0
        kp_real = gt_xy[..., 0] > PAD_KEYPOINT + 1.0  # padded channels excluded
        in_frame = (
            (gt_xy[..., 0] >= 0) & (gt_xy[..., 0] < img_w)
            & (gt_xy[..., 1] >= 0) & (gt_xy[..., 1] < img_h)
        )
        kp_valid = kp_real & in_frame & w[:, None]
        err = np.linalg.norm(pred_xy - gt_xy, axis=-1)
        for ci, rname in enumerate(robots):
            sel = (batch["robot_id"] == ci) & w
            if not sel.any():
                continue
            robot = children[ci].geometry.rig.robot
            A = robot.n_joints
            kv = kp_valid & sel[:, None]
            st = stats[rname]
            st["pck_n"] += float(((err <= args.pck_px) & kv).sum())
            st["pck_d"] += float(kv.sum())
            # Angles train in radians; report native units (deg robots /scale).
            to_native = 1.0 / float(ds.angle_scale[ci])
            pa = pred_ang[sel][:, :A] * to_native
            ga = batch["angles"][sel][:, :A] * to_native
            st["mae"] += float(np.abs(pa - ga).sum() / A)
            fk_p = forward_kinematics_batch(robot, jnp.asarray(pa))
            fk_g = forward_kinematics_batch(robot, jnp.asarray(ga))
            st["add"] += float(
                jnp.mean(jnp.linalg.norm(fk_p - fk_g, axis=-1), axis=-1).sum()
            )
            st["n"] += float(sel.sum())
    report = {"robots": robots, "samples": int(sum(s["n"] for s in stats.values()))}
    for rname in robots:
        s = stats[rname]
        n = max(s["n"], 1e-9)
        report[rname] = {
            f"pck@{args.pck_px}px": s["pck_n"] / max(s["pck_d"], 1e-9),
            "angle_mae_native": s["mae"] / n,
            "angle_unit": children[robots.index(rname)].geometry.rig.robot.angle_unit,
            "add_m": s["add"] / n,
            "samples": int(s["n"]),
        }
    print(json.dumps(report))
    return 0


def _int8ify(model_cls, cfg, variables, attn: bool = False):
    """Quantize a loaded float checkpoint's backbone to int8 and rebuild the
    model with the quantized ViT config (serve-path HBM-roofline attack;
    see models/quantize.py). Heads stay float. attn=True also enables the
    int8-probability attention (ops/attention.int8_prob_attention - pure
    activation quantization, no extra params)."""
    import dataclasses as _dc

    import jax
    import jax.numpy as jnp

    from mvropose_tpu.models.quantize import quantize_backbone_params

    cfg = _dc.replace(
        cfg,
        vit=_dc.replace(cfg.vit, quant="int8", quant_attn="int8" if attn else None),
    )
    params = dict(variables["params"])
    params["backbone"] = jax.tree_util.tree_map(
        jnp.asarray, quantize_backbone_params(params["backbone"])
    )
    variables = {**variables, "params": params}
    return model_cls(cfg), cfg, variables


def _cmd_eval(args) -> int:
    """Evaluate a trained model: PCK@k px, angle MAE, and FK-space ADD."""
    import pandas as pd
    import jax
    import jax.numpy as jnp

    if "," in args.robot:
        return _eval_mixed(args)

    from mvropose_tpu.data import builders
    from mvropose_tpu.data.dataset import make_device_preprocessor
    from mvropose_tpu.models import (
        EstimatorConfig,
        MultiViewPoseEstimator,
        SingleViewPoseEstimator,
    )
    from mvropose_tpu.models.vit import ViTConfig
    from mvropose_tpu.train.metrics import pck_at_k, add_metric, add_auc, angle_mae
    from mvropose_tpu.geometry.heatmap import argmax_decode
    from mvropose_tpu.geometry.robots import forward_kinematics_batch

    rig = _load_rig_from_args(args)
    df = pd.concat([pd.read_csv(c) for c in args.csv], ignore_index=True)
    image_hw = tuple(args.image_hw)
    multi_view = args.robot == "fr3" and not args.single_view
    if args.robot == "dream":
        ds = builders.build_dream_single_view(df, rig, image_hw)
    elif args.robot == "fr5":
        ds = builders.build_fr5_single_view(df, rig, image_hw)
    elif args.robot == "meca500":
        ds = builders.build_meca500_single_view(df, rig, image_hw)
    elif args.robot == "meca_insertion":
        ds = builders.build_meca_insertion_single_view(df, rig, image_hw)
    elif multi_view:
        ds = builders.build_fr3_multi_view(df, rig, image_hw, tolerance_s=args.tolerance)
    else:  # fr3 --single-view
        ds = builders.build_fr3_single_view(df, rig, image_hw)

    saved = _read_model_config(args.params)
    if saved is not None:
        # Architecture restored from the training workdir: CLI arch flags are
        # not consulted, so a model trained with any --patch-size/--register-
        # tokens/--backbone-native-size/--angle-head combination evaluates
        # without re-specifying them.
        cfg, model_size, kind = saved
        want_kind = "multi_view" if multi_view else "single_view"
        if kind != want_kind:
            raise SystemExit(
                f"checkpoint is a {kind} model but the dataset flags select "
                f"{want_kind} (--robot/--single-view)"
            )
        print(f"model architecture restored from {Path(args.params).parent / 'model_config.json'}")
    else:
        model_size = args.model_size
        vit = ViTConfig(
            image_size=args.backbone_native_size or args.model_size,
            patch_size=args.patch_size, hidden_size=args.hidden_size,
            num_layers=args.num_layers, num_heads=args.hidden_size // 64,
            num_register_tokens=args.register_tokens, dtype="bfloat16",
            use_rope=getattr(args, "rope", False),
            layer_norm_eps=1e-5 if getattr(args, "rope", False) else 1e-6,
        )
        cfg = EstimatorConfig(
            vit=vit, num_joints=rig.num_keypoints, num_angles=rig.robot.n_joints,
            heatmap_size=rig.heatmap_size, max_views=2 * len(rig.serial_to_view),
            angle_head=args.angle_head,
        )
    model = (MultiViewPoseEstimator if multi_view else SingleViewPoseEstimator)(cfg)
    pre = make_device_preprocessor(ds.geometry, model_size, rig.heatmap_size, rig.sigma)

    first = next(iter(ds.batches(1)))
    imgs, hms = pre(
        jnp.asarray(first["images_u8"]), jnp.asarray(first["cam_idx"]),
        jnp.asarray(first["keypoints_2d"]),
    )
    geo3d = multi_view and cfg.angle_head == "geometric3d"
    if multi_view:
        V1 = imgs.shape[1]
        shapes = jax.eval_shape(
            lambda k: model.init(
                k, imgs, jnp.asarray(first["view_ids"]), jnp.asarray(first["view_mask"]),
                proj_mats=jnp.zeros((imgs.shape[0], V1, 3, 4)) if geo3d else None,
            ),
            jax.random.PRNGKey(0),
        )
    else:
        shapes = jax.eval_shape(lambda k: model.init(k, imgs), jax.random.PRNGKey(0))
    variables = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    variables = _load_variables_checked(args.params, variables, cfg.angle_head)
    if getattr(args, "int8_backbone", False):
        model, cfg, variables = _int8ify(
            type(model), cfg, variables, attn=getattr(args, "int8_attention", False)
        )
        print(
            "backbone quantized to int8 (per-channel weights, dynamic per-token "
            "activations)"
            + (" + int8-prob attention" if getattr(args, "int8_attention", False) else "")
        )

    # Optional occlusion-robustness probe: solid random rectangles on the
    # model inputs (the reference's adversarial masking at inference,
    # Fr5_model_train.ipynb cell 14 load_image_and_preprocess).
    occl_rng = jax.random.PRNGKey(7)

    def maybe_occlude(x):
        nonlocal occl_rng
        if args.occlusion_masks <= 0:
            return x
        from mvropose_tpu.data.augment import random_masking
        from mvropose_tpu.data.dataset import IMAGENET_MEAN, IMAGENET_STD

        occl_rng, key = jax.random.split(occl_rng)
        lead = x.shape[:-3]
        flat = x.reshape(-1, *x.shape[-3:])
        # Masking operates in [0, 1]: denormalize, mask, renormalize.
        raw = flat * jnp.asarray(IMAGENET_STD) + jnp.asarray(IMAGENET_MEAN)
        raw = random_masking(key, jnp.clip(raw, 0, 1), num_masks=args.occlusion_masks)
        return ((raw - IMAGENET_MEAN) / IMAGENET_STD).reshape(x.shape).astype(x.dtype)

    # One jitted forward reused across batches (un-jitted flax apply would
    # retrace every call).
    if multi_view:
        apply_fn = jax.jit(
            lambda im, vi, vm, pm=None: model.apply(variables, im, vi, vm, proj_mats=pm)
        )
        ds.with_extrinsics = True  # enables triangulated-3D eval
        from mvropose_tpu.pose import recover_pose_multiview

        def tri_add(pred_hm, batch, fk_gt):
            """Triangulated decoded keypoints vs GT FK skeleton, per sample.

            The triangulated points live in the ArUco world frame = the
            *base-rotated* FK frame (the dataset projects GT through
            base_rotation @ FK, dataset.py gt_keypoints), so the GT skeleton
            must be rotated into that frame before comparing. All views of a
            rig share the base rotation (FR3: zyx 90/180/0 for every view),
            so the first valid view's matrix is used per sample.

            The ADD mean is conditional on observability (a keypoint needs
            >= 2 confident views to triangulate at all), so each sample also
            reports its observable fraction - the coverage the conditional
            mean silently assumes; triangulated_obs_rate surfaces it.
            """
            B = pred_hm.shape[0]
            vals, obs_fracs = [], []
            for b in range(B):
                if batch["sample_weight"][b] == 0:
                    continue
                pts3d, obs = recover_pose_multiview(
                    pred_hm[b],
                    jnp.asarray(batch["view_mask"][b]),
                    jnp.asarray(batch["rvec"][b]),
                    jnp.asarray(batch["tvec"][b]),
                    jnp.asarray(batch["K"][b]),
                    tuple(args.image_hw),
                )
                obs_np = np.asarray(obs)
                obs_fracs.append(float(obs_np.mean()))
                if obs_np.sum() < 1:
                    continue
                v0 = int(np.argmax(np.asarray(batch["view_mask"][b])))
                base = np.asarray(batch["base_rotation"][b, v0])  # (3, 3)
                gt_world = np.asarray(fk_gt[b]) @ base.T  # rows: base @ p
                d = np.linalg.norm(np.asarray(pts3d) - gt_world, axis=-1)
                vals.append(float(np.mean(d[obs_np > 0])))
            return vals, obs_fracs
    else:
        apply_fn = jax.jit(lambda im: model.apply(variables, im))
        tri_add = None

    # 6D camera-pose recovery metric (rot/trans error of the RANSAC-PnP pose
    # vs the rig's calibrated extrinsics) - the headline quantity the
    # reference only eyeballs via reprojection overlays (Fr5_model_train.ipynb
    # cell 14). Needs per-sample extrinsics in the batch; rigs without a
    # calibrated extrinsic (DREAM stores camera-frame keypoints and no
    # world->cam pose) have no GT to compare against - the batch's identity
    # placeholder would report a meaningless ~90-130 deg "error".
    rig_has_extrinsics = bool(rig.extrinsics)
    # Datasets that store camera-frame 3D keypoints instead of an extrinsic
    # (DREAM's kpt_*_loc_*) still admit an exact GT camera pose per sample:
    # rigid (Kabsch) alignment of FK(gt angles) to the stored points - the
    # DREAM paper's own protocol recovers pose with PnP and scores ADD in the
    # camera frame, which pnp_add_m reproduces below.
    pose_gt_by_alignment = not multi_view and getattr(ds, "has_kp3d", False)
    if hasattr(ds, "with_extrinsics") and (rig_has_extrinsics or pose_gt_by_alignment):
        ds.with_extrinsics = True
    from mvropose_tpu.decode import decode_keypoints
    from mvropose_tpu.pose import solve_rig_pnp
    from mvropose_tpu.train.metrics import pose_rotation_err_deg, pose_translation_err_m

    def pose_errors(pred_hm, angle_variants, batch):
        """Recovered-pose errors per angle variant from ONE decode pass.

        Returns one (rot_errs, trans_errs, successes, adds) tuple per entry
        of `angle_variants`. rot/trans are conditional on PnP success (they
        are undefined for a failed solve; pose_success_rate is reported
        alongside). `adds` covers EVERY valid view: PnP failures enter as
        inf so the pass@10cm / AUC protocol numbers count them as failed
        frames (the DREAM papers score all frames, not just converged ones).
        """
        if "rvec" not in batch or not (rig_has_extrinsics or pose_gt_by_alignment):
            return [([], [], [], []) for _ in angle_variants]
        hm = pred_hm if multi_view else pred_hm[:, None]
        rv = np.asarray(batch["rvec"], np.float32)
        tv = np.asarray(batch["tvec"], np.float32)
        Kb = np.asarray(batch["K"], np.float32)
        base = np.asarray(batch["base_rotation"], np.float32)
        if not multi_view:  # (B, ...) -> (B, 1, ...) single-view pseudo-rig
            rv, tv, Kb, base = rv[:, None], tv[:, None], Kb[:, None], base[:, None]
        B, V = hm.shape[0], hm.shape[1]
        xy, conf = jax.vmap(
            lambda h: decode_keypoints(h, image_hw=tuple(args.image_hw), mode="refine")
        )(hm)
        vm = (
            np.asarray(batch["view_mask"], bool)
            if multi_view else np.asarray(batch["sample_weight"]) > 0
        ).reshape(B, V)
        base_j, K_j = jnp.asarray(base), jnp.asarray(Kb)
        keys = jax.random.split(jax.random.PRNGKey(13), B)

        def variant_metrics(out, ang):
            rot = np.asarray(pose_rotation_err_deg(out["rvec"], jnp.asarray(rv)))
            trans = np.asarray(pose_translation_err_m(out["tvec"], jnp.asarray(tv)))
            succ = np.asarray(out["success"])
            ok = vm & succ
            # DREAM-protocol ADD: FK(angles) mapped through the PnP-recovered
            # pose vs the stored camera-frame GT points.
            adds = []
            if "keypoints_3d_cam" in batch:
                from mvropose_tpu.geometry.rotations import rodrigues_to_matrix

                fk_kp = rig.robot.keypoints_from_fk(
                    forward_kinematics_batch(rig.robot, ang)
                )  # (B, J, 3) robot base frame
                # Per-view base rotation first: solve_rig_pnp's object points
                # are base-rotated FK, so the recovered pose maps THAT frame
                # into the camera - the ADD transform must match (identity
                # for dream_panda, but load-bearing for any kp3d dataset with
                # per-view base corrections).
                fk_obj = jnp.einsum("bvij,bkj->bvki", base_j, jnp.asarray(fk_kp))
                Rp = jax.vmap(jax.vmap(rodrigues_to_matrix))(out["rvec"])  # (B,V,3,3)
                pts_cam = (
                    jnp.einsum("bvij,bvkj->bvki", Rp, fk_obj)
                    + out["tvec"][:, :, None, :]
                )  # (B, V, J, 3)
                d = jnp.linalg.norm(
                    pts_cam - jnp.asarray(batch["keypoints_3d_cam"])[:, None], axis=-1
                )
                d_mean = np.asarray(jnp.mean(d, axis=-1))  # (B, V)
                adds = list(np.where(succ, d_mean, np.inf)[vm])
            return (list(rot[ok]), list(trans[ok]),
                    list(succ[vm].astype(np.float32)), adds)

        results = []
        out_pred = None  # variant 0's PnP output, the refinement's init
        for ang in angle_variants:
            out = jax.vmap(
                lambda xy_s, c_s, ang_s, base_s, K_s, k: solve_rig_pnp(
                    xy_s, c_s, ang_s, base_s, K_s, rig.robot, key=k
                )
            )(xy, conf, ang, base_j, K_j, keys)
            if out_pred is None:
                out_pred = out
            results.append(variant_metrics(out, ang))
        if getattr(args, "refine_pose", False):
            # Joint (pose, angles) refinement from the pred-angle PnP init:
            # the pred angles become a PRIOR, not ground truth - see
            # pose/refine.py for the measured motivation and bounds. Always
            # "succeeds" (LM returns a pose for every frame), so its all-
            # frames ADD has no inf entries by construction.
            from mvropose_tpu.pose import refine_rig_pose_angles

            rkeys = jax.random.split(jax.random.PRNGKey(29), B)
            ref = jax.vmap(
                lambda xy_s, c_s, ang_s, rv0, tv0, base_s, K_s, m_s, k: (
                    refine_rig_pose_angles(
                        xy_s, c_s, ang_s, rv0, tv0, base_s, K_s, rig.robot, k,
                        view_mask=m_s,
                        sigma_px=args.refine_sigma_px,
                        sigma_prior=args.refine_sigma_prior,
                    )
                )
            )(xy, conf, angle_variants[0], out_pred["rvec"], out_pred["tvec"],
              base_j, K_j, jnp.asarray(vm), rkeys)
            out_ref = {
                "rvec": ref["rvec"], "tvec": ref["tvec"],
                "success": np.ones((B, V), dtype=bool),
            }
            results.append(variant_metrics(out_ref, ref["angles"]))
            refined_ang_abs.extend(
                np.abs(np.asarray(ref["angles"]) - np.asarray(batch["angles"]))[
                    np.asarray(vm).any(axis=1)
                ].mean(axis=1)
            )
        return results

    # Weighted accumulators: (sum, weight) per metric, so short final batches
    # contribute by their actual sample count instead of skewing a
    # mean-of-batch-means.
    acc = {k: [0.0, 0.0] for k in ("pck", "mae", "add", "auc", "kp_px", "kp_px2")}

    def bump(key, value, weight):
        if weight > 0:
            acc[key][0] += float(value) * weight
            acc[key][1] += weight

    tri_adds, tri_obs, pose_rots, pose_trans, pose_succ, pnp_adds, n = [], [], [], [], [], [], 0
    pose_rots_gt, pose_trans_gt, pnp_adds_gt = [], [], []
    pose_rots_ref, pose_trans_ref, pnp_adds_ref, refined_ang_abs = [], [], [], []
    per_joint_sum = None
    img_h, img_w = args.image_hw
    for batch in ds.batches(args.batch_size):
        imgs, gt_hms = pre(
            jnp.asarray(batch["images_u8"]), jnp.asarray(batch["cam_idx"]),
            jnp.asarray(batch["keypoints_2d"]),
        )
        imgs = maybe_occlude(imgs)
        if multi_view:
            pm = None
            if geo3d:
                from mvropose_tpu.geometry.triangulation import heatmap_projection_matrices

                pm = jax.vmap(
                    lambda r, t, K: heatmap_projection_matrices(
                        r, t, K, tuple(args.image_hw), rig.heatmap_size
                    )
                )(jnp.asarray(batch["rvec"]), jnp.asarray(batch["tvec"]),
                  jnp.asarray(batch["K"]))
            pred_hm, pred_ang = apply_fn(
                imgs, jnp.asarray(batch["view_ids"]), jnp.asarray(batch["view_mask"]), pm
            )
            valid = jnp.asarray(batch["view_mask"])[..., None]
            n_valid = float(jnp.sum(batch["view_mask"]))
        else:
            pred_hm, pred_ang = apply_fn(imgs)
            valid = jnp.asarray(batch["sample_weight"])[..., None]
            n_valid = float(jnp.sum(batch["sample_weight"]))
        # PCK in IMAGE pixels against the exact GT keypoints in the batch
        # (the reference decodes to image scale too, Fr5_model_train.ipynb
        # cell 14, 1372-1403) - not against re-decoded GT heatmaps, which
        # would add argmax quantization on the GT side. k_px is image-space.
        pred_xy, _ = argmax_decode(pred_hm)
        hm_h, hm_w = pred_hm.shape[-2:]
        scale = jnp.asarray([img_w / hm_w, img_h / hm_h], jnp.float32)
        pred_xy_img = pred_xy * scale
        gt_xy_img = jnp.asarray(batch["keypoints_2d"])
        in_frame = (
            (gt_xy_img[..., 0] >= 0) & (gt_xy_img[..., 0] < img_w)
            & (gt_xy_img[..., 1] >= 0) & (gt_xy_img[..., 1] < img_h)
        )
        kp_valid = (valid > 0) & in_frame
        bump("pck", pck_at_k(pred_xy_img, gt_xy_img, k_px=args.pck_px, valid=kp_valid),
             float(jnp.sum(kp_valid)))
        # Decode pixel error of the REFINED decode (the one the PnP path
        # consumes): PCK@5 saturates long before PnP stops caring - at DREAM's
        # 128px/f~70 camera a 1 px decode error is already ~10-15 deg of
        # recovered rotation (see runs/dream_synth pnp_noise_floor), so the
        # report carries the actual noise magnitude, not just the 5px pass bit.
        ref_xy = decode_keypoints(pred_hm, image_hw=tuple(args.image_hw), mode="refine")[0]
        kp_err = jnp.linalg.norm(ref_xy - gt_xy_img, axis=-1)
        kw = kp_valid.astype(jnp.float32)
        n_kp = float(jnp.sum(kw))
        if n_kp > 0:
            bump("kp_px", jnp.sum(kp_err * kw) / n_kp, n_kp)
            bump("kp_px2", jnp.sum(jnp.square(kp_err) * kw) / n_kp, n_kp)
        gt_ang = jnp.asarray(batch["angles"])
        # Per-SAMPLE validity for the angle-space metrics: a failed image load
        # (weight-0 slot) feeds the model a zero image - averaging its garbage
        # prediction with full weight silently corrupts MAE/ADD.
        samp_w = (
            jnp.any(jnp.asarray(batch["view_mask"]), axis=1)
            if multi_view else jnp.asarray(batch["sample_weight"]) > 0
        ).astype(jnp.float32)
        n_samp = float(jnp.sum(samp_w))
        bump("mae", angle_mae(pred_ang, gt_ang, valid=samp_w), n_samp)
        # Per-joint MAE (the synthetic harness's committed-run format): the
        # scalar hides which joints converged vs sit at the prior floor.
        pj = jnp.sum(jnp.abs(pred_ang - gt_ang) * samp_w[:, None], axis=0)
        per_joint_sum = per_joint_sum + np.asarray(pj) if per_joint_sum is not None else np.asarray(pj)
        # ADD in FK space: distance between predicted- and GT-angle skeletons.
        fk_pred = forward_kinematics_batch(rig.robot, pred_ang)
        fk_gt = forward_kinematics_batch(rig.robot, gt_ang)
        bump("add", add_metric(fk_pred, fk_gt, valid=samp_w[:, None]), n_samp)
        bump("auc", add_auc(fk_pred, fk_gt, valid=samp_w), n_samp)
        if tri_add is not None:
            ta, to = tri_add(pred_hm, batch, np.asarray(fk_gt))
            tri_adds.extend(ta); tri_obs.extend(to)
        if pose_gt_by_alignment and "keypoints_3d_cam" in batch:
            # Per-sample GT camera pose by rigid alignment of the GT-angle
            # FK skeleton to the stored camera-frame points (exact when the
            # stored points are rigid FK images, which the DREAM schema
            # guarantees).
            from mvropose_tpu.geometry.rotations import kabsch, matrix_to_rodrigues

            fk_kp_gt = rig.robot.keypoints_from_fk(fk_gt)  # (B, J, 3)
            # Align the same object points PnP solves against (base-rotated
            # FK) so the GT pose lives in the same frame as the recovered
            # one; identity for dream_panda but exact in general.
            fk_kp_gt = jnp.einsum(
                "bij,bkj->bki",
                jnp.asarray(batch["base_rotation"], jnp.float32), fk_kp_gt,
            )
            R_gt, t_gt = jax.vmap(kabsch)(fk_kp_gt, jnp.asarray(batch["keypoints_3d_cam"]))
            batch = dict(batch)
            batch["rvec"] = np.asarray(jax.vmap(matrix_to_rodrigues)(R_gt))
            batch["tvec"] = np.asarray(t_gt)
        # Variant 2 (DREAM's deployment regime): joint states are MEASURED
        # (the robot reports them), only the camera pose is unknown - PnP
        # with GT-angle FK object points is the protocol number, and is also
        # the decode+PnP floor of the pred-angle variant. Both variants share
        # one heatmap decode inside pose_errors.
        variants = [pred_ang] + ([gt_ang] if pose_gt_by_alignment else [])
        res = pose_errors(pred_hm, variants, batch)
        r, t, s, a = res[0]
        pose_rots.extend(r); pose_trans.extend(t); pose_succ.extend(s)
        pnp_adds.extend(a)
        if pose_gt_by_alignment:
            rg, tg, _, ag = res[1]
            pose_rots_gt.extend(rg); pose_trans_gt.extend(tg); pnp_adds_gt.extend(ag)
        if args.refine_pose and len(res) > len(variants):
            rr, tr, _, ar = res[-1]  # refined block is appended last
            pose_rots_ref.extend(rr); pose_trans_ref.extend(tr)
            pnp_adds_ref.extend(ar)
        n += int(n_valid)
    from mvropose_tpu.train.metrics import pass_rate_auc

    if n == 0:
        raise SystemExit(
            "eval: every sample had weight 0 - no image loaded at the expected "
            f"resolution {tuple(args.image_hw)} (the loader requires exact "
            "size; pass --image-hw matching the dataset's images) or all "
            "paths failed to read."
        )
    mean = lambda k: acc[k][0] / max(acc[k][1], 1e-9)
    report = {
        f"pck@{args.pck_px}px": mean("pck"),  # k_px in image pixels
        "kp_px_err_mean": mean("kp_px"),  # refined-decode error, image px
        "kp_px_err_rms": float(np.sqrt(mean("kp_px2"))),
        "angle_mae": mean("mae"),
        "angle_mae_per_joint": [
            round(float(v), 4) for v in (per_joint_sum / max(acc["mae"][1], 1e-9))
        ] if per_joint_sum is not None else [],
        "add_m": mean("add"),
        "add_auc@10cm": mean("auc"),
        "samples": n,
        "occlusion_masks": args.occlusion_masks,
    }
    if tri_adds:
        report["triangulated_add_m"] = float(np.mean(tri_adds))
        # Coverage of the conditional mean above: fraction of keypoints with
        # >= 2 confident views, averaged over valid samples.
        report["triangulated_obs_rate"] = float(np.mean(tri_obs))
    if pose_succ:
        report["pose_success_rate"] = float(np.mean(pose_succ))
        if pose_rots:
            report["pose_rot_err_deg"] = float(np.mean(pose_rots))
            report["pose_trans_err_m"] = float(np.mean(pose_trans))
        def _pnp_add_report(adds, suffix=""):
            # DREAM-protocol ADD over ALL frames: PnP failures sit in `adds`
            # as inf, so pass@10cm / AUC score them as never-passing (the
            # papers' protocol); the mean is over converged solves only (an
            # inf mean carries no information) and is labeled as such.
            v = np.asarray(adds)
            finite = v[np.isfinite(v)]
            if finite.size:
                report[f"pnp_add_m_converged{suffix}"] = float(np.mean(finite))
            report[f"pnp_add_pass@10cm{suffix}"] = float(np.mean(v <= 0.10))
            report[f"pnp_add_auc@10cm{suffix}"] = float(pass_rate_auc(jnp.asarray(v)))

        if pnp_adds:
            _pnp_add_report(pnp_adds)
        if pose_rots_gt:
            report["pose_rot_err_deg_gt_angles"] = float(np.mean(pose_rots_gt))
            report["pose_trans_err_m_gt_angles"] = float(np.mean(pose_trans_gt))
        if pnp_adds_gt:
            _pnp_add_report(pnp_adds_gt, suffix="_gt_angles")
        if pose_rots_ref:
            # NOTE the raw rot number retains the base-axis gauge error (any
            # joint-1 prior error is reprojection-invisible and transfers to
            # the pose); the _refined ADD metrics are the gauge-invariant
            # accuracy measure - see pose/refine.py and tests/test_refine.py.
            report["pose_rot_err_deg_refined"] = float(np.mean(pose_rots_ref))
            report["pose_trans_err_m_refined"] = float(np.mean(pose_trans_ref))
            report["refined_angle_mae"] = float(np.mean(refined_ang_abs))
        if pnp_adds_ref:
            _pnp_add_report(pnp_adds_ref, suffix="_refined")
    print(json.dumps(report))
    return 0


def _cmd_serve(args) -> int:
    import jax
    import jax.numpy as jnp

    from mvropose_tpu.rig import FileReplaySource, StreamingPipeline, SyntheticSource

    hw = tuple(args.frame_hw)
    if args.replay_dir:
        paths = sorted(Path(args.replay_dir).glob("*.jpg")) + sorted(
            Path(args.replay_dir).glob("*.png")
        )
        chunks = np.array_split(np.asarray(paths, dtype=object), args.views)
        sources = [
            FileReplaySource(f"replay{i}", list(chunks[i]), fps=args.fps)
            for i in range(args.views)
        ]
    else:
        sources = [
            SyntheticSource(f"synthetic{i}", hw=hw, fps=args.fps) for i in range(args.views)
        ]

    from mvropose_tpu.decode import decode_keypoints
    from mvropose_tpu.models import EstimatorConfig, MultiViewPoseEstimator
    from mvropose_tpu.models.vit import ViTConfig

    # With --recover-pose, head arity must match the robot (heatmap channels
    # = keypoints, regressed angles = joints).
    n_joints, n_angles = 8, 7
    if args.recover_pose:
        from mvropose_tpu.geometry.robots import get_robot as _get_robot

        _r = _get_robot(args.pose_robot)
        n_joints, n_angles = _r.n_keypoints, _r.n_joints
    saved = _read_model_config(args.params) if args.params else None
    single_view_ckpt = saved is not None and saved[2] == "single_view"
    if saved is not None:
        cfg, model_size, kind = saved
        if kind == "multi_view" and args.views > cfg.max_views:
            raise SystemExit(
                f"--views {args.views} exceeds the trained max_views {cfg.max_views}"
            )
        if args.recover_pose and (cfg.num_joints, cfg.num_angles) != (n_joints, n_angles):
            raise SystemExit(
                f"--pose-robot {args.pose_robot} expects {n_joints} keypoints/"
                f"{n_angles} angles but the checkpoint has {cfg.num_joints}/"
                f"{cfg.num_angles}"
            )
        print(f"model architecture restored from {Path(args.params).parent / 'model_config.json'}")
    else:
        model_size = args.model_size
        vit = ViTConfig(
            image_size=args.backbone_native_size or args.model_size,
            patch_size=args.patch_size, hidden_size=args.hidden_size,
            num_layers=args.num_layers, num_heads=args.hidden_size // 64,
            num_register_tokens=args.register_tokens, dtype="bfloat16",
            use_rope=getattr(args, "rope", False),
            layer_norm_eps=1e-5 if getattr(args, "rope", False) else 1e-6,
        )
        cfg = EstimatorConfig(vit=vit, num_joints=n_joints, num_angles=n_angles,
                              max_views=args.views, angle_head=args.angle_head)
    if single_view_ckpt:
        # Single-view checkpoints (the DREAM / Fr5 single-view regimes) serve
        # every camera as one device batch of size V through the per-view
        # model; per-camera angle estimates are masked-averaged into the
        # rig's one physical state (the reference serves single-view models
        # per camera too, DIP_REAL.py:218-271 - one forward per window).
        from mvropose_tpu.models import SingleViewPoseEstimator

        model = SingleViewPoseEstimator(cfg)
        shapes = jax.eval_shape(
            lambda k: model.init(k, jnp.zeros((args.views, model_size, model_size, 3))),
            jax.random.PRNGKey(0),
        )
    else:
        model = MultiViewPoseEstimator(cfg)
        # geometric3d's DLT branch asserts proj_mats is present even under
        # eval_shape - feed a zeros template (the real rig matrices bind
        # below once --summary extrinsics are validated).
        pm0 = (
            jnp.zeros((1, args.views, 3, 4))
            if cfg.angle_head == "geometric3d" else None
        )
        shapes = jax.eval_shape(
            lambda k: model.init(
                k,
                jnp.zeros((1, args.views, model_size, model_size, 3)),
                jnp.zeros((1, args.views), jnp.int32),
                jnp.zeros((1, args.views), bool),
                proj_mats=pm0,
            ),
            jax.random.PRNGKey(0),
        )
    # Zeros template EXCEPT BatchNorm running vars (init = ones; a zero
    # running var makes rsqrt(var+eps) explode even for the params-less
    # pipeline-smoke serve).
    def _template_leaf(keypath, s):
        name = str(getattr(keypath[-1], "key", "")) if keypath else ""
        fill = jnp.ones if name == "var" else jnp.zeros
        return fill(s.shape, s.dtype)

    variables = jax.tree_util.tree_map_with_path(_template_leaf, shapes)
    if args.params:
        variables = _load_variables_checked(args.params, variables, cfg.angle_head)
    if getattr(args, "int8_backbone", False):
        model, cfg, variables = _int8ify(
            type(model), cfg, variables, attn=getattr(args, "int8_attention", False)
        )
        print(
            "backbone quantized to int8 (per-channel weights, dynamic per-token "
            "activations)"
            + (" + int8-prob attention" if getattr(args, "int8_attention", False) else "")
        )
    view_ids = jnp.arange(args.views, dtype=jnp.int32)[None]

    # Optional per-camera undistortion: --calib-dir + --camera-keys binds the
    # i-th source to "{view}_{cam}" calib (the reference undistorts every
    # grabbed frame, DIP_REAL.py:105; here it is one precomputed remap gather
    # fused into the jitted step).
    # Undistortion runs on HOST (cv2.remap): the XLA-gather device remap is
    # ~300x slower on TPU at camera resolutions (see data/dataset.py).
    cv2_maps = None
    camera_Ks = None  # (V, 3, 3) real intrinsics when --calib-dir is bound
    camera_views = None  # view name per source (from --camera-keys)
    if args.calib_dir and args.camera_keys:
        from mvropose_tpu.geometry.camera import undistort_map

        keys = args.camera_keys.split(",")
        assert len(keys) == args.views, "--camera-keys must list one key per view"
        cv2_maps, camera_Ks, camera_views = [], [], []
        # Host-side grids: compute on the CPU device (eager JAX through the
        # tunneled TPU costs minutes per camera; see _RigGeometry.remaps).
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            for key in keys:
                matches = sorted(Path(args.calib_dir).glob(f"{key.split('_')[0]}_*_{key.split('_')[1]}_calib.json"))
                assert matches, f"no calib file for camera key {key}"
                data = json.loads(matches[0].read_text())
                K = jnp.asarray(data["camera_matrix"], jnp.float32)
                dist = jnp.asarray(data["distortion_coeffs"], jnp.float32).reshape(-1)
                grid = np.asarray(undistort_map(K, dist, hw[0], hw[1]))
                cv2_maps.append((np.ascontiguousarray(grid[1], np.float32),
                                 np.ascontiguousarray(grid[0], np.float32)))
                camera_Ks.append(np.asarray(data["camera_matrix"], np.float32))
                camera_views.append(key.split("_")[0])

    recover = None
    if args.recover_pose:
        from mvropose_tpu.geometry.robots import get_robot
        from mvropose_tpu.pose import recover_pose_batch

        robot = get_robot(args.pose_robot)
        # Real intrinsics + per-view base rotations when calibration is bound
        # (the reference serve path projects with the per-view calib K and the
        # robot's base correction, Fr5_model_train.ipynb cell 14); otherwise a
        # demo-grade nominal K for synthetic sources.
        if camera_Ks is not None:
            Ks_pose = jnp.asarray(np.stack(camera_Ks))
            bases = jnp.asarray(
                np.stack([robot.base_rotation(v) for v in camera_views]).astype(np.float32)
            )
        else:
            Ks_pose = jnp.asarray(
                np.tile(
                    np.array([[737.0, 0, hw[1] / 2], [0, 737.0, hw[0] / 2], [0, 0, 1]], np.float32),
                    (args.views, 1, 1),
                )
            )
            bases = jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (args.views, 1, 1)))

        # ArUco-summary fallback extrinsics (--summary): on PnP failure the
        # reference falls back to projecting through the calibrated extrinsic
        # (Fr5_model_train.ipynb cell 14, 1676-1691). Substituted under jit.
        fb_rvec = jnp.zeros((args.views, 3), jnp.float32)
        fb_tvec = jnp.zeros((args.views, 3), jnp.float32)
        fb_valid = jnp.zeros((args.views,), bool)
        if args.summary and camera_views is not None:
            records = json.loads(Path(args.summary).read_text())
            by_key = {f"{r['view']}_{r['cam']}": r for r in records}
            fb_r, fb_t, fb_v = [], [], []
            for key in args.camera_keys.split(","):
                rec = by_key.get(key)
                if rec is None:
                    fb_r.append(np.zeros(3)); fb_t.append(np.zeros(3)); fb_v.append(False)
                    continue
                rv = np.array([rec["rvec_x"], rec["rvec_y"], rec["rvec_z"]])
                # Per-record unit tag wins over the robot's convention (same
                # resolution rule as calib/registry._load_extrinsic_record).
                if rec.get("rvec_unit", robot.extrinsic_rvec_unit) == "deg":
                    rv = np.deg2rad(rv)
                fb_r.append(rv)
                fb_t.append(np.array([rec["tvec_x"], rec["tvec_y"], rec["tvec_z"]]))
                fb_v.append(True)
            fb_rvec = jnp.asarray(np.stack(fb_r), jnp.float32)
            fb_tvec = jnp.asarray(np.stack(fb_t), jnp.float32)
            fb_valid = jnp.asarray(np.asarray(fb_v))

        def recover(hm, ang):
            pose = recover_pose_batch(
                hm, ang, bases, Ks_pose, robot, hw,
                use_pallas=jax.default_backend() == "tpu",
                refine=args.refine_pose,
                refine_sigma_px=args.refine_sigma_px,
                refine_sigma_prior=args.refine_sigma_prior,
            )
            use_fb = (~pose["success"]) & fb_valid  # (V,)
            pose["used_fallback"] = use_fb
            pose["rvec"] = jnp.where(use_fb[:, None], fb_rvec, pose["rvec"])
            pose["tvec"] = jnp.where(use_fb[:, None], fb_tvec, pose["tvec"])
            return pose

    # A geometric3d checkpoint needs per-view projection matrices for its
    # DLT branch: built from the ArUco-summary extrinsics + calib intrinsics.
    serve_pm = None
    if cfg.angle_head == "geometric3d":
        if not (args.recover_pose and args.summary and camera_Ks is not None):
            raise SystemExit(
                "a geometric3d checkpoint needs --recover-pose --summary "
                "--calib-dir/--camera-keys so the rig's projection matrices "
                "can feed the triangulation branch"
            )
        if not bool(np.asarray(fb_valid).all()):
            raise SystemExit("--summary is missing extrinsics for some --camera-keys")
        from mvropose_tpu.geometry.triangulation import heatmap_projection_matrices

        serve_pm = heatmap_projection_matrices(
            fb_rvec, fb_tvec, Ks_pose, hw, cfg.heatmap_size
        )[None]  # (1, V, 3, 4)

    @jax.jit
    def infer(images_u8, mask):
        imgs = images_u8.astype(jnp.float32) / 255.0
        imgs = jax.image.resize(
            imgs, (args.views, model_size, model_size, 3), "bilinear"
        )
        from mvropose_tpu.data.dataset import IMAGENET_MEAN, IMAGENET_STD

        imgs = (imgs - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
        if single_view_ckpt:
            hm_v, ang_pc = model.apply(variables, imgs)  # (V,J,h,w), (V,A)
            m = mask.astype(ang_pc.dtype)[:, None]
            ang = (jnp.sum(ang_pc * m, axis=0) / jnp.maximum(jnp.sum(m), 1.0))[None]
            hm = hm_v[None]
        else:
            hm, ang = model.apply(variables, imgs[None], view_ids, mask[None],
                                  proj_mats=serve_pm)
        if recover is not None:
            pose = recover(hm[0], ang[0])
            return pose["keypoints_xy"], pose["confidence"], ang, pose["rvec"], pose["tvec"], pose["success"]
        xy, conf = decode_keypoints(hm[0], image_hw=hw, use_pallas=jax.default_backend() == "tpu")
        return xy, conf, ang

    # Per-camera undistort runs across a thread pool: cv2.remap releases the
    # GIL, so V cameras cost ~one camera's remap wall time instead of V (the
    # reference got the same concurrency from its per-camera threads,
    # /root/reference/DIP_REAL.py:98-127; a serial gather loop at 4x720p
    # measured 40 ms - above the 33 ms budget of a 30 FPS rig by itself).
    undistort_pool = None
    if cv2_maps is not None:
        from concurrent.futures import ThreadPoolExecutor

        undistort_pool = ThreadPoolExecutor(max_workers=len(cv2_maps))

    def dispatch_np(images, mask):
        """Host phase: undistort + H2D + async device dispatch (no fetch)."""
        if cv2_maps is not None:
            import cv2

            out = np.empty_like(images)

            def _remap(i):
                # dst= writes in place into the batch slot - no final stack
                # copy of the ~11 MB batch.
                cv2.remap(
                    images[i], cv2_maps[i][0], cv2_maps[i][1],
                    cv2.INTER_LINEAR, dst=out[i],
                )

            list(undistort_pool.map(_remap, range(len(images))))
            images = out
        return infer(jnp.asarray(images), jnp.asarray(mask))

    def fetch_np(handle):
        # Fetch results to host every tick: the app's consumers (display,
        # robot control) live on host, and without the fetch the reported
        # tick/s measures async dispatch, not completed inference (on the
        # tunneled-TPU backend block_until_ready does not synchronize at
        # all). The arrays are tiny (keypoints/confidences/angles). In the
        # default double-buffered mode this fetch blocks on frame-set N-1
        # while the device already works on N (StreamingPipeline docstring).
        return tuple(np.asarray(o) for o in handle)

    def infer_np(images, mask):
        return fetch_np(dispatch_np(images, mask))

    # Live tiled display (the reference's cv2.imshow canvas loop,
    # DIP_REAL.py:218-271): skeleton overlays per camera, placeholder panels
    # for failed/masked cameras, 'q' to quit in window mode. 'dir' mode is
    # the headless-safe writer (same canvas, PNG files).
    on_result = None
    quit_flag = {"q": False}
    if args.display != "off":
        from mvropose_tpu.rig.viewer import draw_keypoints_overlay, tile_frames

        if args.recover_pose:
            links = robot.links
        else:
            # Chain links over the CHECKPOINT's keypoint count (cfg comes
            # from model_config.json), not the default robot's: a 7-keypoint
            # DREAM checkpoint would otherwise get an out-of-range (6,7)
            # link silently dropped by the overlay's bounds guard.
            links = tuple((i, i + 1) for i in range(cfg.num_joints - 1))
        names = [s.serial for s in sources]
        half = (len(names) + 1) // 2
        layout = (tuple(names[:half]),) if len(names) <= 2 else (
            tuple(names[:half]), tuple(names[half:])
        )
        display_dir = Path(args.display_dir)
        if args.display == "dir":
            display_dir.mkdir(parents=True, exist_ok=True)
        tick_counter = {"n": 0}

        def on_result(result, frames):
            import cv2

            xy, conf = np.asarray(result[0]), np.asarray(result[1])
            panels = {}
            for i, f in enumerate(frames):
                if f is None:
                    panels[names[i]] = None
                    continue
                panels[names[i]] = draw_keypoints_overlay(
                    f.image, xy[i], links, scores=conf[i], min_score=0.6
                )
            canvas = tile_frames(panels, layout=layout, frame_hw=hw)
            tick_counter["n"] += 1
            if args.display == "window":
                cv2.imshow("mvropose_tpu serve", canvas[:, :, ::-1])
                if (cv2.waitKey(1) & 0xFF) == ord("q"):
                    quit_flag["q"] = True
            elif tick_counter["n"] % args.display_every == 1:
                cv2.imwrite(
                    str(display_dir / f"canvas_{tick_counter['n']:06d}.png"),
                    canvas[:, :, ::-1],
                )

    if args.no_overlap:
        pipe = StreamingPipeline(
            sources, infer_np, on_result=on_result, frame_hw=hw, max_skew_s=args.max_skew
        )
    else:
        pipe = StreamingPipeline(
            sources, dispatch_np, on_result=on_result, frame_hw=hw,
            max_skew_s=args.max_skew, fetch_fn=fetch_np,
        )
    pipe.start()
    try:
        print(f"active cameras: {len(pipe.active)}, failed: {len(pipe.failed)}")
        if not pipe.active:
            raise SystemExit("serve: every camera source failed to initialize")
        # Warmup tick to compile - bounded: spinning forever here used to be
        # the failure mode for a frame-size mismatch (sources deliver frames
        # that tick() drops because they are not --frame-hw) or a rig whose
        # cameras all died after init.
        import time as _time

        warmup_deadline = _time.perf_counter() + max(60.0, args.duration)
        while pipe.tick() is None:
            if _time.perf_counter() >= warmup_deadline:
                raise SystemExit(
                    "serve: no frame inferred within "
                    f"{max(60.0, args.duration):.0f}s - "
                    f"{pipe.stats.skipped_resolution} frames were dropped for "
                    f"not matching --frame-hw {hw}; check the source "
                    "resolution, or whether every camera stalled."
                )
            _time.sleep(0.0005)
        if quit_flag["q"]:
            stats = pipe.stats
        else:
            pipe.stats = type(pipe.stats)(
                start_time_s=_time.perf_counter(), overlapped=pipe.fetch_fn is not None
            )
            end = _time.perf_counter() + args.duration
            while _time.perf_counter() < end and not quit_flag["q"]:
                before = pipe.stats.ticks
                pipe.tick()
                if pipe.stats.ticks == before:
                    _time.sleep(0.0005)  # no new frames: don't burn the core
            if pipe.fetch_fn is not None:
                pipe.drain()
            stats = pipe.stats
    finally:
        pipe.stop()
        if args.display == "window":
            import cv2

            cv2.destroyAllWindows()
    print(
        f"served {stats.ticks} ticks ({stats.frames_processed} camera frames) "
        f"at {stats.fps:.2f} tick/s = {stats.camera_fps:.2f} camera-frames/s"
    )
    if stats.overlapped and stats.ticks:
        print(
            f"overlap: host {1e3 * stats.total_step_time_s / stats.ticks:.1f} ms/tick "
            f"+ fetch {1e3 * stats.total_fetch_time_s / stats.ticks:.1f} ms/tick "
            f"(wall {1e3 / max(stats.fps, 1e-9):.1f} ms/tick)"
        )
    return 0


def _cmd_visualize(args) -> int:
    """GT sanity panels: FK + projection skeleton overlays on real images
    (the reference's visualization notebooks as a command)."""
    import pandas as pd

    from mvropose_tpu.data import builders
    from mvropose_tpu.rig.viewer import draw_keypoints_overlay
    from mvropose_tpu.data.dataset import _load_image_rgb

    rig = _load_rig_from_args(args)
    df = pd.concat([pd.read_csv(c) for c in args.csv], ignore_index=True)
    image_hw = tuple(args.image_hw)
    if args.robot == "fr3" and args.multi_view:
        # FR3 multi-view group panels: sample groups per group size and draw
        # one GT-overlay tile per view (the reference's
        # visualize_samples_by_group_size, MvRoPose_FR3.py:633-728).
        import cv2

        from mvropose_tpu.data.dataset import SingleViewSample, _load_image_rgb as _load

        ds = builders.build_fr3_multi_view(df, rig, image_hw, tolerance_s=args.tolerance)
        out_dir = Path(args.out_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        rng = np.random.default_rng(args.seed)
        by_size: dict[int, list[int]] = {}
        for gi, g in enumerate(ds.groups):
            by_size.setdefault(len(g["views"]), []).append(gi)
        written = 0
        for size, idxs in sorted(by_size.items()):
            chosen = rng.choice(
                len(idxs), size=min(args.num_samples, len(idxs)), replace=False
            )
            for c in chosen:
                g = ds.groups[idxs[int(c)]]
                angles = np.asarray(g["joint_angles"], np.float32)[: rig.robot.n_joints]
                tiles = []
                for rv in ds.resolve_group_views(g):
                    img = _load(rv["image_path"])
                    if img is None:
                        continue
                    ci = ds.geometry.key_to_idx[rv["camera_key"]]
                    img = ds.geometry.undistort_host(img, ci)
                    s = SingleViewSample(
                        image_path=rv["image_path"], camera_key=rv["camera_key"],
                        view=rv["view"], angles=angles,
                    )
                    kps = ds.geometry.gt_keypoints(s, rv["extr_key"])
                    tiles.append(draw_keypoints_overlay(img, kps, rig.robot.links))
                if not tiles:
                    continue
                min_h = min(t.shape[0] for t in tiles)
                tiles = [
                    cv2.resize(t, (int(t.shape[1] * min_h / t.shape[0]), min_h))
                    for t in tiles
                ]
                canvas = np.hstack(tiles)
                out = out_dir / f"group{size}view_{idxs[int(c)]:05d}.png"
                cv2.imwrite(str(out), canvas[:, :, ::-1])
                written += 1
        print(f"wrote {written} multi-view GT group panels to {out_dir}")
        return 0
    if args.robot == "fr5":
        ds = builders.build_fr5_single_view(df, rig, image_hw)
    elif args.robot == "fr3":
        ds = builders.build_fr3_single_view(df, rig, image_hw)
    elif args.robot == "meca500":
        ds = builders.build_meca500_single_view(df, rig, image_hw)
    elif args.robot == "meca_insertion":
        ds = builders.build_meca_insertion_single_view(df, rig, image_hw)
    elif args.robot == "dream":
        ds = builders.build_dream_single_view(df, rig, image_hw)
    else:
        raise SystemExit("visualize supports single-view robots")
    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    idxs = rng.choice(len(ds.samples), size=min(args.num_samples, len(ds.samples)), replace=False)
    import cv2

    written = 0
    for i in idxs:
        s = ds.samples[int(i)]
        img = _load_image_rgb(s.image_path)
        if img is None:
            continue
        # GT keypoints live on the undistorted image (projection uses zero
        # distortion) - undistort before overlaying, as the reference
        # notebooks do (Fr5_vis.ipynb cell 0).
        if img.shape[:2] == tuple(ds.geometry.image_hw):
            img = ds.geometry.undistort_host(img, ds.geometry.key_to_idx[s.camera_key])
        kps = ds.geometry.gt_keypoints(s)
        panel = draw_keypoints_overlay(img, kps, rig.robot.links)
        out = out_dir / f"gt_overlay_{Path(s.image_path).stem}.png"
        cv2.imwrite(str(out), panel[:, :, ::-1])
        written += 1
    print(f"wrote {written} GT overlay panels to {out_dir}")
    return 0


def _cmd_profile(args) -> int:
    """Per-stage pipeline timing (the reference's manual profiler,
    MV-model.ipynb cell 4, as a command): backbone / full forward / decode."""
    import jax
    import jax.numpy as jnp

    from mvropose_tpu.decode import decode_keypoints
    from mvropose_tpu.models import EstimatorConfig, MultiViewPoseEstimator
    from mvropose_tpu.models.vit import ViTBackbone, ViTConfig
    from mvropose_tpu.utils.timing import StageTimer

    vit = ViTConfig(
        image_size=args.model_size, patch_size=16, hidden_size=args.hidden_size,
        num_layers=args.num_layers, num_heads=args.hidden_size // 64, dtype="bfloat16",
    )
    cfg = EstimatorConfig(vit=vit, num_joints=8, num_angles=7, max_views=args.views)
    B, V, S = 1, args.views, args.model_size
    images = jax.random.normal(jax.random.PRNGKey(0), (B, V, S, S, 3), jnp.float32)
    vids = jnp.tile(jnp.arange(V, dtype=jnp.int32), (B, 1))
    mask = jnp.ones((B, V), bool)

    bb = ViTBackbone(vit)
    flat = images.reshape(B * V, S, S, 3)
    bshapes = jax.eval_shape(lambda k: bb.init(k, flat), jax.random.PRNGKey(0))
    bparams = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), bshapes)
    bb_fn = jax.jit(lambda x: bb.apply(bparams, x)["patch_tokens"])

    model = MultiViewPoseEstimator(cfg)
    shapes = jax.eval_shape(lambda k: model.init(k, images, vids, mask), jax.random.PRNGKey(0))
    variables = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    fwd = jax.jit(lambda im: model.apply(variables, im, vids, mask))
    dec = jax.jit(
        lambda h: decode_keypoints(h, image_hw=(720, 1280), use_pallas=jax.default_backend() == "tpu")
    )

    timer = StageTimer()
    hm, _ = fwd(images)  # warmup/compile
    jax.block_until_ready(bb_fn(flat))
    jax.block_until_ready(dec(hm))
    for _ in range(args.iters):
        timer.timed("backbone", bb_fn, flat)
        hm, _ = timer.timed("full_forward", fwd, images)
        timer.timed("decode", dec, hm)
    print(timer.summary())
    full = timer.report()["full_forward"]["mean_s"]
    print(f"\nestimated frame-sets/s (forward+decode): {1.0 / (full + timer.report()['decode']['mean_s']):.2f}")
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="mvropose_tpu", description=__doc__)
    p.add_argument("--backend", choices=["auto", "cpu", "tpu"], default="auto",
                   help="force the jax platform. Under the tunneled-TPU "
                        "environment the JAX_PLATFORMS env var is overridden "
                        "at registration time, so an in-process config update "
                        "is the only reliable way to pin the CPU backend "
                        "(e.g. to keep a quick eval off a busy chip)")
    sub = p.add_subparsers(dest="cmd", required=True)

    ps = sub.add_parser("sync", help="synchronize images with joint logs")
    ps.add_argument("robot", choices=["fr5", "fr3", "dream", "meca500", "meca_insertion"])
    ps.add_argument("--base-dirs", nargs="+", required=True)
    ps.add_argument("--joint-dir", default=None)
    ps.add_argument("--out", required=True)
    ps.add_argument("--tolerance", type=float, default=0.05)
    ps.add_argument("--image-delay", type=float, default=0.0333)
    ps.add_argument("--strict", action="store_true", help="exit nonzero when 0 rows matched")
    ps.set_defaults(fn=_cmd_sync)

    pg = sub.add_parser("group", help="multi-view temporal grouping + grid search")
    pg.add_argument("--csv", required=True)
    pg.add_argument("--ts-col", default="robot_timestamp")
    pg.add_argument("--tolerance", type=float, default=0.07)
    pg.add_argument("--max-views", type=int, default=8)
    pg.add_argument("--min-views", type=int, default=2)
    pg.add_argument("--out", default=None)
    pg.set_defaults(fn=_cmd_group)

    pc = sub.add_parser("calibrate", help="camera calibration tools")
    csub = pc.add_subparsers(dest="calib_cmd", required=True)
    ci = csub.add_parser("intrinsics")
    ci.add_argument("--conf", required=True)
    ci.add_argument("--serial", required=True)
    ci.add_argument("--view", required=True)
    ci.add_argument("--resolution", default="FHD")
    ci.add_argument("--out-dir", required=True)
    cm = csub.add_parser("manual")
    cm.add_argument("--view", required=True)
    cm.add_argument("--cam", required=True)
    cm.add_argument("--tvec", type=float, nargs=3, required=True)
    cm.add_argument("--rvec-deg", type=float, nargs=3, required=True)
    cm.add_argument("--out", required=True)
    ce = csub.add_parser("extrinsics")
    ce.add_argument("--aruco-dir", required=True)
    ce.add_argument("--offsets", required=True, help="JSON {view: {marker_id: [x,y,z]}}")
    ce.add_argument("--outlier-deg", type=float, default=1.0)
    ce.add_argument("--outlier-pos", type=float, default=None,
                    help="position outlier threshold in meters (Meca-insertion used 0.001)")
    ce.add_argument("--out", required=True)
    cs = csub.add_parser("stereo-transfer")
    cs.add_argument("--summary", required=True, help="aruco summary JSON to extend in place")
    cs.add_argument("--serial-map", required=True, help="JSON {view: serial}")
    cs.add_argument("--conf-dir", required=True)
    cs.add_argument("--resolution", default="FHD1200")
    cs.add_argument("--rvec-unit", choices=["rad", "deg"], default="rad",
                    help="unit of untagged source records (reference Meca "
                         "summaries store degrees; records written by this "
                         "CLI carry an explicit rvec_unit tag)")
    cs.add_argument("--correction-offset", type=float, nargs=3, default=None,
                    help="manual tvec correction added to the derived rightcam pose "
                         "(reference RIGHT_CAM_CORRECTION_OFFSET = -0.025 0 0)")
    cc = csub.add_parser("corners", help="Meca-insertion 3-stage corner pipeline")
    cc.add_argument("--aruco-dir", required=True,
                    help="dir of view_*_cam_*.json capture files with corners_pixel")
    cc.add_argument("--calib-dir", required=True)
    cc.add_argument("--serial-map", required=True, help="JSON {view: serial}")
    cc.add_argument("--offsets", required=True, help="JSON {view: {marker_id: [x,y,z]}}")
    cc.add_argument("--marker-size", type=float, default=0.05,
                    help="marker side length in meters (MARKER_REAL_SIZE_M)")
    cc.add_argument("--out", required=True)
    pc.set_defaults(fn=_cmd_calibrate)

    pt = sub.add_parser("train", help="train an estimator")
    pt.add_argument("--robot", type=_robot_arg, required=True,
                    help="fr5|fr3|dream|meca500|meca_insertion, or a comma "
                         "list for mixed-robot training (BASELINE config 4), "
                         "e.g. --robot fr5,fr3 with one --csv per robot")
    pt.add_argument("--csv", nargs="+", required=True)
    pt.add_argument("--calib-dir", default=None)
    pt.add_argument("--aruco-summary", nargs="*", default=None)
    pt.add_argument("--dream-dirs", nargs="*", default=None,
                    help="DREAM subset dirs with _camera_settings.json (robot=dream)")
    pt.add_argument("--workdir", default="runs/default")
    pt.add_argument("--image-hw", type=int, nargs=2, default=[1080, 1920])
    pt.add_argument("--model-size", type=int, default=224)
    pt.add_argument("--hidden-size", type=int, default=768)
    pt.add_argument("--num-layers", type=int, default=12)
    pt.add_argument("--batch-size", type=int, default=16)
    pt.add_argument("--epochs", type=int, default=100)
    pt.add_argument("--val-split", type=float, default=0.1)
    pt.add_argument("--lr-kpt", type=float, default=1e-4)
    pt.add_argument("--lr-ang", type=float, default=1e-4)
    pt.add_argument("--loss-weight-kpt", type=float, default=100.0)
    pt.add_argument("--sigma", type=float, default=5.0)
    pt.add_argument("--tolerance", type=float, default=0.07)
    pt.add_argument("--single-view", action="store_true")
    pt.add_argument("--no-augment", action="store_true")
    pt.add_argument("--fk-loss-weight", type=float, default=0.0)
    pt.add_argument("--backbone-ckpt", default=None,
                    help="converted DINO weights (.pth/.pt/.bin torch state "
                         "dict or .npz) grafted into the ViT backbone - the "
                         "reference's frozen-pretrained workflow")
    pt.add_argument("--no-freeze-backbone", action="store_true",
                    help="train the backbone too (default: frozen, like the "
                         "reference's DINOv2/v3 usage)")
    pt.add_argument("--angle-head", choices=["query", "geometric", "geometric3d"],
                    default="query",
                    help="query: reference-style token-attending head; "
                         "geometric: soft-argmax of predicted heatmaps -> MLP "
                         "(beyond-reference, better-conditioned); geometric3d "
                         "(fr3 multi-view): adds a differentiable-DLT "
                         "triangulated-3D input branch through the calibrated "
                         "extrinsics")
    pt.add_argument("--patch-size", type=int, default=16)
    pt.add_argument("--register-tokens", type=int, default=0,
                    help="DINOv3-style register tokens (vitb16: 4)")
    pt.add_argument("--rope", action="store_true",
                    help="DINOv3-style rotary position embeddings (pair with "
                         "a converted facebook/dinov3-* --backbone-ckpt; "
                         "sets torch's 1e-5 LayerNorm eps)")
    pt.add_argument("--backbone-native-size", type=int, default=None,
                    help="checkpoint's native image size when it differs from "
                         "--model-size (e.g. 518 for timm DINOv2); pos-embeds "
                         "interpolate at apply time")
    pt.add_argument("--mesh", type=int, nargs=2, default=None,
                    metavar=("DATA", "MODEL"),
                    help="device mesh shape (default: all devices on the "
                         "data axis)")
    pt.add_argument("--viz-every", type=int, default=10, help="save prediction panels every N epochs")
    pt.add_argument("--wandb", action="store_true")
    pt.add_argument("--seed", type=int, default=0)
    pt.add_argument("--num-workers", type=int,
                    default=int(os.environ.get("MVROPOSE_NUM_WORKERS", "4")),
                    help="grain decode worker processes for the train stream "
                         "(0 = in-process loading; the reference used 8 torch "
                         "DataLoader workers). Env MVROPOSE_NUM_WORKERS "
                         "overrides the default (the test suite sets 0).")
    pt.set_defaults(fn=_cmd_train)

    pe = sub.add_parser("eval", help="evaluate a trained model (PCK/ADD/MAE)")
    pe.add_argument("--robot", type=_robot_arg, required=True,
                    help="robot name, or a comma list to evaluate a "
                         "mixed-robot checkpoint per robot")
    pe.add_argument("--csv", nargs="+", required=True)
    pe.add_argument("--params", required=True, help="best_params.npz")
    pe.add_argument("--angle-head", choices=["query", "geometric", "geometric3d"],
                    default="query")
    pe.add_argument("--calib-dir", default=None)
    pe.add_argument("--aruco-summary", nargs="*", default=None)
    pe.add_argument("--dream-dirs", nargs="*", default=None,
                    help="DREAM subset dirs with _camera_settings.json (robot=dream)")
    pe.add_argument("--image-hw", type=int, nargs=2, default=[1080, 1920])
    pe.add_argument("--model-size", type=int, default=224)
    pe.add_argument("--hidden-size", type=int, default=768)
    pe.add_argument("--num-layers", type=int, default=12)
    pe.add_argument("--patch-size", type=int, default=16)
    pe.add_argument("--register-tokens", type=int, default=0)
    pe.add_argument("--rope", action="store_true")
    pe.add_argument("--backbone-native-size", type=int, default=None,
                    help="(arch flags are only consulted when the params dir "
                         "has no model_config.json)")
    pe.add_argument("--batch-size", type=int, default=16)
    pe.add_argument("--sigma", type=float, default=5.0)
    pe.add_argument("--tolerance", type=float, default=0.07)
    pe.add_argument("--pck-px", type=float, default=5.0)
    pe.add_argument("--occlusion-masks", type=int, default=0,
                    help="occlusion-robustness probe: N random solid rectangles per image")
    pe.add_argument("--int8-backbone", action="store_true",
                    help="quantize the loaded checkpoint's backbone to int8 "
                         "(models/quantize.py) before evaluating - the "
                         "accuracy side of the serve-path speedup")
    pe.add_argument("--int8-attention", action="store_true",
                    help="with --int8-backbone: also run int8-probability "
                         "attention (ops/attention.int8_prob_attention) - "
                         "the accuracy side of the r5 attention-byte attack")
    pe.add_argument("--refine-pose", action="store_true",
                    help="joint (pose, angles) reprojection refinement "
                         "(pose/refine.py) on top of the pred-angle PnP: "
                         "multi-start LM with the network angles as prior; "
                         "adds *_refined pose/ADD metrics")
    pe.add_argument("--refine-sigma-px", type=float, default=1.2,
                    help="decode-noise scale for the refinement residuals "
                         "(set to the model's measured kp_px_err_mean)")
    pe.add_argument("--refine-sigma-prior", type=float, default=0.2,
                    help="angle-prior std in the robot's NATIVE unit (set to "
                         "the angle head's measured MAE: radians for "
                         "fr3/dream, degrees for fr5/meca)")
    pe.add_argument("--single-view", action="store_true")
    pe.set_defaults(fn=_cmd_eval)

    pz = sub.add_parser("visualize", help="GT skeleton overlay panels (pipeline sanity check)")
    pz.add_argument("--robot", choices=["fr5", "fr3", "dream", "meca500", "meca_insertion"], required=True)
    pz.add_argument("--multi-view", action="store_true",
                    help="fr3: grouped multi-view panels by group size "
                         "(reference visualize_samples_by_group_size)")
    pz.add_argument("--tolerance", type=float, default=0.07,
                    help="fr3 multi-view grouping tolerance (s)")
    pz.add_argument("--csv", nargs="+", required=True)
    pz.add_argument("--calib-dir", default=None)
    pz.add_argument("--aruco-summary", nargs="*", default=None)
    pz.add_argument("--dream-dirs", nargs="*", default=None,
                    help="DREAM subset dirs with _camera_settings.json (robot=dream)")
    pz.add_argument("--image-hw", type=int, nargs=2, default=[1080, 1920])
    pz.add_argument("--out-dir", required=True)
    pz.add_argument("--num-samples", type=int, default=6)
    pz.add_argument("--sigma", type=float, default=5.0)
    pz.add_argument("--seed", type=int, default=0)
    pz.set_defaults(fn=_cmd_visualize)

    pp = sub.add_parser("profile", help="per-stage pipeline timing")
    pp.add_argument("--views", type=int, default=4)
    pp.add_argument("--model-size", type=int, default=512)
    pp.add_argument("--hidden-size", type=int, default=768)
    pp.add_argument("--num-layers", type=int, default=12)
    pp.add_argument("--iters", type=int, default=20)
    pp.set_defaults(fn=_cmd_profile)

    pv = sub.add_parser("serve", help="realtime streaming rig inference")
    pv.add_argument("--replay-dir", default=None)
    pv.add_argument("--views", type=int, default=4)
    pv.add_argument("--fps", type=float, default=30.0)
    pv.add_argument("--frame-hw", type=int, nargs=2, default=[720, 1280])
    pv.add_argument("--model-size", type=int, default=512)
    pv.add_argument("--hidden-size", type=int, default=768)
    pv.add_argument("--num-layers", type=int, default=12)
    pv.add_argument("--patch-size", type=int, default=16)
    pv.add_argument("--register-tokens", type=int, default=0)
    pv.add_argument("--rope", action="store_true")
    pv.add_argument("--backbone-native-size", type=int, default=None,
                    help="(arch flags are only consulted when the params dir "
                         "has no model_config.json)")
    pv.add_argument("--duration", type=float, default=10.0)
    pv.add_argument("--no-overlap", action="store_true",
                    help="disable the double-buffered tick (dispatch N / "
                         "fetch N-1); serial gather->infer->fetch instead")
    pv.add_argument("--params", default=None, help="best_params.npz from training")
    pv.add_argument("--int8-backbone", action="store_true",
                    help="serve with the backbone quantized to int8 "
                         "(models/quantize.py; measured 1.14x on the 4cam@512 "
                         "ViT-B step, runs/int8_bench.json)")
    pv.add_argument("--int8-attention", action="store_true",
                    help="with --int8-backbone: also run int8-probability "
                         "attention (runs/attn8_ln_bench.json)")
    pv.add_argument("--angle-head", choices=["query", "geometric", "geometric3d"],
                    default="query")
    pv.add_argument("--calib-dir", default=None)
    pv.add_argument("--camera-keys", default=None,
                    help="comma-separated '{view}_{cam}' per source for undistortion")
    pv.add_argument("--recover-pose", action="store_true",
                    help="run full 6D RANSAC-PnP pose recovery per camera inside the tick")
    pv.add_argument("--refine-pose", action="store_true",
                    help="with --recover-pose: joint (pose, angles) "
                         "refinement inside the tick (pose/refine.py); the "
                         "network angles act as a prior, the decoded "
                         "keypoints re-estimate pose AND angles jointly")
    pv.add_argument("--refine-sigma-px", type=float, default=1.2)
    pv.add_argument("--refine-sigma-prior", type=float, default=0.2)
    pv.add_argument("--pose-robot", default="fr3")
    pv.add_argument("--max-skew", type=float, default=None,
                    help="mask cameras whose latest frame lags the newest by more than this (s)")
    pv.add_argument("--summary", default=None,
                    help="aruco_pose_summary.json: ArUco fallback extrinsics on PnP failure")
    pv.add_argument("--display", choices=["off", "window", "dir"], default="off",
                    help="tiled live view (reference DIP_REAL.py display loop): "
                         "'window' = cv2.imshow ('q' quits), 'dir' = write canvas PNGs")
    pv.add_argument("--display-dir", default="serve_display",
                    help="output directory for --display dir")
    pv.add_argument("--display-every", type=int, default=10,
                    help="write every Nth canvas in --display dir mode")
    pv.set_defaults(fn=_cmd_serve)

    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    import jax

    if args.backend != "auto":
        jax.config.update("jax_platforms", args.backend)
    # Persistent compilation cache (same as bench.py): a fresh train/eval/
    # serve program costs a full remote compile through the TPU tunnel
    # (minutes); re-invocations and the driver's runs then hit the cache.
    repo = Path(__file__).resolve().parents[2]
    cache = os.environ.get(
        "MVROPOSE_JAX_CACHE",
        str(repo / ".jax_cache") if (repo / ".git").exists()
        else os.path.expanduser("~/.cache/mvropose_tpu/jax_cache"),
    )
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())

"""Drive the GENUINE checked-in reference artifacts through the pipeline.

The reference ships real data artifacts this framework must ingest byte-for-
byte: 8 ZED factory calibration files
(/root/reference/dataset/All_camera_conf/SN*.conf) and 7 Fr5 capture trials
of matched indices incl. the ROI variant
(/root/reference/dataset/Fr5/Fr5_{1..7}th_250526/matched_index*.csv).
Earlier rounds exercised only synthetic copies; this script parses every real
file and runs every trial through schema normalization -> builder -> dataset
batching -> grouping. The capture images are absent from the snapshot, so
every sample must come back sample_weight=0 (the designed missing-image
failure path) with shapes/weights still exact.

Prints one JSON summary; tests/test_reference_artifacts.py pins the counts.
"""

from __future__ import annotations

import glob
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REF = Path("/root/reference/dataset")


def validate_confs() -> list[dict]:
    from mvropose_tpu.calib.zed_conf import load_stereo_params, load_zed_intrinsics

    out = []
    for conf in sorted(glob.glob(str(REF / "All_camera_conf" / "SN*.conf"))):
        rec = {"conf": Path(conf).name}
        text = Path(conf).read_text(encoding="utf-8-sig")
        for res in ("FHD", "FHD1200"):
            if f"[LEFT_CAM_{res}]" not in text:
                continue
            for side in ("left", "right"):
                intr = load_zed_intrinsics(conf, side, resolution=res)
                K = intr.camera_matrix
                assert K[0, 0] > 100 and K[1, 1] > 100, (conf, res, side)
                assert K[0, 2] > 0 and K[1, 2] > 0
                assert intr.distortion_coeffs.shape == (5,)
            rec[res.lower()] = True
        stereo_res = "FHD1200" if "[LEFT_CAM_FHD1200]" in text else "FHD"
        st = load_stereo_params(conf, resolution=stereo_res)
        assert st["baseline"] > 10.0, (conf, st)  # mm; ZED baselines are 63/120
        rec["baseline_mm"] = round(st["baseline"], 2)
        out.append(rec)
    return out


def fr5_rig_from_real_confs():
    """RigSpec with the three Fr5 cameras' GENUINE factory intrinsics.

    The real extrinsics' ArUco capture JSONs are not in the snapshot, so
    nominal ring extrinsics stand in (schema validation does not consume
    their values beyond shape/units)."""
    from mvropose_tpu.calib.registry import (
        FR5_SERIAL_TO_VIEW,
        CameraCalib,
        CameraExtrinsic,
        RigSpec,
    )
    from mvropose_tpu.calib.zed_conf import load_zed_intrinsics
    from mvropose_tpu.geometry.robots import get_robot

    calibs, extr = {}, {}
    for serial, view in FR5_SERIAL_TO_VIEW.items():
        conf = REF / "All_camera_conf" / f"SN{serial}.conf"
        for cam_side in ("left", "right"):
            intr = load_zed_intrinsics(conf, cam_side, "FHD")
            key = f"{view}_{cam_side}cam"
            calibs[key] = CameraCalib(
                camera_matrix=intr.camera_matrix,
                distortion_coeffs=intr.distortion_coeffs,
            )
            extr[key] = CameraExtrinsic(
                rvec=np.array([1.9, 1.9, -0.6]), tvec=np.array([0.0, 0.0, 2.0])
            )
    return RigSpec(
        name="fr5_real_confs",
        robot=get_robot("fr5"),
        serial_to_view=FR5_SERIAL_TO_VIEW,
        calibs=calibs,
        extrinsics=extr,
    )


def validate_trials() -> list[dict]:
    import pandas as pd

    from mvropose_tpu.data import builders
    from mvropose_tpu.data.grouping import group_by_time_tolerance

    rig = fr5_rig_from_real_confs()
    out = []
    for trial_dir in sorted(glob.glob(str(REF / "Fr5" / "Fr5_*th_250526"))):
        name = Path(trial_dir).name
        df = pd.read_csv(Path(trial_dir) / "matched_index.csv")
        n_rows = len(df)
        norm = builders.normalize_reference_index(df)
        assert set(norm.columns) >= {"image_path", "joint_1", "joint_6", "robot_timestamp"}
        ds = builders.build_fr5_single_view(norm, rig, image_hw=(270, 480))
        assert len(ds) == n_rows, (name, len(ds), n_rows)  # every row binds a camera

        batch = next(iter(ds.batches(8)))
        assert batch["images_u8"].shape == (8, 270, 480, 3)
        # Images are absent from the snapshot -> the missing-image failure
        # path must weight ALL samples 0 (never silently train on zeros).
        assert batch["sample_weight"].sum() == 0, name

        # ROI variant: dotted roi columns drive the crop path.
        droi = pd.read_csv(Path(trial_dir) / "matched_index_with_roi.csv")
        ds_roi = builders.build_fr5_roi_single_view(
            builders.normalize_reference_index(droi), rig, image_hw=(512, 512)
        )
        assert len(ds_roi) == len(droi), name
        rois = np.array([s.roi for s in ds_roi.samples])
        assert (rois[:, 2] > rois[:, 0]).all() and (rois[:, 3] > rois[:, 1]).all()

        # Multi-view grouping on the real camera timestamps: 3 serials x
        # 2 cam sides -> groups of up to 6 at the reference's Fr5 tolerance.
        groups = group_by_time_tolerance(norm, tolerance_s=0.05, max_views=6)
        sizes = np.array([len(g["views"]) for g in groups])
        assert sizes.max() <= 6
        out.append({
            "trial": name,
            "rows": n_rows,
            "roi_rows": len(droi),
            "groups": len(groups),
            "mean_group_size": round(float(sizes.mean()), 2),
        })
    return out


def main() -> None:
    confs = validate_confs()
    trials = validate_trials()
    summary = {
        "confs_parsed": len(confs),
        "trials": trials,
        "total_rows": sum(t["rows"] for t in trials),
        "confs": confs,
    }
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()

"""Mixed-robot training (BASELINE config 4): heterogeneous robots in one
fixed-shape stream via data/mixed.MixedRobotDataset.

The reference never implemented mixed-robot training (one script per robot);
these tests pin the padding contract the TPU-native form relies on:
  * keypoints pad with PAD_KEYPOINT -> rendered GT heatmap exactly zero
  * angles pad with zeros + an angle_mask that the Huber loss honors
  * angle units normalize to radians across robots (fr5 deg, fr3 rad)
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from mvropose_tpu.cli.main import main


@pytest.fixture(scope="module")
def mixed_fixture(tmp_path_factory):
    """fr5 + fr3 synthetic single-view sets in their native artifact schemas
    (scripts/make_mixed_synthetic.py), 8 samples each at 64x64."""
    out = tmp_path_factory.mktemp("mixed")
    script = Path(__file__).resolve().parents[1] / "scripts" / "make_mixed_synthetic.py"
    subprocess.run(
        [sys.executable, str(script), "--out-dir", str(out), "--robots", "fr5", "fr3",
         "--n-samples", "8", "--image-hw", "64", "64"],
        check=True, capture_output=True, timeout=600,
    )
    return out


def _children(out):
    from mvropose_tpu.calib.registry import load_rig
    from mvropose_tpu.data import builders

    rig5 = load_rig(
        "fr5", "fr5", {"38007749": "left"}, calib_dir=out / "calib",
        aruco_summary_paths=out / "fr5_aruco_pose_summary.json",
    )
    rig3 = load_rig(
        "fr3", "fr3", {"41182735": "view1"}, calib_dir=out / "calib",
        aruco_summary_paths={"pose1": out / "pose1_aruco_pose_summary.json"},
    )
    ds5 = builders.build_fr5_single_view(pd.read_csv(out / "fr5.csv"), rig5, (64, 64))
    ds3 = builders.build_fr3_single_view(pd.read_csv(out / "fr3.csv"), rig3, (64, 64))
    return ds5, ds3


def test_mixed_dataset_padding_contract(mixed_fixture):
    from mvropose_tpu.data.mixed import MixedRobotDataset, PAD_KEYPOINT

    ds5, ds3 = _children(mixed_fixture)
    ds = MixedRobotDataset([ds5, ds3], ["fr5", "fr3"])
    assert ds.num_keypoints == 8  # fr3's 8 beats fr5's 7
    assert ds.num_angles == 7     # fr3's 7 beats fr5's 6
    assert len(ds) == 16

    batch = next(iter(ds.batches(16)))
    rid = batch["robot_id"]
    assert set(rid.tolist()) == {0, 1}

    fr5_rows = rid == 0
    # fr5 (7 kp, 6 ang): channel 7 padded, angle slot 6 masked out.
    assert np.all(batch["keypoints_2d"][fr5_rows, 7] == PAD_KEYPOINT)
    assert np.all(batch["angle_mask"][fr5_rows, :6] == 1.0)
    assert np.all(batch["angle_mask"][fr5_rows, 6] == 0.0)
    assert np.all(batch["angles"][fr5_rows, 6] == 0.0)
    # fr3 rows fill every slot.
    assert np.all(batch["angle_mask"][~fr5_rows] == 1.0)
    assert np.all(batch["keypoints_2d"][~fr5_rows, :, 0] > PAD_KEYPOINT + 1.0)

    # Angle normalization: fr5 trains in radians (CSV stores degrees).
    df5 = pd.read_csv(mixed_fixture / "fr5.csv")
    csv_deg = np.sort(df5["joint_1"].to_numpy(np.float32))
    got = np.sort(batch["angles"][fr5_rows, 0]) * 180.0 / np.pi
    np.testing.assert_allclose(got, csv_deg, rtol=1e-5, atol=1e-4)

    # fr3 angles pass through unscaled (already radians).
    df3 = pd.read_csv(mixed_fixture / "fr3.csv")
    np.testing.assert_allclose(
        np.sort(batch["angles"][~fr5_rows, 0]),
        np.sort(df3["position_fr3_joint1"].to_numpy(np.float32)),
        rtol=1e-5, atol=1e-6,
    )


def test_pad_keypoint_renders_exactly_zero(mixed_fixture):
    """The padded channel's GT heatmap must be EXACTLY zero through the real
    device preprocessor - that is what lets heatmap MSE train suppression of
    channels a robot does not have, with no channel mask."""
    import jax.numpy as jnp

    from mvropose_tpu.data.dataset import make_device_preprocessor
    from mvropose_tpu.data.mixed import MixedRobotDataset

    ds5, ds3 = _children(mixed_fixture)
    ds = MixedRobotDataset([ds5, ds3], ["fr5", "fr3"])
    batch = next(iter(ds.batches(4)))
    pre = make_device_preprocessor(ds.geometry, 64, (64, 64), sigma=3.0)
    _, hms = pre(
        jnp.asarray(batch["images_u8"]), jnp.asarray(batch["cam_idx"]),
        jnp.asarray(batch["keypoints_2d"]),
    )
    hms = np.asarray(hms)
    fr5_rows = batch["robot_id"] == 0
    assert hms.shape[1] == 8
    assert np.all(hms[fr5_rows, 7] == 0.0)          # padded channel: exact zero
    assert np.all(hms[fr5_rows, :7].max((1, 2, 3)) > 0.5)  # real channels peak


def test_huber_angle_mask_drops_padded_slots():
    from mvropose_tpu.train.step import _huber_per_sample

    rng = np.random.default_rng(0)
    pred = rng.standard_normal((5, 7)).astype(np.float32)
    gt = rng.standard_normal((5, 7)).astype(np.float32)
    gt[:, 6] = 0.0
    mask = np.ones((5, 7), np.float32)
    mask[:, 6] = 0.0
    masked = np.asarray(_huber_per_sample(pred, gt, 1.0, mask))
    narrow = np.asarray(_huber_per_sample(pred[:, :6], gt[:, :6], 1.0))
    np.testing.assert_allclose(masked, narrow, rtol=1e-6)
    # Garbage in the padded slot must not leak into the loss.
    pred2 = pred.copy()
    pred2[:, 6] = 1e6
    np.testing.assert_allclose(
        np.asarray(_huber_per_sample(pred2, gt, 1.0, mask)), masked, rtol=1e-6
    )


@pytest.mark.slow
def test_cli_mixed_train_then_eval(mixed_fixture, tmp_path):
    """cli train --robot fr5,fr3 end to end, then the per-robot mixed eval."""
    out = mixed_fixture
    workdir = tmp_path / "run"
    rc = main([
        "train", "--robot", "fr5,fr3",
        "--csv", str(out / "fr5.csv"), str(out / "fr3.csv"),
        "--calib-dir", str(out / "calib"),
        "--aruco-summary", str(out / "fr5_aruco_pose_summary.json"),
        str(out / "pose1_aruco_pose_summary.json"),
        "--workdir", str(workdir), "--image-hw", "64", "64",
        "--model-size", "64", "--hidden-size", "64", "--num-layers", "1",
        "--batch-size", "4", "--epochs", "1", "--val-split", "0.25",
        "--no-augment", "--num-workers", "0",
    ])
    assert rc == 0
    rec = json.loads((workdir / "logs" / "metrics.jsonl").read_text().strip().splitlines()[-1])
    assert np.isfinite(rec["val_loss"])
    cfg = json.loads((workdir / "model_config.json").read_text())
    assert cfg["num_joints"] == 8 and cfg["num_angles"] == 7

    report = _run_eval(out, workdir)
    assert report["robots"] == ["fr5", "fr3"]
    assert report["fr5"]["angle_unit"] == "deg"
    assert report["fr3"]["angle_unit"] == "rad"
    for r in ("fr5", "fr3"):
        assert report[r]["samples"] == 8
        assert np.isfinite(report[r]["angle_mae_native"])
        assert 0.0 <= report[r]["pck@5.0px"] <= 1.0


def _run_eval(out, workdir, capsys=None):
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main([
            "eval", "--robot", "fr5,fr3",
            "--csv", str(out / "fr5.csv"), str(out / "fr3.csv"),
            "--calib-dir", str(out / "calib"),
            "--aruco-summary", str(out / "fr5_aruco_pose_summary.json"),
            str(out / "pose1_aruco_pose_summary.json"),
            "--params", str(workdir / "best_params.npz"),
            "--image-hw", "64", "64", "--batch-size", "8",
        ])
    assert rc == 0
    return json.loads(buf.getvalue().strip().splitlines()[-1])


@pytest.mark.slow
def test_cli_mixed3_train_then_eval(tmp_path_factory, tmp_path):
    """BASELINE config 4 at its NAMED scope: fr5 + FR3 + Meca insertion in one
    model - three robot families (6/7/7-col logs, deg/rad/deg units, three
    artifact schemas incl. meca_insertion's native robot_data.txt synced by
    the real sync path) through `cli train --robot fr5,fr3,meca_insertion`."""
    out = tmp_path_factory.mktemp("mixed3")
    script = Path(__file__).resolve().parents[1] / "scripts" / "make_mixed_synthetic.py"
    subprocess.run(
        [sys.executable, str(script), "--out-dir", str(out),
         "--robots", "fr5", "fr3", "meca_insertion",
         "--n-samples", "8", "--image-hw", "64", "64"],
        check=True, capture_output=True, timeout=900,
    )
    csvs = [str(out / f"{r}.csv") for r in ("fr5", "fr3", "meca_insertion")]
    sums = [str(out / "fr5_aruco_pose_summary.json"),
            str(out / "pose1_aruco_pose_summary.json"),
            str(out / "meca_insertion_aruco_pose_summary.json")]
    workdir = tmp_path / "run"
    rc = main([
        "train", "--robot", "fr5,fr3,meca_insertion", "--csv", *csvs,
        "--calib-dir", str(out / "calib"), "--aruco-summary", *sums,
        "--workdir", str(workdir), "--image-hw", "64", "64",
        "--model-size", "64", "--hidden-size", "64", "--num-layers", "1",
        "--batch-size", "4", "--epochs", "1", "--val-split", "0.25",
        "--no-augment", "--num-workers", "0",
    ])
    assert rc == 0
    rec = json.loads((workdir / "logs" / "metrics.jsonl").read_text().strip().splitlines()[-1])
    assert np.isfinite(rec["val_loss"])
    cfg = json.loads((workdir / "model_config.json").read_text())
    # fr3 contributes 8 FK keypoints and 7 angles; fr5/meca pad up to those.
    assert cfg["num_joints"] == 8 and cfg["num_angles"] == 7

    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main([
            "eval", "--robot", "fr5,fr3,meca_insertion", "--csv", *csvs,
            "--calib-dir", str(out / "calib"), "--aruco-summary", *sums,
            "--params", str(workdir / "best_params.npz"),
            "--image-hw", "64", "64", "--batch-size", "8",
        ])
    assert rc == 0
    report = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert report["robots"] == ["fr5", "fr3", "meca_insertion"]
    assert report["fr5"]["angle_unit"] == "deg"
    assert report["fr3"]["angle_unit"] == "rad"
    assert report["meca_insertion"]["angle_unit"] == "deg"
    for r in ("fr5", "fr3", "meca_insertion"):
        assert report[r]["samples"] == 8
        assert np.isfinite(report[r]["angle_mae_native"])

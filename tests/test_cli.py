"""CLI end-to-end: sync -> calibrate -> train -> serve on synthetic fixtures.

This is the framework's integration slice for BASELINE configs 1/2/5 in
miniature: real file formats, real CLI paths, tiny model.
"""

import json
from pathlib import Path

import numpy as np
import pytest

from mvropose_tpu.cli.main import main


CONF_TEXT = """\
[LEFT_CAM_FHD]
cx = 40.0
cy = 30.0
fx = 70.0
fy = 70.0
k1 = 0.0
k2 = 0.0
k3 = 0.0
p1 = 0.0
p2 = 0.0

[RIGHT_CAM_FHD]
cx = 40.0
cy = 30.0
fx = 70.0
fy = 70.0
k1 = 0.0
k2 = 0.0
k3 = 0.0
p1 = 0.0
p2 = 0.0
"""


def _write_images(d: Path, n=6, hw=(60, 80), serial="41182735", side="left"):
    import cv2

    d.mkdir(parents=True, exist_ok=True)
    paths = []
    rng = np.random.default_rng(0)
    for i in range(n):
        p = d / f"zed_{serial}_{side}_{1000.0 + i:.3f}.jpg"
        cv2.imwrite(str(p), rng.integers(0, 255, size=(*hw, 3)).astype(np.uint8))
        paths.append(p)
    return paths


@pytest.mark.slow
def test_cli_sync_and_calibrate_and_train_meca500(tmp_path):
    # --- sync (meca500 index pairing) ---
    img_dir = tmp_path / "image"
    ang_dir = tmp_path / "angle"
    ang_dir.mkdir()
    import cv2

    img_dir.mkdir()
    rng = np.random.default_rng(1)
    for i in range(6):
        cv2.imwrite(
            str(img_dir / f"image{i}.jpg"), rng.integers(0, 255, size=(60, 80, 3)).astype(np.uint8)
        )
        (ang_dir / f"angle{i}.json").write_text(
            json.dumps([float(10 * i), -20.0, 30.0, 0.0, 45.0, 0.0])
        )
    csv = tmp_path / "meca500.csv"
    rc = main(
        [
            "sync", "meca500", "--base-dirs", str(img_dir), "--joint-dir", str(ang_dir),
            "--out", str(csv),
        ]
    )
    assert rc == 0 and csv.exists()

    # --- calibrate intrinsics from a conf ---
    conf = tmp_path / "SN41182735.conf"
    conf.write_text(CONF_TEXT)
    calib_dir = tmp_path / "calib"
    rc = main(
        [
            "calibrate", "intrinsics", "--conf", str(conf), "--serial", "41182735",
            "--view", "front", "--resolution", "FHD", "--out-dir", str(calib_dir),
        ]
    )
    assert rc == 0
    assert (calib_dir / "front_41182735_leftcam_calib.json").exists()

    # --- calibrate manual extrinsic (Meca500 style) ---
    summary = tmp_path / "aruco_summary.json"
    rc = main(
        [
            "calibrate", "manual", "--view", "front", "--cam", "leftcam",
            "--tvec", "0", "-0.01", "0.75", "--rvec-deg", "96", "98", "-45",
            "--out", str(summary),
        ]
    )
    assert rc == 0
    rec = json.loads(summary.read_text())[0]
    assert rec["rvec_x"] == 96.0

    # --- train one tiny epoch end-to-end ---
    workdir = tmp_path / "run"
    rc = main(
        [
            "train", "--robot", "meca500", "--csv", str(csv),
            "--calib-dir", str(calib_dir), "--aruco-summary", str(summary),
            "--workdir", str(workdir),
            "--image-hw", "60", "80", "--model-size", "64",
            "--hidden-size", "64", "--num-layers", "2",
            "--batch-size", "2", "--epochs", "1", "--val-split", "0.34",
        ]
    )
    assert rc == 0
    assert (workdir / "ckpt").exists()
    metrics = (workdir / "logs" / "metrics.jsonl").read_text().strip().splitlines()
    rec = json.loads(metrics[-1])
    assert np.isfinite(rec["val_loss"])
    assert "val_pck5" in rec

    # --- eval with the trained best params ---
    params = workdir / "best_params.npz"
    assert params.exists()
    rc = main(
        [
            "eval", "--robot", "meca500", "--csv", str(csv),
            "--calib-dir", str(calib_dir), "--aruco-summary", str(summary),
            "--params", str(params), "--image-hw", "60", "80",
            "--model-size", "64", "--hidden-size", "64", "--num-layers", "2",
            "--batch-size", "2",
        ]
    )
    assert rc == 0

    # --- occlusion-robustness probe variant ---
    rc = main(
        [
            "eval", "--robot", "meca500", "--csv", str(csv),
            "--calib-dir", str(calib_dir), "--aruco-summary", str(summary),
            "--params", str(params), "--image-hw", "60", "80",
            "--model-size", "64", "--hidden-size", "64", "--num-layers", "2",
            "--batch-size", "2", "--occlusion-masks", "1",
        ]
    )
    assert rc == 0


def test_cli_group(tmp_path, capsys):
    import pandas as pd

    ts = np.concatenate([np.arange(8) * 0.005 + k for k in range(4)])
    df = pd.DataFrame(
        {
            "robot_timestamp": ts,
            "image_path": [f"im{i}.jpg" for i in range(len(ts))],
            "position_fr3_joint1": np.zeros(len(ts)),
        }
    )
    csv = tmp_path / "fr3.csv"
    df.to_csv(csv, index=False)
    rc = main(["group", "--csv", str(csv), "--max-views", "8", "--tolerance", "0.07"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "recommended tolerance" in out
    assert "4 groups" in out


def test_cli_serve_synthetic(tmp_path):
    rc = main(
        [
            "serve", "--views", "2", "--fps", "60", "--frame-hw", "32", "48",
            "--model-size", "32", "--hidden-size", "64", "--num-layers", "1",
            "--duration", "1.0",
        ]
    )
    assert rc == 0


@pytest.mark.slow
def test_cli_fr3_multiview_train(tmp_path):
    """Multi-view FR3 path through the CLI: yaml sync -> group -> fused
    training with view masks."""
    import cv2

    # Joint YAML stream (radians) + images from two FR3 serials, two ticks.
    jdir = tmp_path / "joints"
    jdir.mkdir()
    docs = []
    for i in range(6):
        names = ", ".join(f"fr3_joint{j}" for j in range(1, 8))
        pos = ", ".join(str(0.1 * j + 0.01 * i) for j in range(1, 8))
        docs.append(
            f"header:\n  stamp:\n    sec: {1000 + i}\n    nanosec: 0\n"
            f"name: [{names}]\nposition: [{pos}]\n"
        )
    (jdir / "joint_states_0.yaml").write_text("---\n".join(docs))

    img_dir = tmp_path / "pose1"
    rng = np.random.default_rng(0)
    for i in range(6):
        for serial in ("41182735", "49429257"):
            p = img_dir / f"zed_{serial}_left_{1000 + i}.0.jpg"
            p.parent.mkdir(parents=True, exist_ok=True)
            cv2.imwrite(str(p), rng.integers(0, 255, size=(60, 80, 3)).astype(np.uint8))

    csv = tmp_path / "fr3.csv"
    assert main([
        "sync", "fr3", "--base-dirs", str(img_dir), "--joint-dir", str(jdir),
        "--out", str(csv), "--tolerance", "0.05",
    ]) == 0

    # Calibration for view1/view2 + pose1 extrinsics.
    conf = tmp_path / "SN.conf"
    conf.write_text(CONF_TEXT)
    calib_dir = tmp_path / "calib"
    for serial, view in (("41182735", "view1"), ("49429257", "view2")):
        main(["calibrate", "intrinsics", "--conf", str(conf), "--serial", serial,
              "--view", view, "--resolution", "FHD", "--out-dir", str(calib_dir)])
    summary = tmp_path / "pose1_aruco_pose_summary.json"
    for view in ("view1", "view2"):
        for cam in ("leftcam", "rightcam"):
            main(["calibrate", "manual", "--view", view, "--cam", cam,
                  "--tvec", "0", "0", "1.2", "--rvec-deg", "3.14159", "0", "0",
                  "--out", str(summary)])
    # FR3 extrinsic rvecs are radians in the summary; 'manual' writes the
    # values verbatim and load_rig does NOT convert for rad-unit robots.

    workdir = tmp_path / "run_mv"
    rc = main([
        "train", "--robot", "fr3", "--csv", str(csv),
        "--calib-dir", str(calib_dir), "--aruco-summary", str(summary),
        "--workdir", str(workdir), "--image-hw", "60", "80",
        "--model-size", "64", "--hidden-size", "64", "--num-layers", "1",
        "--batch-size", "2", "--epochs", "1", "--val-split", "0.34",
        "--tolerance", "0.05", "--no-augment",
    ])
    assert rc == 0
    metrics = (workdir / "logs" / "metrics.jsonl").read_text().strip().splitlines()
    rec = json.loads(metrics[-1])
    assert np.isfinite(rec["val_loss"])

    # --- multi-view eval incl. triangulated ADD + its coverage rate ---
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main([
            "eval", "--robot", "fr3", "--csv", str(csv),
            "--calib-dir", str(calib_dir), "--aruco-summary", str(summary),
            "--params", str(workdir / "best_params.npz"), "--image-hw", "60", "80",
            "--model-size", "64", "--hidden-size", "64", "--num-layers", "1",
            "--batch-size", "2", "--tolerance", "0.05",
        ])
    assert rc == 0
    report = json.loads(buf.getvalue().strip().splitlines()[-1])
    if "triangulated_add_m" in report:
        # The conditional mean must carry its coverage (fraction of
        # keypoints with >= 2 confident views).
        assert 0.0 <= report["triangulated_obs_rate"] <= 1.0

    # --- FR3 multi-view GT group panels (reference
    # visualize_samples_by_group_size) ---
    viz_dir = tmp_path / "viz_mv"
    rc = main([
        "visualize", "--robot", "fr3", "--multi-view", "--csv", str(csv),
        "--calib-dir", str(calib_dir), "--aruco-summary", str(summary),
        "--image-hw", "60", "80", "--out-dir", str(viz_dir),
        "--num-samples", "2", "--tolerance", "0.05",
    ])
    assert rc == 0
    panels = list(viz_dir.glob("group*view_*.png"))
    assert panels, "no multi-view group panels written"


def test_cli_fr3_multiview_train_grain_workers(tmp_path):
    """`cli train --robot fr3 --num-workers N` routes the GROUPED multi-view
    stream through the grain multiprocess loader (VERDICT r4 #2: the
    reference's flagship trainer is the multi-view one, fed by 8 DataLoader
    workers, MvRoPose_FR3.py:958-965). Grain drops the remainder batch, so
    the optimizer step count distinguishes the two paths."""
    import cv2

    jdir = tmp_path / "joints"
    jdir.mkdir()
    docs = []
    for i in range(6):
        names = ", ".join(f"fr3_joint{j}" for j in range(1, 8))
        pos = ", ".join(str(0.1 * j + 0.01 * i) for j in range(1, 8))
        docs.append(
            f"header:\n  stamp:\n    sec: {1000 + i}\n    nanosec: 0\n"
            f"name: [{names}]\nposition: [{pos}]\n"
        )
    (jdir / "joint_states_0.yaml").write_text("---\n".join(docs))
    img_dir = tmp_path / "pose1"
    rng = np.random.default_rng(0)
    for i in range(6):
        for serial in ("41182735", "49429257"):
            p = img_dir / f"zed_{serial}_left_{1000 + i}.0.jpg"
            p.parent.mkdir(parents=True, exist_ok=True)
            cv2.imwrite(str(p), rng.integers(0, 255, size=(60, 80, 3)).astype(np.uint8))
    csv = tmp_path / "fr3.csv"
    assert main([
        "sync", "fr3", "--base-dirs", str(img_dir), "--joint-dir", str(jdir),
        "--out", str(csv), "--tolerance", "0.05",
    ]) == 0
    conf = tmp_path / "SN.conf"
    conf.write_text(CONF_TEXT)
    calib_dir = tmp_path / "calib"
    for serial, view in (("41182735", "view1"), ("49429257", "view2")):
        main(["calibrate", "intrinsics", "--conf", str(conf), "--serial", serial,
              "--view", view, "--resolution", "FHD", "--out-dir", str(calib_dir)])
    summary = tmp_path / "pose1_aruco_pose_summary.json"
    for view in ("view1", "view2"):
        main(["calibrate", "manual", "--view", view, "--cam", "leftcam",
              "--tvec", "0", "0", "1.2", "--rvec-deg", "3.14159", "0", "0",
              "--out", str(summary)])

    workdir = tmp_path / "run_mv_grain"
    rc = main([
        "train", "--robot", "fr3", "--csv", str(csv),
        "--calib-dir", str(calib_dir), "--aruco-summary", str(summary),
        "--workdir", str(workdir), "--image-hw", "60", "80",
        "--model-size", "64", "--hidden-size", "64", "--num-layers", "1",
        "--batch-size", "2", "--epochs", "2", "--val-split", "0.17",
        "--tolerance", "0.05", "--no-augment", "--num-workers", "1",
    ])
    assert rc == 0
    recs = [json.loads(l) for l in
            (workdir / "logs" / "metrics.jsonl").read_text().strip().splitlines()]
    assert np.isfinite(recs[-1]["val_loss"])
    # 5 train groups / batch 2: grain DROPS the remainder -> 2 steps/epoch
    # x 2 epochs = 4. The in-process path pads it -> 6; a 6 here means the
    # multi-view dataset silently fell back to serial loading.
    assert recs[-1]["step"] == 4


def test_cli_visualize(tmp_path):
    import cv2

    img_dir = tmp_path / "image"
    ang_dir = tmp_path / "angle"
    img_dir.mkdir(), ang_dir.mkdir()
    rng = np.random.default_rng(3)
    for i in range(3):
        cv2.imwrite(str(img_dir / f"image{i}.jpg"), rng.integers(0, 255, size=(60, 80, 3)).astype(np.uint8))
        (ang_dir / f"angle{i}.json").write_text(json.dumps([0.0, -30.0, 30.0, 0.0, 0.0, 0.0]))
    csv = tmp_path / "m.csv"
    main(["sync", "meca500", "--base-dirs", str(img_dir), "--joint-dir", str(ang_dir), "--out", str(csv)])
    conf = tmp_path / "SN.conf"
    conf.write_text(CONF_TEXT)
    calib_dir = tmp_path / "calib"
    main(["calibrate", "intrinsics", "--conf", str(conf), "--serial", "41182735",
          "--view", "front", "--resolution", "FHD", "--out-dir", str(calib_dir)])
    summary = tmp_path / "s.json"
    main(["calibrate", "manual", "--view", "front", "--cam", "leftcam",
          "--tvec", "0", "-0.01", "0.75", "--rvec-deg", "96", "98", "-45", "--out", str(summary)])
    out_dir = tmp_path / "panels"
    rc = main(["visualize", "--robot", "meca500", "--csv", str(csv),
               "--calib-dir", str(calib_dir), "--aruco-summary", str(summary),
               "--image-hw", "60", "80", "--out-dir", str(out_dir), "--num-samples", "2"])
    assert rc == 0
    assert len(list(out_dir.glob("gt_overlay_*.png"))) == 2


def test_cli_profile_tiny():
    rc = main(["profile", "--views", "2", "--model-size", "32",
               "--hidden-size", "64", "--num-layers", "1", "--iters", "2"])
    assert rc == 0


def test_cli_stereo_transfer(tmp_path):
    summary = tmp_path / "sum.json"
    summary.write_text(json.dumps([
        {"view": "front", "cam": "leftcam", "tvec_x": 0.1, "tvec_y": 0.2,
         "tvec_z": 1.5, "rvec_x": 0.0, "rvec_y": 0.0, "rvec_z": 0.0},
    ]))
    (tmp_path / "SN41182735.conf").write_text(
        "[STEREO]\nBaseline = 120.0\nTY = 0.0\nTZ = 0.0\n"
        "RX_FHD1200 = 0.0\nCV_FHD1200 = 0.0\nRZ_FHD1200 = 0.0\n"
    )
    smap = tmp_path / "serials.json"
    smap.write_text(json.dumps({"front": "41182735"}))
    rc = main(["calibrate", "stereo-transfer", "--summary", str(summary),
               "--serial-map", str(smap), "--conf-dir", str(tmp_path)])
    assert rc == 0
    records = json.loads(summary.read_text())
    right = [r for r in records if r["cam"] == "rightcam"][0]
    assert abs(right["tvec_x"] - (0.1 - 0.120)) < 1e-6
    assert right["derived_from"] == "stereo_baseline"


def test_cli_meca_insertion_corner_pipeline(tmp_path):
    """All three Meca-insertion calibration stages end to end from raw corner
    JSONs (reference Meca_insertion_preprocessing.py): stage-1 averaging,
    stage-2 corner PnP re-solve, stage-3 offsets -> summary, then rightcam
    via stereo-transfer --correction-offset."""
    import cv2
    from scipy.spatial.transform import Rotation as R

    K = np.array([[700.0, 0, 640], [0, 700.0, 360], [0, 0, 1]])
    size = 0.05
    obj = np.array([[0, 0, 0], [size, 0, 0], [size, size, 0], [0, size, 0]], float)
    rvec_gt = np.array([0.2, -0.1, 0.05])
    tvec_gt = np.array([0.05, -0.02, 0.8])
    corners, _ = cv2.projectPoints(obj, rvec_gt, tvec_gt, K, np.zeros(5))
    corners = corners.reshape(4, 2)
    q = R.from_rotvec(rvec_gt).as_quat()

    rng = np.random.default_rng(0)
    aruco_dir = tmp_path / "aruco"
    aruco_dir.mkdir()
    for i in range(3):  # one capture JSON per frame; noise within the 1 mm gate
        t = tvec_gt + rng.normal(0, 2e-4, 3)
        det = {
            "position_m": dict(zip("xyz", (float(v) for v in t))),
            "rotation_quat": dict(zip("xyzw", (float(v) for v in q))),
            "corners_pixel": (corners + rng.normal(0, 0.2, corners.shape)).tolist(),
        }
        (aruco_dir / f"front_0_leftcam_{i}.json").write_text(json.dumps({"5": det}))
    calib_dir = tmp_path / "calib"
    calib_dir.mkdir()
    (calib_dir / "front_41182735_leftcam_calib.json").write_text(json.dumps({
        "camera_matrix": K.tolist(), "distortion_coeffs": [0.0] * 5,
    }))
    smap = tmp_path / "serials.json"
    smap.write_text(json.dumps({"front": "41182735"}))
    offsets = tmp_path / "offsets.json"
    offsets.write_text(json.dumps({"front": {"5": [0.0, 0.0, 0.0]}}))
    summary = tmp_path / "summary.json"
    rc = main(["calibrate", "corners", "--aruco-dir", str(aruco_dir),
               "--calib-dir", str(calib_dir), "--serial-map", str(smap),
               "--offsets", str(offsets), "--marker-size", str(size),
               "--out", str(summary)])
    assert rc == 0
    records = json.loads(summary.read_text())
    left = [r for r in records if r["cam"] == "leftcam"][0]
    np.testing.assert_allclose(
        [left["tvec_x"], left["tvec_y"], left["tvec_z"]], tvec_gt, atol=3e-3
    )
    np.testing.assert_allclose(
        [left["rvec_x"], left["rvec_y"], left["rvec_z"]], rvec_gt, atol=2e-2
    )

    (tmp_path / "SN41182735.conf").write_text(
        "[STEREO]\nBaseline = 120.0\nTY = 0.0\nTZ = 0.0\n"
        "RX_FHD1200 = 0.0\nCV_FHD1200 = 0.0\nRZ_FHD1200 = 0.0\n"
    )
    rc = main(["calibrate", "stereo-transfer", "--summary", str(summary),
               "--serial-map", str(smap), "--conf-dir", str(tmp_path),
               "--correction-offset", "-0.025", "0", "0"])
    assert rc == 0
    records = json.loads(summary.read_text())
    right = [r for r in records if r["cam"] == "rightcam"][0]
    # identity factory rotation: tvec_right = tvec_left - baseline_x + offset
    assert abs(right["tvec_x"] - (left["tvec_x"] - 0.120 - 0.025)) < 1e-6


def test_cli_serve_with_pose_recovery():
    rc = main(
        [
            "serve", "--views", "2", "--fps", "60", "--frame-hw", "32", "48",
            "--model-size", "32", "--hidden-size", "64", "--num-layers", "1",
            "--duration", "1.0", "--recover-pose", "--pose-robot", "meca500",
        ]
    )
    assert rc == 0


def test_cli_serve_display_dir(tmp_path):
    """Headless-safe tiled display (reference DIP_REAL.py canvas loop):
    'dir' mode writes skeleton-overlay canvases."""
    disp = tmp_path / "disp"
    rc = main(
        [
            "serve", "--views", "3", "--fps", "60", "--frame-hw", "32", "48",
            "--model-size", "32", "--hidden-size", "64", "--num-layers", "1",
            "--duration", "1.0", "--display", "dir", "--display-dir", str(disp),
            "--display-every", "2",
        ]
    )
    assert rc == 0
    canvases = list(disp.glob("canvas_*.png"))
    assert canvases, "no display canvases written"
    import cv2

    img = cv2.imread(str(canvases[0]))
    assert img is not None and img.shape[2] == 3


def test_cli_serve_pose_recovery_with_calibration(tmp_path):
    """serve --recover-pose binds real K from --calib-dir, robot base
    rotations, and ArUco-summary fallback extrinsics (reference
    Fr5_model_train.ipynb cell 14: PnP with calib K, ArUco fallback)."""
    calib_dir = tmp_path / "calib"
    calib_dir.mkdir()
    for view, serial in (("view1", "41182735"), ("view2", "49429257")):
        (calib_dir / f"{view}_{serial}_leftcam_calib.json").write_text(json.dumps({
            "camera_matrix": [[500.0, 0, 24.0], [0, 500.0, 16.0], [0, 0, 1]],
            "distortion_coeffs": [0.0] * 5,
        }))
    summary = tmp_path / "summary.json"
    summary.write_text(json.dumps([
        {"view": "view1", "cam": "leftcam", "rvec_x": 0.1, "rvec_y": 0.0,
         "rvec_z": 0.0, "tvec_x": 0.0, "tvec_y": 0.0, "tvec_z": 1.5},
        {"view": "view2", "cam": "leftcam", "rvec_x": 0.0, "rvec_y": 0.1,
         "rvec_z": 0.0, "tvec_x": 0.1, "tvec_y": 0.0, "tvec_z": 1.5},
    ]))
    rc = main(
        [
            "serve", "--views", "2", "--fps", "60", "--frame-hw", "32", "48",
            "--model-size", "32", "--hidden-size", "64", "--num-layers", "1",
            "--duration", "1.0", "--recover-pose", "--pose-robot", "fr3",
            "--calib-dir", str(calib_dir),
            "--camera-keys", "view1_leftcam,view2_leftcam",
            "--summary", str(summary),
        ]
    )
    assert rc == 0


def test_cli_dream_train(tmp_path):
    """DREAM family end to end: _camera_settings intrinsics + stored 2D
    keypoints through the train CLI."""
    import cv2

    base = tmp_path / "panda-3cam_azure"
    base.mkdir()
    (base / "_camera_settings.json").write_text(json.dumps({
        "camera_settings": [{"intrinsic_settings": {"fx": 70.0, "fy": 70.0, "cx": 40.0, "cy": 30.0}}]
    }))
    kp_names = ["panda_link0", "panda_link2", "panda_link3", "panda_link4",
                "panda_link6", "panda_link7", "panda_hand"]
    rng = np.random.default_rng(4)
    for i in range(4):
        data = {
            "sim_state": {"joints": [
                {"name": f"panda_joint{j}", "position": 0.1 * j + 0.05 * i} for j in range(1, 8)
            ]},
            "objects": [{"keypoints": [
                {"name": n, "location": [0.1 * k, 0.2, 0.5],
                 "projected_location": [10.0 + 8 * k, 15.0 + 4 * k]}
                for k, n in enumerate(kp_names)
            ]}],
        }
        (base / f"{i:04d}.json").write_text(json.dumps(data))
        cv2.imwrite(str(base / f"{i:04d}.rgb.jpg"), rng.integers(0, 255, (60, 80, 3)).astype(np.uint8))

    csv = tmp_path / "dream.csv"
    assert main(["sync", "dream", "--base-dirs", str(base), "--out", str(csv)]) == 0

    workdir = tmp_path / "run"
    rc = main([
        "train", "--robot", "dream", "--csv", str(csv),
        "--dream-dirs", str(base), "--workdir", str(workdir),
        "--image-hw", "60", "80", "--model-size", "64",
        "--hidden-size", "64", "--num-layers", "1",
        "--batch-size", "2", "--epochs", "1", "--val-split", "0.5", "--no-augment",
    ])
    assert rc == 0
    rec = json.loads((workdir / "logs" / "metrics.jsonl").read_text().strip().splitlines()[-1])
    assert np.isfinite(rec["val_loss"])
    # The exported weights must bundle BN running stats - inference is
    # silently wrong without them (see load_batch_stats_npz).
    saved = np.load(workdir / "best_params.npz")
    assert any(k.startswith("batch_stats/") for k in saved.keys())

    # Eval on the trained checkpoint: exercises arch restore from
    # model_config.json, batch_stats loading, the 7-keypoint DREAM set, and
    # valid-sample counting (samples > 0 means images actually loaded at
    # --image-hw; the regression was a silent all-weight-0 eval).
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main([
            "eval", "--robot", "dream", "--csv", str(csv),
            "--dream-dirs", str(base), "--params", str(workdir / "best_params.npz"),
            "--image-hw", "60", "80", "--batch-size", "2", "--single-view",
            "--refine-pose",
        ])
    assert rc == 0
    report = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert report["samples"] == 4
    assert np.isfinite(report["angle_mae"]) and np.isfinite(report["add_m"])
    # --refine-pose: the joint (pose, angles) refinement block must emit its
    # gauge-invariant ADD protocol metrics alongside the raw pose numbers.
    assert np.isfinite(report["pose_rot_err_deg_refined"])
    assert np.isfinite(report["refined_angle_mae"])
    assert "pnp_add_pass@10cm_refined" in report

    # Wrong --image-hw must fail loudly, not report metrics over zero samples.
    with pytest.raises(SystemExit, match="weight 0"):
        main([
            "eval", "--robot", "dream", "--csv", str(csv),
            "--dream-dirs", str(base), "--params", str(workdir / "best_params.npz"),
            "--image-hw", "480", "640", "--batch-size", "2", "--single-view",
        ])

    # Single-view checkpoints must be servable (every camera as one device
    # batch through the per-view model, masked-mean angles) - previously
    # serve rejected anything but multi_view checkpoints.
    rc = main([
        "serve", "--replay-dir", str(base), "--views", "2", "--fps", "30",
        "--frame-hw", "60", "80", "--params", str(workdir / "best_params.npz"),
        # duration covers the refine graph's first-tick compile on a loaded
        # CI core - at 1.0s the loop can end before any frame lands.
        "--recover-pose", "--refine-pose", "--pose-robot", "dream_panda",
        "--duration", "3.0",
    ])
    assert rc == 0


def test_cli_train_grain_workers(tmp_path):
    """cli train with --num-workers > 0 routes the epoch stream through the
    grain multiprocess loader (the reference fed its GPUs with 8 DataLoader
    workers, DREAM_Train.py:734) and still trains/logs end to end. One spawn
    of one worker (~15 s) keeps this in the fast set; throughput evidence
    lives in scripts/bench_input_pipeline.py."""
    import cv2

    base = tmp_path / "panda-3cam_azure"
    base.mkdir()
    (base / "_camera_settings.json").write_text(json.dumps({
        "camera_settings": [{"intrinsic_settings": {"fx": 70.0, "fy": 70.0, "cx": 40.0, "cy": 30.0}}]
    }))
    kp_names = ["panda_link0", "panda_link2", "panda_link3", "panda_link4",
                "panda_link6", "panda_link7", "panda_hand"]
    rng = np.random.default_rng(11)
    for i in range(8):
        data = {
            "sim_state": {"joints": [
                {"name": f"panda_joint{j}", "position": 0.1 * j + 0.05 * i} for j in range(1, 8)
            ]},
            "objects": [{"keypoints": [
                {"name": n, "location": [0.1 * k, 0.2, 0.5],
                 "projected_location": [10.0 + 8 * k, 15.0 + 4 * k]}
                for k, n in enumerate(kp_names)
            ]}],
        }
        (base / f"{i:04d}.json").write_text(json.dumps(data))
        cv2.imwrite(str(base / f"{i:04d}.rgb.jpg"), rng.integers(0, 255, (60, 80, 3)).astype(np.uint8))

    csv = tmp_path / "dream.csv"
    assert main(["sync", "dream", "--base-dirs", str(base), "--out", str(csv)]) == 0

    workdir = tmp_path / "run"
    rc = main([
        "train", "--robot", "dream", "--csv", str(csv),
        "--dream-dirs", str(base), "--workdir", str(workdir),
        "--image-hw", "60", "80", "--model-size", "64",
        "--hidden-size", "64", "--num-layers", "1",
        "--batch-size", "2", "--epochs", "2", "--val-split", "0.5",
        "--no-augment", "--num-workers", "1",
    ])
    assert rc == 0
    recs = [json.loads(l) for l in (workdir / "logs" / "metrics.jsonl").read_text().strip().splitlines()]
    assert np.isfinite(recs[-1]["val_loss"])
    # 4 train samples / batch 2, grain drops remainders -> exactly 2
    # optimizer steps per epoch over 2 epochs.
    assert recs[-1]["step"] == 4


def test_cli_fr3_single_view_train(tmp_path):
    """FR3 --single-view (reference Franka notebook path) trains end to end."""
    import cv2

    jdir = tmp_path / "joints"
    jdir.mkdir()
    docs = []
    for i in range(4):
        names = ", ".join(f"fr3_joint{j}" for j in range(1, 8))
        pos = ", ".join(str(0.1 * j + 0.02 * i) for j in range(1, 8))
        docs.append(
            f"header:\n  stamp:\n    sec: {1000 + i}\n    nanosec: 0\n"
            f"name: [{names}]\nposition: [{pos}]\n"
        )
    (jdir / "joint_states_0.yaml").write_text("---\n".join(docs))
    img_dir = tmp_path / "pose1"
    rng = np.random.default_rng(0)
    for i in range(4):
        p = img_dir / f"zed_41182735_left_{1000 + i}.0.jpg"
        p.parent.mkdir(parents=True, exist_ok=True)
        cv2.imwrite(str(p), rng.integers(0, 255, size=(60, 80, 3)).astype(np.uint8))
    csv = tmp_path / "fr3.csv"
    assert main(["sync", "fr3", "--base-dirs", str(img_dir), "--joint-dir", str(jdir),
                 "--out", str(csv), "--tolerance", "0.05"]) == 0

    conf = tmp_path / "SN.conf"
    conf.write_text(CONF_TEXT)
    calib_dir = tmp_path / "calib"
    main(["calibrate", "intrinsics", "--conf", str(conf), "--serial", "41182735",
          "--view", "view1", "--resolution", "FHD", "--out-dir", str(calib_dir)])
    summary = tmp_path / "pose1_aruco_pose_summary.json"
    main(["calibrate", "manual", "--view", "view1", "--cam", "leftcam",
          "--tvec", "0", "0", "1.2", "--rvec-deg", "3.14159", "0", "0", "--out", str(summary)])

    workdir = tmp_path / "run_sv"
    rc = main([
        "train", "--robot", "fr3", "--single-view", "--csv", str(csv),
        "--calib-dir", str(calib_dir), "--aruco-summary", str(summary),
        "--workdir", str(workdir), "--image-hw", "60", "80",
        "--model-size", "64", "--hidden-size", "64", "--num-layers", "1",
        "--batch-size", "2", "--epochs", "1", "--val-split", "0.5", "--no-augment",
    ])
    assert rc == 0
    rec = json.loads((workdir / "logs" / "metrics.jsonl").read_text().strip().splitlines()[-1])
    assert np.isfinite(rec["val_loss"])


@pytest.mark.slow
def test_cli_train_with_backbone_ckpt(tmp_path):
    """--backbone-ckpt grafts converted DINO weights into the backbone (the
    reference's frozen-pretrained workflow, DREAM_Train.py:137): a timm-style
    state dict at a DIFFERENT native size (96px grid) trains at 64px through
    the apply-time pos-embed interpolation, and because the backbone is
    frozen, the exported best params must equal the converted checkpoint."""
    import json as _json

    from mvropose_tpu.models.dino_convert import convert_dino_state_dict
    from mvropose_tpu.models.vit import ViTConfig
    from tests.test_dino_convert import make_timm_state_dict

    native = ViTConfig(
        image_size=96, patch_size=16, hidden_size=64, num_layers=1,
        num_heads=1, num_register_tokens=2, layerscale_init=1e-5,
        dtype="float32",
    )
    rng = np.random.default_rng(7)
    sd = make_timm_state_dict(rng, native)
    ckpt = tmp_path / "dino_tiny.npz"
    np.savez(ckpt, **sd)

    img_dir = tmp_path / "image"
    ang_dir = tmp_path / "angle"
    ang_dir.mkdir()
    import cv2

    img_dir.mkdir()
    r = np.random.default_rng(1)
    for i in range(4):
        cv2.imwrite(str(img_dir / f"image{i}.jpg"),
                    r.integers(0, 255, size=(60, 80, 3)).astype(np.uint8))
        (ang_dir / f"angle{i}.json").write_text(
            _json.dumps([float(10 * i), -20.0, 30.0, 0.0, 45.0, 0.0]))
    csv = tmp_path / "m.csv"
    main(["sync", "meca500", "--base-dirs", str(img_dir), "--joint-dir", str(ang_dir),
          "--out", str(csv)])
    conf = tmp_path / "SN.conf"
    conf.write_text(CONF_TEXT)
    calib_dir = tmp_path / "calib"
    main(["calibrate", "intrinsics", "--conf", str(conf), "--serial", "41182735",
          "--view", "front", "--resolution", "FHD", "--out-dir", str(calib_dir)])
    summary = tmp_path / "s.json"
    main(["calibrate", "manual", "--view", "front", "--cam", "leftcam",
          "--tvec", "0", "-0.01", "0.75", "--rvec-deg", "96", "98", "-45",
          "--out", str(summary)])

    workdir = tmp_path / "run"
    rc = main([
        "train", "--robot", "meca500", "--csv", str(csv),
        "--calib-dir", str(calib_dir), "--aruco-summary", str(summary),
        "--workdir", str(workdir), "--image-hw", "60", "80",
        "--model-size", "64", "--hidden-size", "64", "--num-layers", "1",
        "--patch-size", "16", "--register-tokens", "2",
        "--backbone-native-size", "96", "--backbone-ckpt", str(ckpt),
        "--batch-size", "2", "--epochs", "1", "--val-split", "0.5", "--no-augment",
    ])
    assert rc == 0

    # Frozen backbone => exported best params carry the checkpoint verbatim.
    converted = convert_dino_state_dict(sd, 1, 1, 64)
    exported = np.load(workdir / "best_params.npz")
    flat = {}
    import jax

    for keypath, leaf in jax.tree_util.tree_flatten_with_path(converted)[0]:
        name = "backbone/" + "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in keypath)
        flat[name] = np.asarray(leaf)
    checked = 0
    for name, want in flat.items():
        np.testing.assert_allclose(exported[name], want.astype(np.float32),
                                   rtol=0, atol=0, err_msg=name)
        checked += 1
    assert checked > 10

    # The non-default architecture (register tokens, 96-native pos-embed
    # grid run at 64) must evaluate WITHOUT re-specifying any arch flag:
    # model_config.json restores it (the round-2 advisor finding: the DINO
    # path was a dead end past training because eval hardcoded the arch).
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main([
            "eval", "--robot", "meca500", "--csv", str(csv),
            "--calib-dir", str(calib_dir), "--aruco-summary", str(summary),
            "--params", str(workdir / "best_params.npz"),
            "--image-hw", "60", "80", "--batch-size", "2",
        ])
    assert rc == 0
    report = _json.loads(buf.getvalue().strip().splitlines()[-1])
    assert np.isfinite(report["angle_mae"])


def test_graft_backbone_ckpt_rejects_mismatch(tmp_path):
    """A checkpoint whose architecture disagrees with the flags must fail
    loudly, not train a half-random backbone."""
    import jax

    from mvropose_tpu.cli.main import _graft_backbone_ckpt
    from mvropose_tpu.models.vit import ViTBackbone, ViTConfig
    from tests.test_dino_convert import make_timm_state_dict

    cfg = ViTConfig(image_size=32, patch_size=16, hidden_size=64, num_layers=2,
                    num_heads=1, num_register_tokens=0, layerscale_init=1e-5,
                    dtype="float32")
    rng = np.random.default_rng(3)
    wrong = ViTConfig(image_size=32, patch_size=16, hidden_size=64, num_layers=1,
                      num_heads=1, num_register_tokens=2, layerscale_init=1e-5,
                      dtype="float32")
    sd = make_timm_state_dict(rng, wrong)
    ckpt = tmp_path / "bad.npz"
    np.savez(ckpt, **sd)

    bb = ViTBackbone(cfg)
    variables = {"params": {"backbone": bb.init(
        jax.random.PRNGKey(0), np.zeros((1, 32, 32, 3), np.float32))["params"]}}
    with pytest.raises((ValueError, KeyError)):
        _graft_backbone_ckpt(variables, ckpt, cfg)


@pytest.mark.slow
def test_cli_train_eval_geometric_angle_head(tmp_path):
    """--angle-head geometric wires through train AND eval (the eval model is
    rebuilt from flags, so a mismatch would fail the params load loudly)."""
    import json as _json

    import cv2

    img_dir = tmp_path / "image"
    ang_dir = tmp_path / "angle"
    img_dir.mkdir(), ang_dir.mkdir()
    r = np.random.default_rng(5)
    for i in range(4):
        cv2.imwrite(str(img_dir / f"image{i}.jpg"),
                    r.integers(0, 255, size=(60, 80, 3)).astype(np.uint8))
        (ang_dir / f"angle{i}.json").write_text(
            _json.dumps([float(10 * i), -20.0, 30.0, 0.0, 45.0, 0.0]))
    csv = tmp_path / "m.csv"
    main(["sync", "meca500", "--base-dirs", str(img_dir), "--joint-dir", str(ang_dir),
          "--out", str(csv)])
    conf = tmp_path / "SN.conf"
    conf.write_text(CONF_TEXT)
    calib_dir = tmp_path / "calib"
    main(["calibrate", "intrinsics", "--conf", str(conf), "--serial", "41182735",
          "--view", "front", "--resolution", "FHD", "--out-dir", str(calib_dir)])
    summary = tmp_path / "s.json"
    main(["calibrate", "manual", "--view", "front", "--cam", "leftcam",
          "--tvec", "0", "-0.01", "0.75", "--rvec-deg", "96", "98", "-45",
          "--out", str(summary)])

    workdir = tmp_path / "run"
    common = ["--robot", "meca500", "--csv", str(csv), "--calib-dir", str(calib_dir),
              "--aruco-summary", str(summary), "--image-hw", "60", "80",
              "--model-size", "64", "--hidden-size", "64", "--num-layers", "1",
              "--batch-size", "2", "--angle-head", "geometric"]
    rc = main(["train", *common, "--workdir", str(workdir),
               "--epochs", "1", "--val-split", "0.5", "--no-augment"])
    assert rc == 0
    rc = main(["eval", *common, "--params", str(workdir / "best_params.npz")])
    assert rc == 0


def test_cli_serve_display_window_headless(monkeypatch):
    """--display window drives the cv2.imshow canvas loop + 'q' quit
    (reference DIP_REAL.py:218-271) without a real display: imshow/waitKey/
    destroyAllWindows are stubbed, waitKey returns 'q' after a few frames so
    the quit path executes end-to-end."""
    import cv2

    shown = {"n": 0, "shapes": []}

    def fake_imshow(name, canvas):
        shown["n"] += 1
        shown["shapes"].append(canvas.shape)

    def fake_waitKey(ms):
        return ord("q") if shown["n"] >= 3 else 0

    monkeypatch.setattr(cv2, "imshow", fake_imshow)
    monkeypatch.setattr(cv2, "waitKey", fake_waitKey)
    monkeypatch.setattr(cv2, "destroyAllWindows", lambda: None)

    rc = main(
        [
            "serve", "--views", "2", "--fps", "60", "--frame-hw", "32", "48",
            "--model-size", "32", "--hidden-size", "64", "--num-layers", "1",
            "--duration", "20.0", "--display", "window",
        ]
    )
    assert rc == 0
    assert shown["n"] >= 3  # canvases rendered
    # 'q' quit fired well before the 20 s duration budget (the loop exited
    # because of the key, not the timer - enforced by the short test timeout).
    for shape in shown["shapes"]:
        assert len(shape) == 3 and shape[2] == 3


@pytest.mark.slow
def test_dream_synthetic_generator_end_to_end(tmp_path):
    """scripts/make_dream_synthetic.py writes the DREAM file schema such that
    sync -> build_dream_single_view -> train runs end to end and the rendered
    blobs sit AT the stored projected keypoints (the stored-kpt GT path)."""
    import subprocess
    import sys as _sys

    import pandas as pd

    script = Path(__file__).resolve().parents[1] / "scripts" / "make_dream_synthetic.py"
    out = tmp_path / "ds"
    subprocess.run(
        [_sys.executable, str(script), "--out-dir", str(out), "--n-samples", "6",
         "--image-hw", "64", "64"],
        check=True, capture_output=True, timeout=300,
    )
    base = out / "panda_synth"
    csv = tmp_path / "dream.csv"
    assert main(["sync", "dream", "--base-dirs", str(base), "--out", str(csv)]) == 0
    df = pd.read_csv(csv)
    assert len(df) == 6

    # Rendered blob peak lands at the stored projected keypoint (+-2 px incl.
    # jpg compression): certify image<->stored-GT consistency per channel by
    # palette color matching at the stored location.
    import cv2 as _cv2

    row = df.iloc[0]
    img = _cv2.imread(str(base / "0000.rgb.jpg"))[..., ::-1].astype(np.float32)
    from mvropose_tpu.data.sync import DREAM_KEYPOINT_NAMES
    from mvropose_tpu.data.synthetic import joint_palette

    pal = (joint_palette(7) * 0.5 + 0.5) * 255.0
    for k, n in enumerate(DREAM_KEYPOINT_NAMES):
        x, y = row[f"kpt_{n}_proj_x"], row[f"kpt_{n}_proj_y"]
        patch = img[max(0, int(y) - 1): int(y) + 2, max(0, int(x) - 1): int(x) + 2]
        # The blob's palette hue must dominate the local patch direction.
        v = patch.reshape(-1, 3).mean(0) - img.mean((0, 1))
        cos = float(np.dot(v, pal[k] - 127.5) / (np.linalg.norm(v) * np.linalg.norm(pal[k] - 127.5) + 1e-6))
        assert cos > 0.5, (n, cos)

    rc = main([
        "train", "--robot", "dream", "--csv", str(csv),
        "--dream-dirs", str(base), "--workdir", str(tmp_path / "run"),
        "--image-hw", "64", "64", "--model-size", "64",
        "--hidden-size", "64", "--num-layers", "1",
        "--batch-size", "2", "--epochs", "1", "--val-split", "0.5", "--no-augment",
    ])
    assert rc == 0


@pytest.mark.slow
def test_cli_geometric3d_train_then_serve(tmp_path):
    """geometric3d end to end through the CLI: multi-view FR3 training (the
    triangulation branch consumes per-batch projection matrices), then serve
    with --recover-pose, where the rig's heatmap projection matrices are
    rebuilt from --summary extrinsics and fed to the model every tick
    (cli serve's serve_pm wiring - previously only unit/dryrun-tested).
    Also pins the guard: a geometric3d checkpoint without --summary must
    refuse instead of silently serving garbage triangulations."""
    import cv2

    jdir = tmp_path / "joints"
    jdir.mkdir()
    docs = []
    for i in range(6):
        names = ", ".join(f"fr3_joint{j}" for j in range(1, 8))
        pos = ", ".join(str(0.1 * j + 0.01 * i) for j in range(1, 8))
        docs.append(
            f"header:\n  stamp:\n    sec: {1000 + i}\n    nanosec: 0\n"
            f"name: [{names}]\nposition: [{pos}]\n"
        )
    (jdir / "joint_states_0.yaml").write_text("---\n".join(docs))

    img_dir = tmp_path / "pose1"
    rng = np.random.default_rng(0)
    for i in range(6):
        for serial in ("41182735", "49429257"):
            p = img_dir / f"zed_{serial}_left_{1000 + i}.0.jpg"
            p.parent.mkdir(parents=True, exist_ok=True)
            cv2.imwrite(str(p), rng.integers(0, 255, size=(60, 80, 3)).astype(np.uint8))

    csv = tmp_path / "fr3.csv"
    assert main([
        "sync", "fr3", "--base-dirs", str(img_dir), "--joint-dir", str(jdir),
        "--out", str(csv), "--tolerance", "0.05",
    ]) == 0

    conf = tmp_path / "SN.conf"
    conf.write_text(CONF_TEXT)
    calib_dir = tmp_path / "calib"
    for serial, view in (("41182735", "view1"), ("49429257", "view2")):
        main(["calibrate", "intrinsics", "--conf", str(conf), "--serial", serial,
              "--view", view, "--resolution", "FHD", "--out-dir", str(calib_dir)])
    summary = tmp_path / "pose1_aruco_pose_summary.json"
    for view in ("view1", "view2"):
        for cam in ("leftcam", "rightcam"):
            main(["calibrate", "manual", "--view", view, "--cam", cam,
                  "--tvec", "0", "0", "1.2", "--rvec-deg", "3.14159", "0", "0",
                  "--out", str(summary)])

    workdir = tmp_path / "run_geo3d"
    rc = main([
        "train", "--robot", "fr3", "--csv", str(csv),
        "--calib-dir", str(calib_dir), "--aruco-summary", str(summary),
        "--workdir", str(workdir), "--image-hw", "60", "80",
        "--model-size", "64", "--hidden-size", "64", "--num-layers", "1",
        "--batch-size", "2", "--epochs", "1", "--val-split", "0.34",
        "--tolerance", "0.05", "--no-augment", "--angle-head", "geometric3d",
    ])
    assert rc == 0

    # Eval restores the geometric3d arch from model_config.json and feeds
    # per-batch projection matrices to the DLT branch.
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main([
            "eval", "--robot", "fr3", "--csv", str(csv),
            "--calib-dir", str(calib_dir), "--aruco-summary", str(summary),
            "--params", str(workdir / "best_params.npz"), "--image-hw", "60", "80",
            "--batch-size", "2", "--tolerance", "0.05",
        ])
    assert rc == 0
    report = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert np.isfinite(report["angle_mae"])

    # Guard: geometric3d without the rig's extrinsics must refuse.
    with pytest.raises(SystemExit, match="geometric3d"):
        main([
            "serve", "--views", "2", "--fps", "60", "--frame-hw", "60", "80",
            "--duration", "1.0", "--params", str(workdir / "best_params.npz"),
        ])

    rc = main([
        "serve", "--views", "2", "--fps", "60", "--frame-hw", "60", "80",
        "--duration", "1.0", "--params", str(workdir / "best_params.npz"),
        "--recover-pose", "--pose-robot", "fr3",
        "--calib-dir", str(calib_dir),
        "--camera-keys", "view1_leftcam,view2_leftcam",
        "--summary", str(summary),
    ])
    assert rc == 0


@pytest.mark.slow
def test_cli_train_with_dinov3_rope_backbone(tmp_path):
    """A real (random-init) HF DINOv3ViTModel state dict trains through
    --backbone-ckpt --rope (RoPE attention, no pos_embed, biasless k) and
    the trained checkpoint evaluates with ZERO arch flags - use_rope and
    the 1e-5 LayerNorm eps round-trip through model_config.json. Without
    --rope the graft must fail loudly pointing at the flag."""
    import json as _json

    import cv2
    import torch
    from transformers.models.dinov3_vit import DINOv3ViTConfig, DINOv3ViTModel

    torch.manual_seed(0)
    hf_cfg = DINOv3ViTConfig(
        hidden_size=64, num_hidden_layers=1, num_attention_heads=1,
        intermediate_size=256, image_size=64, patch_size=16,
        num_register_tokens=2, layerscale_value=1.0,
    )
    sd = {k: v.numpy() for k, v in DINOv3ViTModel(hf_cfg).state_dict().items()}
    ckpt = tmp_path / "dinov3_tiny.npz"
    np.savez(ckpt, **sd)

    img_dir = tmp_path / "image"
    ang_dir = tmp_path / "angle"
    img_dir.mkdir(), ang_dir.mkdir()
    r = np.random.default_rng(2)
    for i in range(4):
        cv2.imwrite(str(img_dir / f"image{i}.jpg"),
                    r.integers(0, 255, size=(60, 80, 3)).astype(np.uint8))
        (ang_dir / f"angle{i}.json").write_text(
            _json.dumps([float(10 * i), -20.0, 30.0, 0.0, 45.0, 0.0]))
    csv = tmp_path / "m.csv"
    main(["sync", "meca500", "--base-dirs", str(img_dir), "--joint-dir", str(ang_dir),
          "--out", str(csv)])
    conf = tmp_path / "SN.conf"
    conf.write_text(CONF_TEXT)
    calib_dir = tmp_path / "calib"
    main(["calibrate", "intrinsics", "--conf", str(conf), "--serial", "41182735",
          "--view", "front", "--resolution", "FHD", "--out-dir", str(calib_dir)])
    summary = tmp_path / "s.json"
    main(["calibrate", "manual", "--view", "front", "--cam", "leftcam",
          "--tvec", "0", "-0.01", "0.75", "--rvec-deg", "96", "98", "-45",
          "--out", str(summary)])

    common = [
        "train", "--robot", "meca500", "--csv", str(csv),
        "--calib-dir", str(calib_dir), "--aruco-summary", str(summary),
        "--image-hw", "60", "80",
        "--model-size", "64", "--hidden-size", "64", "--num-layers", "1",
        "--patch-size", "16", "--register-tokens", "2",
        "--backbone-ckpt", str(ckpt),
        "--batch-size", "2", "--epochs", "1", "--val-split", "0.5", "--no-augment",
    ]
    # Without --rope: the init tree has pos_embed, the checkpoint doesn't.
    with pytest.raises(ValueError, match="--rope"):
        main(common + ["--workdir", str(tmp_path / "bad")])

    workdir = tmp_path / "run"
    rc = main(common + ["--rope", "--workdir", str(workdir)])
    assert rc == 0
    cfg_json = _json.loads((workdir / "model_config.json").read_text())
    assert cfg_json["vit"]["use_rope"] is True
    assert cfg_json["vit"]["layer_norm_eps"] == 1e-5

    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main([
            "eval", "--robot", "meca500", "--csv", str(csv),
            "--calib-dir", str(calib_dir), "--aruco-summary", str(summary),
            "--params", str(workdir / "best_params.npz"),
            "--image-hw", "60", "80", "--batch-size", "2",
        ])
    assert rc == 0
    report = _json.loads(buf.getvalue().strip().splitlines()[-1])
    assert np.isfinite(report["angle_mae"])

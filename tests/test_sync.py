"""Sync engine + adapters on synthetic fixture trees."""

import json
import numpy as np
import pandas as pd
import pytest

from mvropose_tpu.data.sync import (
    SyncConfig,
    match_nearest,
    parse_timestamp_from_filename,
    sync_fr5,
    sync_fr3,
    sync_dream,
    sync_meca500,
    sync_meca_insertion,
)
from mvropose_tpu.data.grouping import group_by_time_tolerance, tolerance_grid_search


def test_match_nearest_basic():
    ref = np.array([0.0, 1.0, 2.0, 3.0])
    q = np.array([0.9, 1.6, 3.4, -0.2])
    idx, valid = match_nearest(q, ref, tolerance_s=0.45)
    np.testing.assert_array_equal(idx, [1, 2, 3, 0])
    np.testing.assert_array_equal(valid, [True, True, True, True])
    _, valid2 = match_nearest(q, ref, tolerance_s=0.3)
    np.testing.assert_array_equal(valid2, [True, False, False, True])


def test_match_nearest_empty():
    idx, valid = match_nearest(np.array([1.0]), np.array([]), 0.1)
    assert not valid.any()


def test_parse_timestamp():
    assert parse_timestamp_from_filename("zed_38007749_left_1748242800.123.jpg") == 1748242800.123
    assert parse_timestamp_from_filename("bad_name.jpg") is None


def _touch_image(path):
    path.parent.mkdir(parents=True, exist_ok=True)
    import cv2

    cv2.imwrite(str(path), np.zeros((8, 8, 3), np.uint8))


def test_sync_fr5_end_to_end(tmp_path):
    base = tmp_path / "Fr5_1th"
    for i in range(5):
        ts = 1000.0 + i * 0.1
        (base / "joint").mkdir(parents=True, exist_ok=True)
        (base / "joint" / f"joint_{ts:.3f}.json").write_text(json.dumps([float(i)] * 6))
    # Images slightly before each joint timestamp (delay compensation +33.3ms)
    for side in ("left", "right"):
        for i in range(5):
            ts = 1000.0 + i * 0.1 - 0.03
            _touch_image(base / side / f"zed_38007749_{side}_{ts:.3f}.jpg")

    df = sync_fr5([base], SyncConfig(tolerance_s=0.05))
    assert len(df) == 10
    assert set(df.columns) >= {"image_path", "joint_1", "joint_6", "time_difference_s"}
    # Each image matched its nearest joint row within tolerance.
    assert (df["time_difference_s"] < 0.05).all()
    # Delay correction: image at t-0.03 + 0.0333 delay ~ joint t => ~3.3ms.
    assert df["time_difference_s"].max() < 0.01


def test_sync_fr5_rejects_bad_joint_files(tmp_path):
    base = tmp_path / "d"
    (base / "joint").mkdir(parents=True)
    (base / "joint" / "j_1000.0.json").write_text(json.dumps([1.0] * 4))  # wrong arity
    (base / "joint" / "j_1001.0.json").write_text("not json")
    _touch_image(base / "left" / "zed_1_left_1000.0.jpg")
    assert sync_fr5([base]).empty


def test_sync_fr3_yaml(tmp_path):
    jdir = tmp_path / "joints"
    jdir.mkdir()
    docs = []
    for i in range(4):
        docs.append(
            "header:\n  stamp:\n    sec: %d\n    nanosec: %d\n"
            "name: [fr3_joint1, fr3_joint2]\nposition: [%f, %f]\n"
            "velocity: [0.0, 0.0]\neffort: [0.0, 0.0]\n" % (1000 + i, 0, 0.1 * i, 0.2 * i)
        )
    (jdir / "joint_states_0.yaml").write_text("---\n".join(docs))
    img_dir = tmp_path / "pose1"
    for i in range(4):
        _touch_image(img_dir / f"zed_41182735_left_{1000 + i}.0.jpg")

    df = sync_fr3([img_dir], jdir, SyncConfig(tolerance_s=0.05))
    assert len(df) == 4
    assert "position_fr3_joint1" in df.columns
    np.testing.assert_allclose(sorted(df["position_fr3_joint1"]), [0.0, 0.1, 0.2, 0.3])


def test_sync_dream(tmp_path):
    base = tmp_path / "panda-3cam_azure"
    base.mkdir()
    kp_names = [
        "panda_link0", "panda_link2", "panda_link3", "panda_link4",
        "panda_link6", "panda_link7", "panda_hand",
    ]
    for i in range(3):
        data = {
            "sim_state": {
                "joints": [{"name": f"panda_joint{j}", "position": 0.1 * j + i} for j in range(1, 8)]
            },
            "objects": [
                {
                    "keypoints": [
                        {
                            "name": n,
                            "location": [1.0 * k, 2.0, 3.0],
                            "projected_location": [10.0 * k + i, 20.0],
                        }
                        for k, n in enumerate(kp_names)
                    ]
                }
            ],
        }
        (base / f"{i:04d}.json").write_text(json.dumps(data))
        _touch_image(base / f"{i:04d}.rgb.jpg")
    # A camera-settings file must be ignored.
    (base / "_camera_settings.json").write_text("{}")

    df = sync_dream(base)
    assert len(df) == 3
    assert df["joint_1"].tolist() == [0.1, 1.1, 2.1]
    assert "kpt_panda_hand_proj_x" in df.columns


def test_sync_meca500(tmp_path):
    (tmp_path / "angle").mkdir()
    (tmp_path / "image").mkdir()
    for i in (1, 2, 7):
        (tmp_path / "angle" / f"angle{i}.json").write_text(json.dumps([float(i)] * 6))
        _touch_image(tmp_path / "image" / f"image{i}.jpg")
    (tmp_path / "angle" / "angle9.json").write_text(json.dumps([9.0] * 6))  # no image

    df = sync_meca500(tmp_path / "image", tmp_path / "angle")
    assert len(df) == 3
    assert sorted(df["joint_1"]) == [1.0, 2.0, 7.0]


def test_sync_meca_insertion(tmp_path):
    """Reference robot_data.txt layout: timestamp + 7 joints + 5 cartesian
    (/root/reference/sync/Meca_insertion_sync.py:48-54 reads
    num_joint_angles = 7 even though the Meca500 arm is 6-dof - the 7th is
    the insertion rig's tool channel). The matched CSV must carry all seven
    joint columns; the builder later consumes the 6 actuated ones."""
    txt = tmp_path / "robot_data.txt"
    lines = ["timestamp,j1,j2,j3,j4,j5,j6,j7,x,y,z,a,b"]  # header must be skipped
    for i in range(3):
        ts = 2000.0 + i
        lines.append(
            ",".join(str(v) for v in [ts] + [0.5 * i] * 6 + [9.0] + [1, 2, 3, 4, 5])
        )
    txt.write_text("\n".join(lines))
    img_dir = tmp_path / "imgs"
    for i in range(3):
        _touch_image(img_dir / f"zed_41182735_left_{2000.0 + i - 0.03:.3f}.jpg")

    df = sync_meca_insertion([img_dir], txt, SyncConfig(tolerance_s=0.05))
    assert len(df) == 3
    assert "joint_7" in df.columns and sorted(set(df["joint_7"])) == [9.0]
    assert "cartesian_0" in df.columns and sorted(set(df["cartesian_0"])) == [1.0]


def test_grouping_reference_semantics():
    # Rows at t=0, 0.01, 0.02, | 0.2, 0.21, | 0.5 with tol 0.05.
    ts = [0.0, 0.01, 0.02, 0.2, 0.21, 0.5]
    df = pd.DataFrame(
        {
            "robot_timestamp": ts,
            "image_path": [f"im{i}.jpg" for i in range(len(ts))],
            "position_j1": np.arange(len(ts), dtype=float),
        }
    )
    groups = group_by_time_tolerance(df, 0.05, max_views=8)
    assert [len(g["views"]) for g in groups] == [3, 2, 1]
    # Angles come from the group's first row.
    assert groups[1]["joint_angles"] == [3.0]
    # min_views filter drops singleton groups (reference drops 1-view groups).
    groups2 = group_by_time_tolerance(df, 0.05, max_views=8, min_views=2)
    assert [len(g["views"]) for g in groups2] == [3, 2]


def test_grouping_max_views_split():
    ts = [0.0 + 0.001 * i for i in range(10)]
    df = pd.DataFrame(
        {"robot_timestamp": ts, "image_path": ["x"] * 10, "position_j1": [0.0] * 10}
    )
    groups = group_by_time_tolerance(df, 1.0, max_views=4)
    assert [len(g["views"]) for g in groups] == [4, 4, 2]


def test_tolerance_grid_search():
    ts = np.concatenate([np.arange(8) * 0.01 + k for k in range(5)])
    df = pd.DataFrame(
        {"robot_timestamp": ts, "image_path": ["x"] * len(ts), "position_j1": [0.0] * len(ts)}
    )
    best, dist = tolerance_grid_search(df, [0.01, 0.05, 0.10], max_views=8)
    assert best == 0.10  # widest tolerance makes the most full groups
    assert dist[0.10][8] == 5


def test_grouping_default_angle_cols_exclude_bookkeeping():
    """joint_timestamp/joint_path must not leak into joint_angles."""
    df = pd.DataFrame(
        {
            "robot_timestamp": [0.0, 0.01],
            "joint_timestamp": [99.0, 99.0],
            "joint_path": ["a", "b"],
            "image_path": ["x", "y"],
            "joint_1": [1.0, 1.0],
            "joint_2": [2.0, 2.0],
        }
    )
    groups = group_by_time_tolerance(df, 0.05, max_views=8)
    assert groups[0]["joint_angles"] == [1.0, 2.0]


def test_sync_zero_timestamp_not_dropped(tmp_path):
    """A filename timestamp of exactly 0.0 (sessions that log time relative
    to start name their first frame ..._0.0.jpg) is a legitimate parse, not
    an unparseable file - the old `parse(...) or nan` falsy-zero check
    silently dropped it from every timestamp-based sync."""
    base = tmp_path / "rel0"
    (base / "joint").mkdir(parents=True)
    for i in range(3):
        ts = i * 0.1
        (base / "joint" / f"joint_{ts:.3f}.json").write_text(json.dumps([float(i)] * 6))
        _touch_image(base / "left" / f"zed_38007749_left_{ts - 0.03:.3f}.jpg")

    df = sync_fr5([base], SyncConfig(tolerance_s=0.05))
    # The i=0 image is named ..._-0.030.jpg; ensure an EXACT 0.0 also syncs.
    _touch_image(base / "left" / "zed_38007749_left_0.0.jpg")
    df = sync_fr5([base], SyncConfig(tolerance_s=0.05))
    assert any(str(p).endswith("_0.0.jpg") for p in df["image_path"])

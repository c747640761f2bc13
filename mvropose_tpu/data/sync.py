"""Timestamp synchronization engine + per-robot source adapters.

One vectorized nearest-timestamp matcher (`match_nearest`, the merge_asof
equivalent) replaces the reference's five near-duplicate sync scripts, which
it reproduces as thin adapters:
  * sync_fr5            (/root/reference/sync/Fr5_sync.py: per-file JSON
                         joints, +33.3 ms camera delay, 50 ms tolerance)
  * sync_fr3            (/root/reference/sync/franka_research3_sync.py: ROS2
                         YAML streams, 20 ms tolerance)
  * sync_dream          (/root/reference/sync/DREAM_sync.py: basename pairing
                         of xxxx.json / xxxx.rgb.jpg with stored keypoints)
  * sync_meca500        (/root/reference/sync/Meca500_sync.py: index pairing)
  * sync_meca_insertion (/root/reference/sync/Meca_insertion_sync.py:
                         robot_data.txt CSV log)

All adapters output the same pandas DataFrame schema the reference's CSVs
use, so downstream (grouping, datasets) is robot-agnostic. O(n log n)
searchsorted matching instead of the reference's O(images x joints) argmin
loop (Fr5_sync.py:103-106).
"""

from __future__ import annotations

import dataclasses
import json
import re
from pathlib import Path
from typing import Iterable, Sequence

import numpy as np
import pandas as pd


@dataclasses.dataclass(frozen=True)
class SyncConfig:
    tolerance_s: float = 0.05
    image_delay_s: float = 0.0333  # camera latency added to image timestamps


def parse_timestamp_from_filename(path: str | Path) -> float | None:
    """'<anything>_<epoch>.ext' -> float epoch (reference filename scheme)."""
    stem = Path(path).stem
    token = stem.split("_")[-1]
    try:
        return float(token)
    except ValueError:
        return None


def match_nearest(
    query_ts: np.ndarray,
    ref_ts: np.ndarray,
    tolerance_s: float,
) -> tuple[np.ndarray, np.ndarray]:
    """For each query timestamp, index of the nearest reference timestamp.

    Returns (idx (N,), valid (N,) bool). ref_ts must be sorted. Vectorized
    searchsorted: the merge_asof(direction='nearest') core.
    """
    query_ts = np.asarray(query_ts, dtype=np.float64)
    ref_ts = np.asarray(ref_ts, dtype=np.float64)
    n = len(ref_ts)
    if n == 0:
        return np.zeros(len(query_ts), np.int64), np.zeros(len(query_ts), bool)
    if len(query_ts) * n > 1_000_000:
        # Large logs: use the native binary-search matcher when available.
        try:
            from mvropose_tpu.native import match_nearest_native, native_available

            if native_available():
                return match_nearest_native(query_ts, ref_ts, tolerance_s)
        except ImportError:
            pass
    pos = np.searchsorted(ref_ts, query_ts)
    left = np.clip(pos - 1, 0, n - 1)
    right = np.clip(pos, 0, n - 1)
    d_left = np.abs(query_ts - ref_ts[left])
    d_right = np.abs(query_ts - ref_ts[right])
    idx = np.where(d_right < d_left, right, left)
    dist = np.minimum(d_left, d_right)
    return idx, dist < tolerance_s


def _find_images(dirs: Iterable[str | Path], subfolders: Sequence[str] | None = None,
                 exts=(".jpg", ".jpeg", ".png")) -> list[str]:
    paths: list[str] = []
    for d in dirs:
        d = Path(d)
        roots = [d / s for s in subfolders] if subfolders else [d]
        for root in roots:
            if not root.exists():
                continue
            for p in sorted(root.rglob("*")):
                if p.suffix.lower() in exts:
                    paths.append(str(p))
    return paths


def _sync_images_to_joints(
    image_paths: Sequence[str],
    df_joints: pd.DataFrame,
    ts_col: str,
    cfg: SyncConfig,
) -> pd.DataFrame:
    """Shared tail of the timestamp-based adapters."""
    # Explicit None check: `or np.nan` would drop a legitimate 0.0 timestamp
    # (captures that encode time relative to session start name the first
    # frame ..._0.0.jpg).
    img_ts = np.array(
        [
            ts if (ts := parse_timestamp_from_filename(p)) is not None else np.nan
            for p in image_paths
        ],
        dtype=np.float64,
    )
    ok = ~np.isnan(img_ts)
    image_paths = [p for p, o in zip(image_paths, ok) if o]
    img_ts = img_ts[ok]

    df_joints = df_joints.sort_values(ts_col, ignore_index=True)
    idx, valid = match_nearest(img_ts + cfg.image_delay_s, df_joints[ts_col].values, cfg.tolerance_s)

    rows = df_joints.iloc[idx[valid]].reset_index(drop=True)
    out = pd.DataFrame(
        {
            "image_path": np.asarray(image_paths, dtype=object)[valid],
            "image_timestamp": img_ts[valid],
        }
    )
    out["time_difference_s"] = np.abs(
        img_ts[valid] + cfg.image_delay_s - rows[ts_col].values
    )
    out = pd.concat([out, rows], axis=1)
    return out.sort_values("image_timestamp", ignore_index=True)


# ------------------------------- Fr5 ---------------------------------------


def sync_fr5(
    base_dirs: Sequence[str | Path],
    cfg: SyncConfig = SyncConfig(tolerance_s=0.05),
    n_joints: int = 6,
) -> pd.DataFrame:
    """Fr5: images in {left,right,top}/ subdirs, joints in joint/*.json
    (a 6-element degree list per file, timestamp in the filename)."""
    records = []
    for d in base_dirs:
        for p in sorted((Path(d) / "joint").glob("*.json")):
            ts = parse_timestamp_from_filename(p)
            if ts is None:
                continue
            try:
                angles = json.loads(p.read_text())
            except json.JSONDecodeError:
                continue
            if not isinstance(angles, list) or len(angles) != n_joints:
                continue
            rec = {"joint_timestamp": ts, "joint_path": str(p)}
            rec.update({f"joint_{i + 1}": a for i, a in enumerate(angles)})
            records.append(rec)
    df_joints = pd.DataFrame(records)
    images = _find_images(base_dirs, subfolders=("left", "right", "top"))
    if df_joints.empty or not images:
        return pd.DataFrame()
    return _sync_images_to_joints(images, df_joints, "joint_timestamp", cfg)


# ------------------------------- FR3 ----------------------------------------


def _yaml_joint_records(yaml_path: str | Path) -> list[dict]:
    import yaml

    records = []
    with open(yaml_path) as f:
        for doc in yaml.safe_load_all(f):
            if not doc:
                continue
            stamp = doc.get("header", {}).get("stamp", {})
            sec = stamp.get("sec", 0)
            nanosec = stamp.get("nanosec", 0)
            rec = {"robot_timestamp": float(f"{sec}.{nanosec:09d}"[:14])}
            names = doc.get("name", [])
            for field in ("position", "velocity", "effort"):
                vals = doc.get(field, [])
                for i, name in enumerate(names):
                    rec[f"{field}_{name}"] = vals[i] if i < len(vals) else np.nan
            records.append(rec)
    return records


def sync_fr3(
    image_dirs: Sequence[str | Path],
    joint_yaml_dir: str | Path,
    cfg: SyncConfig = SyncConfig(tolerance_s=0.02),
) -> pd.DataFrame:
    """FR3: recursive image scan over pose dirs; joints from ROS2
    joint_states_*.yaml streams (radians)."""
    records = []
    for p in sorted(Path(joint_yaml_dir).glob("joint_states_*.yaml")):
        records.extend(_yaml_joint_records(p))
    df_joints = pd.DataFrame(records)
    images = _find_images(image_dirs)
    if df_joints.empty or not images:
        return pd.DataFrame()
    return _sync_images_to_joints(images, df_joints, "robot_timestamp", cfg)


# ------------------------------- DREAM ---------------------------------------

DREAM_KEYPOINT_NAMES = (
    "panda_link0",
    "panda_link2",
    "panda_link3",
    "panda_link4",
    "panda_link6",
    "panda_link7",
    "panda_hand",
)


def sync_dream(base_path: str | Path, n_joints: int = 7) -> pd.DataFrame:
    """DREAM: pair xxxx.json with xxxx.rgb.jpg by basename; extract 7 joint
    positions + the 7 standard keypoints' 3D location and 2D projection."""
    base = Path(base_path)
    records = []
    for jp in sorted(base.glob("*.json")):
        if jp.name.startswith("_"):
            continue  # _camera_settings.json / _object_settings.json
        img = jp.with_suffix("")  # strip .json
        img = img.parent / f"{img.name}.rgb.jpg"
        if not img.exists():
            continue
        try:
            data = json.loads(jp.read_text())
        except json.JSONDecodeError:
            continue
        joints = data.get("sim_state", {}).get("joints", [])
        jmap = {j["name"]: j["position"] for j in joints if "name" in j}
        required = [f"panda_joint{i}" for i in range(1, n_joints + 1)]
        if not all(n in jmap for n in required):
            continue
        objs = data.get("objects") or []
        if not objs or "keypoints" not in objs[0]:
            continue
        kmap = {k["name"]: k for k in objs[0]["keypoints"]}
        if not all(n in kmap for n in DREAM_KEYPOINT_NAMES):
            continue
        rec = {"image_path": str(img)}
        for i, n in enumerate(required, start=1):
            rec[f"joint_{i}"] = jmap[n]
        for n in DREAM_KEYPOINT_NAMES:
            k = kmap[n]
            rec[f"kpt_{n}_loc_x"], rec[f"kpt_{n}_loc_y"], rec[f"kpt_{n}_loc_z"] = k["location"]
            rec[f"kpt_{n}_proj_x"], rec[f"kpt_{n}_proj_y"] = k["projected_location"]
        records.append(rec)
    return pd.DataFrame(records)


# ------------------------------- Meca500 -------------------------------------


def sync_meca500(image_dir: str | Path, angle_dir: str | Path, n_joints: int = 6) -> pd.DataFrame:
    """Meca500: index-paired imageN.jpg <-> angleN.json (6 degree values)."""
    records = []
    for jp in sorted(Path(angle_dir).glob("angle*.json")):
        m = re.match(r"angle(\d+)\.json", jp.name)
        if not m:
            continue
        img = Path(image_dir) / f"image{m.group(1)}.jpg"
        if not img.exists():
            continue
        try:
            angles = json.loads(jp.read_text())
        except json.JSONDecodeError:
            continue
        if not isinstance(angles, list) or len(angles) != n_joints:
            continue
        rec = {"image_path": str(img)}
        rec.update({f"joint_{i + 1}": a for i, a in enumerate(angles)})
        records.append(rec)
    return pd.DataFrame(records)


# --------------------------- Meca insertion ----------------------------------


def sync_meca_insertion(
    image_dirs: Sequence[str | Path],
    robot_data_txt: str | Path,
    cfg: SyncConfig = SyncConfig(tolerance_s=0.05),
    n_joints: int = 7,
) -> pd.DataFrame:
    """Meca insertion: robot_data.txt CSV rows of
    timestamp, j1..jn, cartesian... matched to image filename timestamps.

    The reference reads SEVEN joint columns from the 12-value rows
    (timestamp + 7 joints + 5 cartesian,
    /root/reference/sync/Meca_insertion_sync.py:48-54), even though the
    Meca500 arm is 6-dof - the 7th column is the tool/gripper channel of the
    insertion rig's log. The matched CSV therefore carries joint_1..joint_7;
    the meca_insertion dataset builder consumes the 6 actuated Meca500
    joints (builders.build_meca_insertion_single_view reads
    joint_1..joint_{n_joints of the FK spec}) and joint_7 rides along for
    schema parity."""
    records = []
    with open(robot_data_txt) as f:
        for line in f:
            parts = [p.strip() for p in line.strip().split(",") if p.strip()]
            if len(parts) < 1 + n_joints:
                continue
            try:
                vals = [float(p) for p in parts]
            except ValueError:
                continue  # header line
            rec = {"robot_timestamp": vals[0]}
            rec.update({f"joint_{i + 1}": v for i, v in enumerate(vals[1 : 1 + n_joints])})
            for i, v in enumerate(vals[1 + n_joints :]):
                rec[f"cartesian_{i}"] = v
            records.append(rec)
    df_joints = pd.DataFrame(records)
    images = _find_images(image_dirs)
    if df_joints.empty or not images:
        return pd.DataFrame()
    return _sync_images_to_joints(images, df_joints, "robot_timestamp", cfg)

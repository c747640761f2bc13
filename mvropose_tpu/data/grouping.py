"""Multi-view temporal grouping.

Clusters synced rows into <= max_views groups by a time tolerance from the
group's first row, with the reference's exact semantics
(/root/reference/model/MvRoPose_FR3.py:38-59): a new group starts when the
gap to the group's FIRST timestamp exceeds the tolerance or the group is
full; the group's joint angles come from its first row. Plus the tolerance
grid search (MvRoPose_FR3.py:1021-1046).
"""

from __future__ import annotations

from typing import Mapping, Sequence

import numpy as np
import pandas as pd


def group_by_time_tolerance(
    df: pd.DataFrame,
    tolerance_s: float,
    max_views: int,
    ts_col: str = "robot_timestamp",
    angle_cols: Sequence[str] | None = None,
    min_views: int = 1,
) -> list[dict]:
    """-> [{"views": [{"image_path": ...}], "joint_angles": [...],
            "timestamp": float}]"""
    if df.empty:
        return []
    if angle_cols is None:
        import re

        # position_<name> (FR3 YAML schema) or joint_<N> (per-file schema);
        # excludes joint_timestamp / joint_path bookkeeping columns.
        angle_cols = [
            c for c in df.columns
            if c.startswith("position_") or re.fullmatch(r"joint_\d+", c)
        ]
    df = df.sort_values(ts_col, ignore_index=True)

    groups: list[dict] = []
    start_i = 0
    ts = df[ts_col].values
    # Pull columns once: per-row df.iloc materializes a Series per element,
    # ~50x slower at the DREAM scale of 44k rows (same convention as
    # builders.py).
    paths = df["image_path"].tolist()
    angles = df[list(angle_cols)].to_numpy(dtype=float)
    for i in range(1, len(df) + 1):
        if i == len(df) or ts[i] - ts[start_i] > tolerance_s or i - start_i >= max_views:
            groups.append(
                {
                    "views": [
                        {"image_path": paths[j]} for j in range(start_i, i)
                    ],
                    "joint_angles": angles[start_i].tolist(),
                    "timestamp": float(ts[start_i]),
                }
            )
            start_i = i
    if min_views > 1:
        groups = [g for g in groups if len(g["views"]) >= min_views]
    return groups


def tolerance_grid_search(
    df: pd.DataFrame,
    candidates: Sequence[float],
    max_views: int,
    ts_col: str = "robot_timestamp",
    angle_cols: Sequence[str] | None = None,
) -> tuple[float, dict[float, Mapping[int, int]]]:
    """Pick the tolerance maximizing the number of FULL (max_views) groups.

    Returns (best_tolerance, {tolerance: {group_size: count}}).
    """
    distributions: dict[float, Mapping[int, int]] = {}
    best_tol, best_full = float(candidates[0]), -1
    for tol in candidates:
        groups = group_by_time_tolerance(df, tol, max_views, ts_col, angle_cols)
        sizes = np.array([len(g["views"]) for g in groups]) if groups else np.array([], int)
        counts = dict(zip(*np.unique(sizes, return_counts=True))) if len(sizes) else {}
        distributions[tol] = {int(k): int(v) for k, v in counts.items()}
        full = distributions[tol].get(max_views, 0)
        if full > best_full:
            best_full, best_tol = full, float(tol)
    return best_tol, distributions

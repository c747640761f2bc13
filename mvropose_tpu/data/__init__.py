"""Data layer: sync engine, per-robot source adapters, grouping, loaders."""

from mvropose_tpu.data.sync import (
    match_nearest,
    SyncConfig,
    sync_fr5,
    sync_fr3,
    sync_dream,
    sync_meca500,
    sync_meca_insertion,
)
from mvropose_tpu.data.grouping import group_by_time_tolerance, tolerance_grid_search
from mvropose_tpu.data.dataset import (
    SingleViewSample,
    SingleViewDataset,
    MultiViewDataset,
    make_device_preprocessor,
)

__all__ = [
    "match_nearest",
    "SyncConfig",
    "sync_fr5",
    "sync_fr3",
    "sync_dream",
    "sync_meca500",
    "sync_meca_insertion",
    "group_by_time_tolerance",
    "tolerance_grid_search",
    "SingleViewSample",
    "SingleViewDataset",
    "MultiViewDataset",
    "make_device_preprocessor",
]

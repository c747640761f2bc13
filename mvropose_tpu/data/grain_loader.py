"""Grain-backed input pipeline: parallel host decode behind the device path.

The reference used torch DataLoader worker processes doing image decode AND
all geometry per sample (/root/reference/model/DREAM_Train.py:734,
num_workers=8). Here workers only decode + assemble fixed-shape sample dicts
(grain.MapDataset over the dataset's samples); all per-pixel math stays in
the jitted device preprocessor. Sharding across processes comes from grain's
built-in sharding options - the DistributedSampler equivalent
(DREAM_Train.py:726) with deterministic per-epoch reshuffling.
"""

from __future__ import annotations

import numpy as np
import grain

from mvropose_tpu.data.dataset import (
    SingleViewDataset,
    _load_image_rgb,
)


class _SampleMap:
    """Index -> fixed-shape numpy sample dict (picklable for grain workers)."""

    def __init__(self, dataset: SingleViewDataset):
        self.samples = dataset.samples
        self.geometry = dataset.geometry
        self.extr_key_fn = dataset.extr_key_fn

    def __len__(self) -> int:
        return len(self.samples)

    def __call__(self, idx: int) -> dict:
        H, W = self.geometry.image_hw
        s = self.samples[idx]
        rig = self.geometry.rig
        J = rig.num_keypoints
        out = {
            "images_u8": np.zeros((H, W, 3), np.uint8),
            "cam_idx": np.int32(0),
            "angles": np.asarray(s.angles, np.float32),
            "keypoints_2d": np.zeros((J, 2), np.float32),
            "sample_weight": np.float32(0.0),
        }
        img = _load_image_rgb(s.image_path)
        if img is None or img.shape[:2] != (H, W):
            return out
        ek = self.extr_key_fn(s) if self.extr_key_fn else None
        out["images_u8"] = img
        out["cam_idx"] = np.int32(self.geometry.key_to_idx[s.camera_key])
        out["keypoints_2d"] = self.geometry.gt_keypoints(s, ek)
        out["sample_weight"] = np.float32(1.0)
        return out


def make_grain_loader(
    dataset: SingleViewDataset,
    batch_size: int,
    shuffle: bool = False,
    seed: int = 0,
    num_workers: int = 0,
    num_epochs: int | None = 1,
    shard_index: int = 0,
    shard_count: int = 1,
):
    """-> iterable of fixed-shape host batches (same schema as
    SingleViewDataset.batches, minus ragged final batches: grain drops the
    remainder to keep shapes static)."""
    sample_map = _SampleMap(dataset)
    ds = grain.MapDataset.range(len(sample_map))
    if shard_count > 1:
        ds = ds[shard_index::shard_count]
    if shuffle:
        ds = ds.shuffle(seed=seed)
    if num_epochs is not None and num_epochs > 1:
        ds = ds.repeat(num_epochs)
    ds = ds.map(sample_map)
    ds = ds.batch(batch_size, drop_remainder=True)
    it = ds.to_iter_dataset()
    if num_workers > 0:
        it = it.mp_prefetch(
            grain.MultiprocessingOptions(num_workers=num_workers)
        )
    return it

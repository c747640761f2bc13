"""Grain-backed input pipeline: parallel host decode behind the device path.

The reference used torch DataLoader worker processes doing image decode AND
all geometry per sample (/root/reference/model/DREAM_Train.py:734,
num_workers=8). Here workers only decode + assemble fixed-shape sample dicts
(grain.MapDataset over the dataset's samples); the GT keypoints are
precomputed ONCE in the parent process (FK + projection are JAX ops - running
them inside mp_prefetch workers would force a per-worker JAX/backend init and
per-sample dispatch, and on a TPU host multiple processes contending for the
accelerator lock can wedge), and all per-pixel math stays in the jitted
device preprocessor. Sharding across processes comes from grain's built-in
sharding options - the DistributedSampler equivalent (DREAM_Train.py:726)
with deterministic per-epoch reshuffling.
"""

from __future__ import annotations

import numpy as np
import grain

from mvropose_tpu.data.dataset import (
    SingleViewDataset,
    _apply_roi_and_undistort,
    _load_image_rgb,
)


class _SampleMap:
    """Index -> fixed-shape numpy sample dict (picklable for grain workers).

    Applies the SAME per-sample prep as SingleViewDataset.batches (ROI crop
    with clamping, host undistortion, shape gate) so grain-loaded batches are
    geometrically identical to the direct path - a raw distorted image paired
    with keypoints projected for the undistorted frame would train on
    systematically shifted labels.
    """

    def __init__(self, dataset: SingleViewDataset):
        self.samples = dataset.samples
        self.geometry = dataset.geometry
        self.undistort_on_host = dataset.undistort_on_host
        self.has_kp3d = dataset.has_kp3d
        # Precompute (JAX) GT keypoints in the parent process; workers only
        # ever see numpy. Also force the cv2 remap tables into the instance
        # dict now - the cached_property computes them via JAX too.
        self.kp_raw = [
            np.asarray(
                dataset.geometry.gt_keypoints(
                    s, dataset.extr_key_fn(s) if dataset.extr_key_fn else None
                ),
                np.float32,
            )
            for s in self.samples
        ]
        if self.undistort_on_host and any(s.roi is None for s in self.samples):
            _ = self.geometry.cv2_maps

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
        if self.has_kp3d:
            out["keypoints_3d_cam"] = np.zeros((J, 3), np.float32)
        img = _load_image_rgb(s.image_path)
        if img is None:
            return out
        prepared = _apply_roi_and_undistort(
            self.geometry, s, img, self.kp_raw[idx], self.undistort_on_host
        )
        if prepared is None:
            return out
        img, kp = prepared
        out["images_u8"] = img
        out["cam_idx"] = np.int32(self.geometry.key_to_idx[s.camera_key])
        out["keypoints_2d"] = np.asarray(kp, np.float32)
        out["sample_weight"] = np.float32(1.0)
        if self.has_kp3d:
            out["keypoints_3d_cam"] = np.asarray(s.keypoints_3d_cam, np.float32)
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
    remainder to keep shapes static).

    num_epochs follows grain's own convention: None repeats FOREVER (an
    endless training stream), an int n yields n passes.
    """
    if dataset.with_extrinsics:
        raise ValueError(
            "make_grain_loader does not emit the with_extrinsics fields "
            "(rvec/tvec/K/base_rotation); use SingleViewDataset.batches for "
            "the FK-consistency / pose-eval paths"
        )
    sample_map = _SampleMap(dataset)
    ds = grain.MapDataset.range(len(sample_map))
    if shard_count > 1:
        ds = ds[shard_index::shard_count]
    if shuffle:
        ds = ds.shuffle(seed=seed)
    if num_epochs is None:
        ds = ds.repeat(None)
    elif num_epochs > 1:
        ds = ds.repeat(num_epochs)
    ds = ds.map(sample_map)
    ds = ds.batch(batch_size, drop_remainder=True)
    it = ds.to_iter_dataset()
    if num_workers > 0:
        it = it.mp_prefetch(
            grain.MultiprocessingOptions(num_workers=num_workers)
        )
    return it

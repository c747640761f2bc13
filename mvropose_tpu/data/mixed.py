"""Mixed-robot batches: heterogeneous robots in ONE fixed-shape train stream.

BASELINE.json config 4 is "Mixed-robot training (Fr5 + FR3 + Meca insertion)
data-parallel across a v5e-8 mesh". The reference never implemented it (one
script per robot); the TPU-native form is a single jitted step over batches
that pad every robot to the widest keypoint/angle arity:

  * keypoints pad with a far-out-of-frame sentinel -> the rendered GT
    heatmap for a padded channel is exactly zero, so heatmap MSE trains the
    model to SUPPRESS channels the sample's robot does not have (no channel
    mask needed - zero is the correct target);
  * angles pad with zeros AND an angle_mask (B, A_max) that drops the padded
    slots from the Huber loss (train/step.py) - unlike heatmaps there is no
    "correct" value for a 6-dof robot's 7th angle;
  * angle units are normalized to RADIANS across robots (Fr5/Meca train in
    degrees natively, FR3 in radians - mixing raw units would weight an Fr5
    degree error ~57x an FR3 radian error). Eval converts back per robot.

The model identifies the robot from the image alone (no robot-id input):
channel k of the heatmap head means "keypoint k of whichever robot is in
frame", which is exactly how a multi-robot deployment wants to behave and
mirrors DREAM's one-model-per-robot-family generality argument.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from mvropose_tpu.data.dataset import SingleViewDataset
from mvropose_tpu.data.grain_loader import _SampleMap

# Far outside any raw frame: the device heatmap renderer's gaussian at this
# center underflows to exactly 0.0 over the whole map (f32 exp(-~1e12)).
PAD_KEYPOINT = -1.0e6


class MixedRobotDataset:
    """Union of per-robot SingleViewDatasets, padded to shared arities.

    `samples` is the global index list [(child_idx, sample_idx)] so
    builders.train_val_split works unchanged (it shuffles and slices
    `.samples` on a shallow copy).
    """

    def __init__(self, datasets: Sequence[SingleViewDataset], robot_names: Sequence[str]):
        assert len(datasets) == len(robot_names) >= 1
        hws = {d.geometry.image_hw for d in datasets}
        assert len(hws) == 1, f"children must share image_hw, got {hws}"
        for d, name in zip(datasets, robot_names):
            # cam_idx collides across children and is only safe because the
            # host-undistort path never reads it on device.
            assert d.undistort_on_host, f"{name}: mixed batches need host undistort"
            assert not d.with_extrinsics, f"{name}: extrinsics fields are per-robot-shaped"
        self.children = list(datasets)
        self.robot_names = list(robot_names)
        self.geometry = datasets[0].geometry  # hw/heatmap binding for the preprocessor
        self.num_keypoints = max(d.geometry.rig.num_keypoints for d in datasets)
        self.num_angles = max(d.geometry.rig.robot.n_joints for d in datasets)
        # Per-child native->radian scale (train space is radians for all).
        self.angle_scale = [
            np.float32(np.pi / 180.0) if d.geometry.rig.robot.angle_unit == "deg" else np.float32(1.0)
            for d in datasets
        ]
        self.samples = [
            (ci, si) for ci, d in enumerate(datasets) for si in range(len(d.samples))
        ]
        self._maps = None  # built lazily: precomputes per-child GT keypoints

    def _sample_maps(self):
        if self._maps is None:
            self._maps = [_SampleMap(d) for d in self.children]
        return self._maps

    def __len__(self) -> int:
        return len(self.samples)

    def batches(self, batch_size: int, shuffle: bool = False, seed: int = 0):
        maps = self._sample_maps()
        n = len(self.samples)
        order = np.arange(n)
        if shuffle:
            np.random.default_rng(seed).shuffle(order)
        H, W = self.geometry.image_hw
        J, A = self.num_keypoints, self.num_angles
        for start in range(0, n, batch_size):
            idxs = order[start : start + batch_size]
            B = batch_size
            batch = {
                "images_u8": np.zeros((B, H, W, 3), np.uint8),
                "cam_idx": np.zeros((B,), np.int32),
                "angles": np.zeros((B, A), np.float32),
                "keypoints_2d": np.full((B, J, 2), PAD_KEYPOINT, np.float32),
                "sample_weight": np.zeros((B,), np.float32),
                "angle_mask": np.zeros((B, A), np.float32),
                "robot_id": np.zeros((B,), np.int32),
            }
            for slot, gi in enumerate(idxs):
                ci, si = self.samples[gi]
                s = maps[ci](si)
                j = s["keypoints_2d"].shape[0]
                a = s["angles"].shape[0]
                batch["images_u8"][slot] = s["images_u8"]
                batch["cam_idx"][slot] = s["cam_idx"]
                batch["angles"][slot, :a] = s["angles"] * self.angle_scale[ci]
                batch["sample_weight"][slot] = s["sample_weight"]
                batch["robot_id"][slot] = ci
                if s["sample_weight"] > 0:
                    batch["keypoints_2d"][slot, :j] = s["keypoints_2d"]
                    batch["angle_mask"][slot, :a] = 1.0
            yield batch

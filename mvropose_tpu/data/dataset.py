"""Fixed-shape datasets + jit-fused device preprocessing.

Host side (this module's Python classes) does I/O, bookkeeping and
full-resolution undistortion (cv2.remap - measured ~300x faster than the
XLA gather formulation on TPU for 1080p frames; see _RigGeometry.cv2_maps).
Resize, augmentation, normalization and GT heatmap rendering happen ON
DEVICE inside one jitted preprocessor, replacing the reference's per-sample
numpy work in dataloader workers (/root/reference/model/MvRoPose_FR3.py:209-225).

Fixed shapes everywhere:
  * single-view batch: images_u8 (B, H, W, 3), cam_idx (B,), angles (B, A),
    keypoints_2d (B, J, 2) in raw-image pixels, sample_weight (B,)
  * multi-view batch: images_u8 (B, V, H, W, 3), view_ids (B, V),
    view_mask (B, V), cam_idx (B, V), angles (B, A), keypoints_2d (B,V,J,2)
Partial final batches and failed image loads are padded with weight/mask 0 -
the reference's None-filter collate and dummy-view padding
(MvRoPose_FR3.py:949-967) without any dynamic shapes.
"""

from __future__ import annotations

import dataclasses
import functools
from pathlib import Path
from typing import Iterator, Mapping, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from mvropose_tpu.calib.registry import RigSpec
from mvropose_tpu.geometry.camera import undistort_map, remap_bilinear
from mvropose_tpu.geometry.heatmap import render_heatmaps
from mvropose_tpu.geometry.robots import forward_kinematics
from mvropose_tpu.geometry.camera import project_points

# DINOv2/v3 normalization (ImageNet), as used by every reference transform.
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


@dataclasses.dataclass(frozen=True)
class SingleViewSample:
    image_path: str
    camera_key: str  # "{view}_{cam}" into rig.calibs / rig.extrinsics
    view: str
    angles: np.ndarray  # (A,) native units
    keypoints_2d: np.ndarray | None = None  # (J, 2) raw-image px (DREAM-style)
    # Camera-frame 3D keypoints (J, 3) when the dataset stores them (DREAM's
    # kpt_*_loc_* columns). No extrinsic is shipped with such datasets; a
    # GT camera pose is recoverable per-sample by rigid (Kabsch) alignment
    # of FK(gt angles) to these points - see rotations.kabsch.
    keypoints_3d_cam: np.ndarray | None = None
    # Optional robot ROI (x1, y1, x2, y2) in raw-image px: the sample is
    # cropped to this box and stretch-resized to the dataset image_hw, with
    # GT keypoints transformed to match (the reference's precomputed
    # matched_index_with_roi.csv workflow, dataset/Fr5/*/matched_index*.csv).
    # ROI samples should reference pre-undistorted images (or near-zero
    # distortion): the crop happens before the device undistortion remap.
    roi: tuple[int, int, int, int] | None = None


def _load_image_rgb(path: str) -> np.ndarray | None:
    import cv2

    img = cv2.imread(path)
    if img is None:
        return None
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


def _parse_serial_cam(path: str) -> tuple[str, str] | None:
    """zed_<serial>_<side>_<ts>.jpg -> (serial, '<side>cam'); None when the
    filename doesn't follow the convention (policy everywhere in the data
    layer is skip-don't-crash, so a stray file in a capture dir must not
    IndexError a whole training run)."""
    parts = Path(path).name.split("_")
    if len(parts) < 3:
        return None
    return parts[1], parts[2] + "cam"


def _apply_roi_and_undistort(
    geometry: "_RigGeometry",
    s: SingleViewSample,
    img: np.ndarray,
    kp: np.ndarray,
    undistort_on_host: bool,
) -> tuple[np.ndarray, np.ndarray] | None:
    """Shared per-sample image prep: ROI crop (clamped) + host undistort +
    shape gate. Returns (image at image_hw, keypoints in that frame) or None
    when the sample can't be used (degenerate/out-of-frame ROI, wrong size).

    The ROI box is CLAMPED to the image before both the crop and the
    keypoint rescale: numpy slicing silently clips (and wraps negatives), so
    an out-of-range box would otherwise crop one region while the keypoints
    are rescaled for another - corrupted labels at full sample weight."""
    H, W = geometry.image_hw
    if s.roi is not None:
        import cv2

        x1, y1, x2, y2 = (int(v) for v in s.roi)
        Hs, Ws = img.shape[:2]
        x1, y1 = max(0, x1), max(0, y1)
        x2, y2 = min(Ws, x2), min(Hs, y2)
        if x2 - x1 < 2 or y2 - y1 < 2:
            return None
        img = cv2.resize(img[y1:y2, x1:x2], (W, H))
        kp = (kp - np.array([x1, y1], np.float32)) * np.array(
            [W / (x2 - x1), H / (y2 - y1)], np.float32
        )
    if img.shape[:2] != (H, W):
        return None
    if undistort_on_host and s.roi is None:
        img = geometry.undistort_host(img, geometry.key_to_idx[s.camera_key])
    return img, kp


# Module-level (not on _RigGeometry: geometry instances pickle into grain
# worker processes and a jit closure would break that), keyed by the robot
# registry name - robots are process-lifetime singletons.
_GT_KP_FNS: dict = {}


def _gt_kp_cpu(robot):
    """CPU-pinned jitted FK+projection for per-sample GT keypoints.

    This is host-side data plumbing called once PER SAMPLE: eager JAX ops on
    the default backend would each round-trip the tunneled TPU (~30 ms
    dispatch), turning a 4k-sample dataset build into many minutes at 0%
    CPU. One jit pinned to the host CPU device runs it in ~50 us per sample
    after a single trace."""
    fn = _GT_KP_FNS.get(robot.name)
    if fn is None:
        import jax

        def f(angles, base, rvec, tvec, K):
            pts3d = forward_kinematics(robot, angles, base)
            return project_points(pts3d, rvec, tvec, K, None)

        jitted = jax.jit(f)
        # local_devices, not devices: in a multi-process cluster
        # jax.devices() is GLOBAL, and [0] is process 0's device - pinning
        # host-side GT math there makes the result non-addressable (and
        # unfetchable) on every other process.
        cpu = jax.local_devices(backend="cpu")[0]

        def fn(angles, base, rvec, tvec, K):
            with jax.default_device(cpu):
                return jitted(angles, base, rvec, tvec, K)

        _GT_KP_FNS[robot.name] = fn
    return fn


class _RigGeometry:
    """Precomputed per-camera tables shared by the datasets."""

    def __init__(self, rig: RigSpec, image_hw: tuple[int, int]):
        self.rig = rig
        self.image_hw = image_hw
        self.camera_keys = sorted(rig.calibs)
        self.key_to_idx = {k: i for i, k in enumerate(self.camera_keys)}
        self.K = np.stack(
            [rig.calibs[k].camera_matrix for k in self.camera_keys]
        ).astype(np.float32)
        self.dist = np.stack(
            [rig.calibs[k].distortion_coeffs for k in self.camera_keys]
        ).astype(np.float32)

    @functools.cached_property
    def remaps(self) -> np.ndarray:
        """(C, 2, H, W) undistortion remap grid per camera.

        Computed on the host CPU device: the grids feed cv2.remap on the
        host, and the iterative inverse-distortion solve dispatched eagerly
        through a tunneled TPU costs minutes per camera."""
        import jax

        H, W = self.image_hw
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            grids = [
                np.asarray(undistort_map(jnp.asarray(K), jnp.asarray(d), H, W))
                for K, d in zip(self.K, self.dist)
            ]
        return np.stack(grids)

    @functools.cached_property
    def cv2_maps(self) -> list:
        """Per-camera (map_x, map_y) float32 pairs for host cv2.remap.

        MEASURED: the device remap is a 2M-element XLA gather - ~650 ms for
        4x1080p frames on a v5e (gathers don't vectorize on TPU). cv2.remap
        on host is ~1-2 ms per frame, so full-resolution undistortion belongs
        on the host; the device path remains for small images and for
        fused-everything pipelines."""
        maps = []
        for grid in self.remaps:
            maps.append((np.ascontiguousarray(grid[1], np.float32),
                         np.ascontiguousarray(grid[0], np.float32)))
        return maps

    def undistort_host(self, image: np.ndarray, cam_idx: int) -> np.ndarray:
        import cv2

        mx, my = self.cv2_maps[cam_idx]
        return cv2.remap(image, mx, my, cv2.INTER_LINEAR)

    def gt_keypoints(self, sample: SingleViewSample, extr_key: str | None = None) -> np.ndarray:
        """FK + projection GT keypoints in raw-image pixels (J, 2).

        Projection uses ZERO distortion because keypoints live on the
        undistorted image (the reference does the same,
        MvRoPose_FR3.py:215)."""
        if sample.keypoints_2d is not None:
            return sample.keypoints_2d
        rig = self.rig
        key = extr_key or sample.camera_key
        extr = rig.extrinsics[key]
        base = rig.robot.base_rotation(sample.view)
        K = rig.calibs[sample.camera_key].camera_matrix
        px = _gt_kp_cpu(rig.robot)(
            np.asarray(sample.angles, np.float32),
            np.asarray(base, np.float32),
            np.asarray(extr.rvec, np.float32),
            np.asarray(extr.tvec, np.float32),
            np.asarray(K, np.float32),
        )
        return np.asarray(px, dtype=np.float32)


@functools.partial(
    jax.jit,
    static_argnames=("model_size", "heatmap_size", "out_dtype", "augment_cfg", "use_remap"),
)
def _device_preprocess(
    images_u8: jnp.ndarray,  # (B, H, W, 3) uint8 raw
    cam_idx: jnp.ndarray,  # (B,) int32
    keypoints_2d: jnp.ndarray,  # (B, J, 2) raw px
    remaps: jnp.ndarray,  # (C, 2, H, W)
    sigma: float,
    model_size: int,
    heatmap_size: tuple[int, int],
    out_dtype: str = "float32",
    augment_cfg=None,
    rng: jax.Array | None = None,
    use_remap: bool = True,
):
    """[undistort ->] resize -> [augment] -> normalize + GT heatmap render on
    device. use_remap=False when the loader already undistorted on host (the
    default for full-resolution frames - see _RigGeometry.cv2_maps)."""
    B, H, W, _ = images_u8.shape

    def per_image(img, ci):
        f = img.astype(jnp.float32) / 255.0
        if use_remap:
            f = remap_bilinear(f, remaps[ci])
        return jax.image.resize(f, (model_size, model_size, 3), method="bilinear")

    out = jax.vmap(per_image)(images_u8, cam_idx)
    if augment_cfg is not None and rng is not None:
        from mvropose_tpu.data.augment import augment_batch

        out = augment_batch(rng, out, augment_cfg)
    out = ((out - IMAGENET_MEAN) / IMAGENET_STD).astype(jnp.dtype(out_dtype))

    Hm, Wm = heatmap_size
    scale = jnp.asarray([Wm / W, Hm / H], jnp.float32)
    kp_hm = keypoints_2d * scale
    heatmaps = render_heatmaps(kp_hm, Hm, Wm, sigma=sigma)
    return out, heatmaps


def make_device_preprocessor(
    geometry: _RigGeometry,
    model_size: int,
    heatmap_size: tuple[int, int],
    sigma: float,
    out_dtype: str = "float32",
    augment_cfg=None,
    undistort_on_device: bool = False,
):
    """Bind static tables; returns f(images_u8, cam_idx, keypoints_2d,
    rng=None) -> (model_images, gt_heatmaps). Works on (B, ...) and
    (B, V, ...) inputs (the view axis folds into batch). Augmentation (the
    kornia-style GPU batch aug of the reference) runs only when both
    augment_cfg and rng are given."""
    # Only materialize the remap tables when the device path will read them:
    # at 6x1080p they are ~100 MB of HBM pinned for the preprocessor's
    # lifetime, and the default path (host cv2.remap) never touches them.
    if undistort_on_device:
        remaps = jnp.asarray(geometry.remaps)
    else:
        remaps = jnp.zeros((len(geometry.camera_keys), 2, 1, 1), jnp.float32)

    def preprocess(images_u8, cam_idx, keypoints_2d, rng=None):
        lead = images_u8.shape[:-3]
        Bflat = int(np.prod(lead))
        imgs = images_u8.reshape(Bflat, *images_u8.shape[-3:])
        cidx = cam_idx.reshape(Bflat)
        kps = keypoints_2d.reshape(Bflat, *keypoints_2d.shape[-2:])
        out, hms = _device_preprocess(
            imgs, cidx, kps, remaps, sigma, model_size, heatmap_size, out_dtype,
            augment_cfg if rng is not None else None, rng,
            use_remap=undistort_on_device,
        )
        out = out.reshape(*lead, model_size, model_size, 3)
        hms = hms.reshape(*lead, *hms.shape[-3:])
        return out, hms

    return preprocess


class SingleViewDataset:
    """Synced rows -> fixed-shape host batches (images still uint8 raw).

    with_extrinsics=True adds per-sample (rvec, tvec, K, base_rotation)
    fields to every batch - the inputs of the differentiable FK-consistency
    loss (train/losses.py)."""

    def __init__(
        self,
        samples: Sequence[SingleViewSample],
        rig: RigSpec,
        image_hw: tuple[int, int],
        extr_key_fn=None,  # sample -> extrinsic key (multi-pose rigs)
        with_extrinsics: bool = False,
        undistort_on_host: bool = True,
    ):
        self.samples = list(samples)
        self.geometry = _RigGeometry(rig, image_hw)
        self.extr_key_fn = extr_key_fn
        self.with_extrinsics = with_extrinsics
        self.undistort_on_host = undistort_on_host
        # Datasets whose samples carry camera-frame 3D keypoints (DREAM)
        # emit them as batch["keypoints_3d_cam"] (J, 3) - the GT-pose-by-
        # alignment input for the eval pose metrics.
        self.has_kp3d = bool(self.samples) and all(
            s.keypoints_3d_cam is not None for s in self.samples
        )
        # Per-sample GT keypoints are a pure function of (angles, extrinsic)
        # - both static per sample - so FK+projection runs once per sample,
        # not once per sample PER EPOCH (even CPU-jitted, the per-call jit
        # dispatch is ~9 ms; x2000 samples x80 epochs was most of an epoch).
        # Keyed by sample object identity: train_val_split shallow-copies
        # the dataset, and the copies share sample objects but re-index
        # their own .samples lists.
        self._kp_cache: dict = {}

    def __len__(self) -> int:
        return len(self.samples)

    def batches(
        self, batch_size: int, shuffle: bool = False, seed: int = 0, drop_last: bool = False
    ) -> Iterator[dict]:
        n = len(self.samples)
        order = np.arange(n)
        if shuffle:
            np.random.default_rng(seed).shuffle(order)
        H, W = self.geometry.image_hw
        rig = self.geometry.rig
        J = rig.num_keypoints
        A = rig.robot.n_joints
        for start in range(0, n, batch_size):
            idxs = order[start : start + batch_size]
            if len(idxs) < batch_size and drop_last:
                break
            B = batch_size
            images = np.zeros((B, H, W, 3), np.uint8)
            cam_idx = np.zeros((B,), np.int32)
            angles = np.zeros((B, A), np.float32)
            kpts = np.zeros((B, J, 2), np.float32)
            weight = np.zeros((B,), np.float32)
            kp3d = np.zeros((B, J, 3), np.float32) if self.has_kp3d else None
            if self.with_extrinsics:
                rvecs = np.zeros((B, 3), np.float32)
                tvecs = np.zeros((B, 3), np.float32)
                tvecs[:, 2] = 1.0  # harmless default for padded slots
                Ks = np.tile(np.eye(3, dtype=np.float32), (B, 1, 1))
                base_rots = np.tile(np.eye(3, dtype=np.float32), (B, 1, 1))
            for slot, i in enumerate(idxs):
                s = self.samples[i]
                img = _load_image_rgb(s.image_path)
                if img is None:
                    continue  # weight stays 0 (reference: None-filter collate)
                ek = self.extr_key_fn(s) if self.extr_key_fn else None
                kp = self._kp_cache.get(id(s))
                if kp is None:
                    kp = self.geometry.gt_keypoints(s, ek)
                    self._kp_cache[id(s)] = kp
                prepared = _apply_roi_and_undistort(
                    self.geometry, s, img, kp, self.undistort_on_host
                )
                if prepared is None:
                    continue
                img, kp = prepared
                ci = self.geometry.key_to_idx[s.camera_key]
                images[slot] = img
                cam_idx[slot] = ci
                angles[slot] = s.angles
                kpts[slot] = kp
                if kp3d is not None:
                    kp3d[slot] = s.keypoints_3d_cam
                weight[slot] = 1.0
                if self.with_extrinsics:
                    extr = rig.extrinsics.get(ek or s.camera_key)
                    if extr is not None:
                        rvecs[slot] = extr.rvec
                        tvecs[slot] = extr.tvec
                    Ks[slot] = rig.calibs[s.camera_key].camera_matrix
                    base_rots[slot] = rig.robot.base_rotation(s.view)
            batch = {
                "images_u8": images,
                "cam_idx": cam_idx,
                "angles": angles,
                "keypoints_2d": kpts,
                "sample_weight": weight,
            }
            if self.with_extrinsics:
                batch.update(rvec=rvecs, tvec=tvecs, K=Ks, base_rotation=base_rots)
            if kp3d is not None:
                batch["keypoints_3d_cam"] = kp3d
            yield batch


class MultiViewDataset:
    """Grouped rows -> fixed-shape multi-view batches with view masks.

    with_extrinsics=True adds per-view (rvec, tvec, K) arrays - inputs for
    triangulation-based eval metrics and the FK-consistency loss."""

    def __init__(
        self,
        groups: Sequence[Mapping],
        rig: RigSpec,
        image_hw: tuple[int, int],
        max_views: int | None = None,
        pose_from_path=None,  # path -> pose name prefix for extrinsics
        angles_transform=None,  # raw group angles -> model angle vector
        with_extrinsics: bool = False,
        undistort_on_host: bool = True,
    ):
        self.groups = list(groups)
        self.geometry = _RigGeometry(rig, image_hw)
        self.max_views = max_views or rig.max_views
        self.pose_from_path = pose_from_path
        self.angles_transform = angles_transform
        self.with_extrinsics = with_extrinsics
        self.undistort_on_host = undistort_on_host
        # (id(group), view_pos) -> GT keypoints; deterministic per group
        # view, so FK+projection runs once, not once per epoch (see the
        # single-view cache note).
        self._kp_cache: dict = {}

    def __len__(self) -> int:
        return len(self.groups)

    def _resolve_view(self, path: str) -> dict | None:
        """path -> {image_path, camera_key, extr_key, view, serial, cam} or
        None when the filename/serial/calib/extrinsic doesn't resolve. The
        ONE copy of the path-sniffing logic - batches() and
        resolve_group_views() both consume it (they used to duplicate it
        inline and had already drifted in ordering)."""
        rig = self.geometry.rig
        parsed = _parse_serial_cam(path)
        if parsed is None:
            return None
        serial, cam = parsed
        view = rig.serial_to_view.get(serial)
        if view is None:
            return None
        ckey = f"{view}_{cam}"
        if ckey not in self.geometry.key_to_idx:
            return None
        pose = self.pose_from_path(path) if self.pose_from_path else None
        ekey = f"{pose}_{ckey}" if pose else ckey
        if ekey not in rig.extrinsics:
            if ckey in rig.extrinsics:
                ekey = ckey  # unprefixed summary fallback
            else:
                return None
        return {
            "image_path": path, "camera_key": ckey, "extr_key": ekey,
            "view": view, "serial": serial, "cam": cam,
        }

    def resolve_group_views(self, group: Mapping) -> list[dict]:
        """Resolve a group's views to (image_path, camera_key, extrinsic_key,
        view name) — the path-sniffing logic of batches(), exposed for
        visualization (the reference's visualize_samples_by_group_size,
        MvRoPose_FR3.py:633-728)."""
        out = []
        for vd in group["views"][: self.max_views]:
            rv = self._resolve_view(vd["image_path"])
            if rv is not None:
                out.append(rv)
        return out

    def batches(
        self, batch_size: int, shuffle: bool = False, seed: int = 0, drop_last: bool = False
    ) -> Iterator[dict]:
        n = len(self.groups)
        order = np.arange(n)
        if shuffle:
            np.random.default_rng(seed).shuffle(order)
        H, W = self.geometry.image_hw
        rig = self.geometry.rig
        V = self.max_views
        J = rig.num_keypoints
        A = rig.robot.n_joints
        for start in range(0, n, batch_size):
            idxs = order[start : start + batch_size]
            if len(idxs) < batch_size and drop_last:
                break
            B = batch_size
            images = np.zeros((B, V, H, W, 3), np.uint8)
            view_ids = np.zeros((B, V), np.int32)
            view_mask = np.zeros((B, V), bool)
            cam_idx = np.zeros((B, V), np.int32)
            angles = np.zeros((B, A), np.float32)
            kpts = np.zeros((B, V, J, 2), np.float32)
            weight = np.zeros((B,), np.float32)
            if self.with_extrinsics:
                rvecs = np.zeros((B, V, 3), np.float32)
                tvecs = np.zeros((B, V, 3), np.float32)
                tvecs[:, :, 2] = 1.0
                Ks = np.tile(np.eye(3, dtype=np.float32), (B, V, 1, 1))
                base_rots = np.tile(np.eye(3, dtype=np.float32), (B, V, 1, 1))
            for slot, i in enumerate(idxs):
                g = self.groups[i]
                raw_angles = np.asarray(g["joint_angles"], np.float32)
                if self.angles_transform:
                    raw_angles = self.angles_transform(raw_angles)
                angles[slot] = raw_angles[:A]
                any_view = False
                for v, vd in enumerate(g["views"][:V]):
                    # Resolve names/calib/extrinsics BEFORE the JPEG decode:
                    # rejecting an unresolvable view costs dict lookups, not
                    # a full-resolution image read.
                    rv = self._resolve_view(vd["image_path"])
                    if rv is None:
                        continue
                    img = _load_image_rgb(rv["image_path"])
                    if img is None or img.shape[:2] != (H, W):
                        continue
                    ckey, ekey, view = rv["camera_key"], rv["extr_key"], rv["view"]
                    sample = SingleViewSample(
                        image_path=rv["image_path"], camera_key=ckey, view=view,
                        angles=angles[slot],
                    )
                    if self.undistort_on_host:
                        img = self.geometry.undistort_host(
                            img, self.geometry.key_to_idx[ckey]
                        )
                    images[slot, v] = img
                    view_ids[slot, v] = rig.view_index(rv["serial"], rv["cam"])
                    cam_idx[slot, v] = self.geometry.key_to_idx[ckey]
                    kp = self._kp_cache.get((id(g), v))
                    if kp is None:
                        kp = self.geometry.gt_keypoints(sample, ekey)
                        self._kp_cache[(id(g), v)] = kp
                    kpts[slot, v] = kp
                    view_mask[slot, v] = True
                    any_view = True
                    if self.with_extrinsics:
                        extr = rig.extrinsics[ekey]
                        rvecs[slot, v] = extr.rvec
                        tvecs[slot, v] = extr.tvec
                        Ks[slot, v] = rig.calibs[ckey].camera_matrix
                        base_rots[slot, v] = rig.robot.base_rotation(view)
                weight[slot] = 1.0 if any_view else 0.0
            batch = {
                "images_u8": images,
                "view_ids": view_ids,
                "view_mask": view_mask,
                "cam_idx": cam_idx,
                "angles": angles,
                "keypoints_2d": kpts,
                "sample_weight": weight,
            }
            if self.with_extrinsics:
                batch.update(rvec=rvecs, tvec=tvecs, K=Ks, base_rotation=base_rots)
            yield batch

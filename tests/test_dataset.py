"""Dataset + device preprocessing on a synthetic rig.

The reference validated its data pipeline by eyeballing skeleton overlays
(visualization notebooks); here the same chain - calib -> FK -> projection ->
heatmap - is asserted numerically end to end.
"""

import json
import numpy as np
import pytest

import jax.numpy as jnp

from mvropose_tpu.calib.registry import CameraCalib, CameraExtrinsic, RigSpec
from mvropose_tpu.geometry.robots import get_robot
from mvropose_tpu.data.dataset import (
    SingleViewSample,
    SingleViewDataset,
    MultiViewDataset,
    make_device_preprocessor,
    _RigGeometry,
)
from mvropose_tpu.geometry.heatmap import argmax_decode

H, W = 60, 80
K = np.array([[70.0, 0, 40.0], [0, 70.0, 30.0], [0, 0, 1.0]])
DIST = np.zeros(5)


@pytest.fixture
def rig(tmp_path):
    robot = get_robot("meca500")
    calibs = {
        "front_leftcam": CameraCalib(K, DIST),
        "front_rightcam": CameraCalib(K, DIST),
    }
    extr = CameraExtrinsic(rvec=np.array([np.pi, 0.0, 0.0]), tvec=np.array([0.0, 0.1, 0.8]))
    return RigSpec(
        name="test",
        robot=robot,
        serial_to_view={"41182735": "front"},
        calibs=calibs,
        extrinsics={"front_leftcam": extr, "front_rightcam": extr},
        heatmap_size=(32, 32),
        sigma=2.0,
        max_views=4,
    )


def _write_img(path, seed=0):
    import cv2

    path.parent.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    cv2.imwrite(str(path), rng.integers(0, 255, size=(H, W, 3)).astype(np.uint8))


def test_single_view_batches_fixed_shape(tmp_path, rig):
    samples = []
    for i in range(5):
        p = tmp_path / f"zed_41182735_left_{1000 + i}.0.jpg"
        _write_img(p, i)
        samples.append(
            SingleViewSample(
                image_path=str(p),
                camera_key="front_leftcam",
                view="front",
                angles=np.array([10.0 * i, -20, 30, 0, 45, 0], np.float32),
            )
        )
    # One missing file -> weight 0 slot.
    samples.append(
        SingleViewSample(
            image_path=str(tmp_path / "missing.jpg"),
            camera_key="front_leftcam",
            view="front",
            angles=np.zeros(6, np.float32),
        )
    )
    ds = SingleViewDataset(samples, rig, (H, W))
    batches = list(ds.batches(batch_size=4))
    assert len(batches) == 2
    b0, b1 = batches
    assert b0["images_u8"].shape == (4, H, W, 3)
    assert b0["sample_weight"].tolist() == [1, 1, 1, 1]
    # Second batch: 1 real + 1 missing-file + 2 padding slots.
    assert b1["images_u8"].shape == (4, H, W, 3)
    assert b1["sample_weight"].tolist() == [1, 0, 0, 0]
    assert b0["keypoints_2d"].shape == (4, 7, 2)


def test_gt_keypoints_project_inside_image(rig):
    geo = _RigGeometry(rig, (H, W))
    s = SingleViewSample(
        image_path="x",
        camera_key="front_leftcam",
        view="front",
        angles=np.array([0.0, -30, 30, 0, 0, 0], np.float32),
    )
    kps = geo.gt_keypoints(s)
    assert kps.shape == (7, 2)
    assert np.isfinite(kps).all()
    # Base joint (origin) projects to the principal-point column (tvec x=0).
    base_px = kps[0]
    np.testing.assert_allclose(base_px[0], 40.0, atol=1.0)


def test_device_preprocessor_end_to_end(tmp_path, rig):
    samples = []
    for i in range(2):
        p = tmp_path / f"zed_41182735_left_{2000 + i}.0.jpg"
        _write_img(p, i)
        samples.append(
            SingleViewSample(
                image_path=str(p),
                camera_key="front_leftcam",
                view="front",
                angles=np.array([0.0, -30, 30, 0, 0, 0], np.float32),
            )
        )
    ds = SingleViewDataset(samples, rig, (H, W))
    batch = next(ds.batches(batch_size=2))
    pre = make_device_preprocessor(ds.geometry, model_size=64, heatmap_size=(32, 32), sigma=2.0)
    imgs, hms = pre(
        jnp.asarray(batch["images_u8"]),
        jnp.asarray(batch["cam_idx"]),
        jnp.asarray(batch["keypoints_2d"]),
    )
    assert imgs.shape == (2, 64, 64, 3)
    assert hms.shape == (2, 7, 32, 32)
    # Normalized images: roughly zero-mean for random input.
    assert abs(float(jnp.mean(imgs))) < 2.0
    # Heatmap argmax decodes back to the (scaled) GT keypoints.
    xy, _ = argmax_decode(hms, apply_sigmoid=False)
    want = batch["keypoints_2d"] * np.array([32 / W, 32 / H])
    got = np.asarray(xy)
    inside = (
        (want[..., 0] > 1) & (want[..., 0] < 31) & (want[..., 1] > 1) & (want[..., 1] < 31)
    )
    np.testing.assert_allclose(got[inside], want[inside], atol=0.51)


def test_multi_view_batches(tmp_path, rig):
    groups = []
    for g in range(3):
        views = []
        for side in ("left", "right"):
            p = tmp_path / f"zed_41182735_{side}_{3000 + g}.0.jpg"
            _write_img(p, g)
            views.append({"image_path": str(p)})
        groups.append(
            {"views": views, "joint_angles": [10.0 * g, -20, 30, 0, 45, 0], "timestamp": float(g)}
        )
    ds = MultiViewDataset(groups, rig, (H, W))
    batch = next(ds.batches(batch_size=3))
    assert batch["images_u8"].shape == (3, 4, H, W, 3)
    assert batch["view_mask"].sum() == 6  # 2 real views per group
    assert batch["view_mask"][:, :2].all() and not batch["view_mask"][:, 2:].any()
    assert batch["angles"].shape == (3, 6)
    # view_ids come from the static serial table, not discovery order.
    assert batch["view_ids"][0, 0] == rig.view_index("41182735", "leftcam")
    assert batch["view_ids"][0, 1] == rig.view_index("41182735", "rightcam")


def test_device_preprocessor_with_augmentation(tmp_path, rig):
    """Augmented preprocessing differs from clean but keeps GT heatmaps."""
    import jax

    from mvropose_tpu.data.augment import AugmentConfig

    p = tmp_path / "zed_41182735_left_4000.0.jpg"
    _write_img(p, 3)
    s = SingleViewSample(
        image_path=str(p), camera_key="front_leftcam", view="front",
        angles=np.array([0.0, -30, 30, 0, 0, 0], np.float32),
    )
    ds = SingleViewDataset([s], rig, (H, W))
    batch = next(ds.batches(batch_size=1))
    pre = make_device_preprocessor(
        ds.geometry, 64, (32, 32), 2.0, augment_cfg=AugmentConfig()
    )
    args = (
        jnp.asarray(batch["images_u8"]),
        jnp.asarray(batch["cam_idx"]),
        jnp.asarray(batch["keypoints_2d"]),
    )
    clean, hm_clean = pre(*args)
    aug, hm_aug = pre(*args, jax.random.PRNGKey(0))
    assert float(jnp.abs(aug - clean).max()) > 1e-3  # image changed
    np.testing.assert_array_equal(np.asarray(hm_clean), np.asarray(hm_aug))  # GT unchanged


def test_roi_crop_transforms_keypoints(tmp_path, rig):
    """ROI crop: keypoints land at the same relative location post-crop."""
    p = tmp_path / "zed_41182735_left_5000.0.jpg"
    _write_img(p, 5)
    base = SingleViewSample(
        image_path=str(p), camera_key="front_leftcam", view="front",
        angles=np.array([0.0, -30, 30, 0, 0, 0], np.float32),
    )
    geo = _RigGeometry(rig, (H, W))
    kp_full = geo.gt_keypoints(base)

    roi = (10, 5, 70, 55)  # x1, y1, x2, y2
    s = SingleViewSample(
        image_path=str(p), camera_key="front_leftcam", view="front",
        angles=base.angles, roi=roi,
    )
    ds = SingleViewDataset([s], rig, (H, W))
    batch = next(ds.batches(batch_size=1))
    assert batch["sample_weight"][0] == 1.0
    expect = (kp_full - [10, 5]) * [W / 60, H / 50]
    np.testing.assert_allclose(batch["keypoints_2d"][0], expect, atol=1e-4)


def test_roi_degenerate_box_skipped(tmp_path, rig):
    p = tmp_path / "zed_41182735_left_5001.0.jpg"
    _write_img(p)
    s = SingleViewSample(
        image_path=str(p), camera_key="front_leftcam", view="front",
        angles=np.zeros(6, np.float32), roi=(50, 40, 50, 40),
    )
    ds = SingleViewDataset([s], rig, (H, W))
    batch = next(ds.batches(batch_size=1))
    assert batch["sample_weight"][0] == 0.0


def test_grain_loader_batches(tmp_path, rig):
    """Grain pipeline yields the same fixed-shape schema, sharded + shuffled."""
    from mvropose_tpu.data.grain_loader import make_grain_loader

    samples = []
    for i in range(8):
        p = tmp_path / f"zed_41182735_left_{7000 + i}.0.jpg"
        _write_img(p, i)
        samples.append(
            SingleViewSample(
                image_path=str(p), camera_key="front_leftcam", view="front",
                angles=np.array([float(i), -20, 30, 0, 45, 0], np.float32),
            )
        )
    ds = SingleViewDataset(samples, rig, (H, W))
    batches = list(make_grain_loader(ds, batch_size=4, shuffle=True, seed=1))
    assert len(batches) == 2
    b = batches[0]
    assert b["images_u8"].shape == (4, H, W, 3)
    assert b["keypoints_2d"].shape == (4, 7, 2)
    assert b["sample_weight"].sum() == 4.0
    # Sharding: two shards partition the data.
    sh0 = list(make_grain_loader(ds, batch_size=4, shard_index=0, shard_count=2))
    sh1 = list(make_grain_loader(ds, batch_size=4, shard_index=1, shard_count=2))
    a0 = set(np.concatenate([s["angles"][:, 0] for s in sh0]).tolist())
    a1 = set(np.concatenate([s["angles"][:, 0] for s in sh1]).tolist())
    assert a0.isdisjoint(a1)
    assert len(a0 | a1) == 8


def test_grain_endless_stream_reshuffles_per_epoch(tmp_path, rig):
    """The endless stream cli train consumes (shuffle-before-repeat) must
    cover every sample each epoch AND draw a different permutation per epoch
    - grain derives a per-epoch seed; reordering repeat before shuffle would
    silently train every epoch in one fixed order."""
    from mvropose_tpu.data.grain_loader import make_grain_loader

    samples = []
    for i in range(8):
        p = tmp_path / f"zed_41182735_left_{7100 + i}.0.jpg"
        _write_img(p, i)
        samples.append(
            SingleViewSample(
                image_path=str(p), camera_key="front_leftcam", view="front",
                angles=np.array([float(i), -20, 30, 0, 45, 0], np.float32),
            )
        )
    ds = SingleViewDataset(samples, rig, (H, W))
    it = iter(make_grain_loader(ds, batch_size=4, shuffle=True, seed=3, num_epochs=None))
    epochs = []
    for _ in range(3):
        order = []
        for _ in range(2):  # 8 samples / batch 4
            order.extend(next(it)["angles"][:, 0].tolist())
        epochs.append(order)
    for e in epochs:
        assert sorted(e) == [float(i) for i in range(8)]  # full coverage
    assert epochs[0] != epochs[1] or epochs[1] != epochs[2]  # reshuffled


def test_grain_multiview_matches_direct_batches(tmp_path, rig):
    """The multi-view grain path (VERDICT r4 #2: the paper's main model was
    the one dataset still decoding serially) emits batches IDENTICAL to
    MultiViewDataset.batches - images, view_ids/view_mask, GT keypoints, and
    the with_extrinsics fields the geometric3d head consumes."""
    from mvropose_tpu.data.grain_loader import make_grain_loader

    groups = []
    for g in range(4):
        views = [{"image_path": "does_not_resolve.jpg"}]  # unresolvable slot
        for side in ("left", "right"):
            p = tmp_path / f"zed_41182735_{side}_{8000 + g}.0.jpg"
            _write_img(p, 10 + g)
            views.append({"image_path": str(p)})
        groups.append(
            {"views": views, "joint_angles": [10.0 * g, -20, 30, 0, 45, 0],
             "timestamp": float(g)}
        )
    ds = MultiViewDataset(groups, rig, (H, W), with_extrinsics=True)
    direct = next(ds.batches(batch_size=4))
    grain_b = next(iter(make_grain_loader(ds, batch_size=4)))
    for k in ("images_u8", "view_ids", "view_mask", "cam_idx", "angles",
              "keypoints_2d", "sample_weight", "rvec", "tvec", "K",
              "base_rotation"):
        np.testing.assert_array_equal(
            np.asarray(grain_b[k]), np.asarray(direct[k]), err_msg=k
        )
    # The unresolvable first slot stays masked in both (no compaction).
    assert not grain_b["view_mask"][:, 0].any()
    assert grain_b["view_mask"][:, 1:3].all()


def test_grain_single_view_extrinsics_fields(tmp_path, rig):
    """with_extrinsics single-view datasets (FK-consistency loss inputs) now
    route through grain too: rvec/tvec/K/base_rotation match the direct
    batches."""
    from mvropose_tpu.data.grain_loader import make_grain_loader

    samples = []
    for i in range(4):
        p = tmp_path / f"zed_41182735_left_{8100 + i}.0.jpg"
        _write_img(p, i)
        samples.append(
            SingleViewSample(
                image_path=str(p), camera_key="front_leftcam", view="front",
                angles=np.array([float(i), -20, 30, 0, 45, 0], np.float32),
            )
        )
    ds = SingleViewDataset(samples, rig, (H, W), with_extrinsics=True)
    direct = next(ds.batches(batch_size=4))
    grain_b = next(iter(make_grain_loader(ds, batch_size=4)))
    for k in ("images_u8", "keypoints_2d", "rvec", "tvec", "K", "base_rotation"):
        np.testing.assert_array_equal(
            np.asarray(grain_b[k]), np.asarray(direct[k]), err_msg=k
        )


def test_grain_resume_seed_changes_permutation(tmp_path, rig):
    """cli train seeds a checkpoint-resumed grain stream with
    seed + 1000003 * start_epoch (cli/main.py train_batches): the resumed
    epoch's permutation must differ from epoch 0's, so a resume does NOT
    silently replay epoch 0's sample order (VERDICT r4 #7)."""
    from mvropose_tpu.data.grain_loader import make_grain_loader

    samples = []
    for i in range(8):
        p = tmp_path / f"zed_41182735_left_{7200 + i}.0.jpg"
        _write_img(p, i)
        samples.append(
            SingleViewSample(
                image_path=str(p), camera_key="front_leftcam", view="front",
                angles=np.array([float(i), -20, 30, 0, 45, 0], np.float32),
            )
        )
    ds = SingleViewDataset(samples, rig, (H, W))

    def first_epoch_order(start_epoch):
        it = iter(
            make_grain_loader(
                ds, batch_size=4, shuffle=True,
                seed=7 + 1000003 * start_epoch, num_epochs=None,
            )
        )
        order = []
        for _ in range(2):
            order.extend(next(it)["angles"][:, 0].tolist())
        return order

    fresh = first_epoch_order(0)
    resumed = first_epoch_order(60)
    assert sorted(fresh) == sorted(resumed) == [float(i) for i in range(8)]
    assert fresh != resumed


def test_host_vs_device_undistortion_parity(tmp_path):
    """Host cv2.remap and the device gather remap agree on a distorted rig."""
    import cv2

    robot = get_robot("meca500")
    Kd = np.array([[70.0, 0, 40.0], [0, 70.0, 30.0], [0, 0, 1.0]])
    dist = np.array([-0.05, 0.02, 0.001, 0.001, 0.0])
    rig_d = RigSpec(
        name="dist", robot=robot, serial_to_view={"41182735": "front"},
        calibs={"front_leftcam": CameraCalib(Kd, dist)},
        extrinsics={"front_leftcam": CameraExtrinsic(np.array([np.pi, 0, 0.0]), np.array([0, 0.1, 0.8]))},
        heatmap_size=(32, 32), sigma=2.0,
    )
    p = tmp_path / "zed_41182735_left_8000.0.jpg"
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(H, W, 3)).astype(np.uint8)
    cv2.imwrite(str(p), cv2.GaussianBlur(img, (7, 7), 3))  # smooth => small interp diffs
    s = SingleViewSample(
        image_path=str(p), camera_key="front_leftcam", view="front",
        angles=np.array([0.0, -30, 30, 0, 0, 0], np.float32),
    )

    ds_host = SingleViewDataset([s], rig_d, (H, W), undistort_on_host=True)
    ds_dev = SingleViewDataset([s], rig_d, (H, W), undistort_on_host=False)
    b_host = next(ds_host.batches(1))
    b_dev = next(ds_dev.batches(1))
    pre_host = make_device_preprocessor(ds_host.geometry, 64, (32, 32), 2.0)
    pre_dev = make_device_preprocessor(
        ds_dev.geometry, 64, (32, 32), 2.0, undistort_on_device=True
    )
    out_h, hm_h = pre_host(
        jnp.asarray(b_host["images_u8"]), jnp.asarray(b_host["cam_idx"]),
        jnp.asarray(b_host["keypoints_2d"]),
    )
    out_d, hm_d = pre_dev(
        jnp.asarray(b_dev["images_u8"]), jnp.asarray(b_dev["cam_idx"]),
        jnp.asarray(b_dev["keypoints_2d"]),
    )
    # Interpolation-order differences only (both bilinear, different order of
    # remap+resize rounding); compare away from the border.
    diff = np.abs(np.asarray(out_h) - np.asarray(out_d))[:, 4:-4, 4:-4]
    assert np.median(diff) < 0.02, float(np.median(diff))
    np.testing.assert_array_equal(np.asarray(hm_h), np.asarray(hm_d))


def test_roi_out_of_range_box_clamped_or_skipped(tmp_path, rig):
    """An ROI box extending past the image must be CLAMPED before both the
    crop and the keypoint rescale (numpy slicing silently clips, so the old
    code cropped one region while rescaling keypoints for another - labels
    ~40% off at full weight), and a fully out-of-frame or negative box must
    drop the sample, not wrap around via negative slicing."""
    p = tmp_path / "zed_41182735_left_6000.0.jpg"
    _write_img(p, 6)
    base = SingleViewSample(
        image_path=str(p), camera_key="front_leftcam", view="front",
        angles=np.array([0.0, -30, 30, 0, 0, 0], np.float32),
    )
    geo = _RigGeometry(rig, (H, W))
    kp_full = geo.gt_keypoints(base)

    # Box extends past the right/bottom edges -> clamps to (10,5)-(W,H).
    s = SingleViewSample(
        image_path=str(p), camera_key="front_leftcam", view="front",
        angles=base.angles, roi=(10, 5, W + 50, H + 40),
    )
    ds = SingleViewDataset([s], rig, (H, W))
    batch = next(ds.batches(batch_size=1))
    assert batch["sample_weight"][0] == 1.0
    expect = (kp_full - [10, 5]) * [W / (W - 10), H / (H - 5)]
    np.testing.assert_allclose(batch["keypoints_2d"][0], expect, atol=1e-4)

    # Entirely out of frame -> weight 0 (old behavior: negative wrap crop).
    for roi in ((W + 10, 5, W + 50, 40), (-50, -40, -10, -5)):
        s2 = SingleViewSample(
            image_path=str(p), camera_key="front_leftcam", view="front",
            angles=base.angles, roi=roi,
        )
        b2 = next(SingleViewDataset([s2], rig, (H, W)).batches(batch_size=1))
        assert b2["sample_weight"][0] == 0.0, roi


def test_grain_loader_matches_direct_batches_with_distortion_and_roi(tmp_path):
    """The grain path must be geometrically IDENTICAL to
    SingleViewDataset.batches: same host undistortion, same (clamped) ROI
    crop, same keypoints. The old _SampleMap skipped undistortion entirely
    (labels shifted by the lens distortion) and never applied ROI (every
    ROI sample silently became a weight-0 zero batch)."""
    from mvropose_tpu.data.grain_loader import make_grain_loader

    robot = get_robot("meca500")
    dist = np.array([0.3, -0.1, 0.001, 0.001, 0.0])  # real lens distortion
    extr = CameraExtrinsic(rvec=np.array([np.pi, 0.0, 0.0]), tvec=np.array([0.0, 0.1, 0.8]))
    rig_d = RigSpec(
        name="dist", robot=robot, serial_to_view={"41182735": "front"},
        calibs={"front_leftcam": CameraCalib(K, dist)},
        extrinsics={"front_leftcam": extr},
        heatmap_size=(32, 32), sigma=2.0, max_views=2,
    )
    samples = []
    for i, roi in enumerate([None, (10, 5, 70, 55), (20, 10, W + 30, H + 20)]):
        p = tmp_path / f"zed_41182735_left_{8000 + i}.0.jpg"
        _write_img(p, 80 + i)
        samples.append(SingleViewSample(
            image_path=str(p), camera_key="front_leftcam", view="front",
            angles=np.array([10.0 * i, -20, 30, 0, 45, 0], np.float32), roi=roi,
        ))
    ds = SingleViewDataset(samples, rig_d, (H, W))
    direct = next(ds.batches(batch_size=3))
    grain_b = next(iter(make_grain_loader(ds, batch_size=3)))
    assert direct["sample_weight"].tolist() == grain_b["sample_weight"].tolist() == [1.0] * 3
    np.testing.assert_array_equal(direct["images_u8"], grain_b["images_u8"])
    np.testing.assert_allclose(direct["keypoints_2d"], grain_b["keypoints_2d"], atol=1e-5)


def test_grain_loader_num_epochs_none_repeats_forever(tmp_path, rig):
    from mvropose_tpu.data.grain_loader import make_grain_loader

    p = tmp_path / "zed_41182735_left_9000.0.jpg"
    _write_img(p, 9)
    samples = [SingleViewSample(
        image_path=str(p), camera_key="front_leftcam", view="front",
        angles=np.zeros(6, np.float32),
    )] * 4
    ds = SingleViewDataset(samples, rig, (H, W))
    it = iter(make_grain_loader(ds, batch_size=2, num_epochs=None))
    # 4 samples / batch 2 = 2 batches per epoch; draw well past one epoch.
    for _ in range(7):
        b = next(it)  # must never StopIteration
    assert b["images_u8"].shape[0] == 2

    # with_extrinsics joined the grain schema in r5 (it used to refuse):
    # the loader must now emit the FK-loss fields.
    ds.with_extrinsics = True
    b = next(iter(make_grain_loader(ds, batch_size=2)))
    for k in ("rvec", "tvec", "K", "base_rotation"):
        assert k in b, k


def test_multiview_malformed_filename_skipped(tmp_path, rig):
    """A stray file that doesn't follow zed_<serial>_<side>_<ts>.jpg must be
    skipped (the data layer's policy), not IndexError the whole run."""
    good = tmp_path / "zed_41182735_left_1000.0.jpg"
    _write_img(good, 1)
    stray = tmp_path / "stray.jpg"
    _write_img(stray, 2)
    groups = [{
        "joint_angles": np.zeros(6, np.float32),
        "views": [{"image_path": str(stray)}, {"image_path": str(good)}],
    }]
    ds = MultiViewDataset(groups, rig, (H, W))
    batch = next(ds.batches(batch_size=1))
    assert batch["view_mask"][0].tolist() == [False, True, False, False]
    assert batch["sample_weight"][0] == 1.0

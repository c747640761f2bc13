"""Train loop: loss decreases, two-group optimizer works, DP sharding runs
on the fake 8-device mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvropose_tpu.models import EstimatorConfig, SingleViewPoseEstimator, MultiViewPoseEstimator
from mvropose_tpu.models.vit import VIT_TINY_TEST
from mvropose_tpu.geometry.heatmap import render_heatmaps
from mvropose_tpu.parallel import make_mesh, shard_batch
from mvropose_tpu.train import (
    TrainConfig,
    create_train_state,
    make_single_view_train_step,
    make_multi_view_train_step,
    make_eval_step,
    pck_at_k,
    add_metric,
)

TINY = EstimatorConfig(
    vit=VIT_TINY_TEST,
    num_joints=4,
    num_angles=3,
    heatmap_size=(32, 32),
    max_views=4,
    num_fusion_queries=4,
    num_angle_queries=2,
    dtype="float32",
)


def make_sv_batch(rng, B=8):
    kps = rng.uniform(4, 28, size=(B, 4, 2)).astype(np.float32)
    return {
        "images": jnp.asarray(rng.normal(size=(B, 64, 64, 3)).astype(np.float32)),
        "heatmaps": render_heatmaps(jnp.asarray(kps), 32, 32, sigma=2.0),
        "angles": jnp.asarray(rng.uniform(-1, 1, size=(B, 3)).astype(np.float32)),
    }


def test_single_view_training_reduces_loss(rng):
    model = SingleViewPoseEstimator(TINY)
    batch = make_sv_batch(rng)
    variables = model.init(jax.random.PRNGKey(0), batch["images"][:1])
    cfg = TrainConfig(num_epochs=1, steps_per_epoch=50, lr_kpt=1e-3, lr_ang=1e-3,
                      loss_weight_kpt=100.0)
    state = create_train_state(model, variables, cfg)
    step = make_single_view_train_step(cfg)

    losses = []
    for i in range(30):
        state, m = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.7, losses[::10]


def test_frozen_backbone_params_unchanged(rng):
    model = SingleViewPoseEstimator(TINY)
    batch = make_sv_batch(rng, B=4)
    variables = model.init(jax.random.PRNGKey(0), batch["images"][:1])
    cfg = TrainConfig(num_epochs=1, steps_per_epoch=10)
    state = create_train_state(model, variables, cfg)
    # Snapshot to host BEFORE stepping: donate_argnums invalidates the
    # original device buffers.
    before = jax.tree_util.tree_map(np.asarray, state.params["backbone"])
    init_kpt = jax.tree_util.tree_map(np.asarray, state.params["keypoint_head"])
    step = make_single_view_train_step(cfg)
    for i in range(3):
        state, _ = step(state, batch, jax.random.PRNGKey(i))
    after = state.params["backbone"]
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(a, np.asarray(b)), before, after
    )
    # And the trainable heads did move.
    moved = jax.tree_util.tree_map(np.asarray, state.params["keypoint_head"])
    diffs = jax.tree_util.tree_map(lambda a, b: float(np.abs(a - b).max()), moved, init_kpt)
    assert max(jax.tree_util.tree_leaves(diffs)) > 0


@pytest.mark.slow
def test_multi_view_train_step_on_mesh(rng):
    """Full DP train step over the fake 8-device mesh."""
    mesh = make_mesh(n_data=8)
    model = MultiViewPoseEstimator(TINY)
    B, V = 8, 3
    kps = rng.uniform(4, 28, size=(B, V, 4, 2)).astype(np.float32)
    batch = {
        "images": jnp.asarray(rng.normal(size=(B, V, 64, 64, 3)).astype(np.float32)),
        "view_ids": jnp.tile(jnp.arange(V, dtype=jnp.int32), (B, 1)),
        "view_mask": jnp.asarray(rng.uniform(size=(B, V)) > 0.2),
        "heatmaps": render_heatmaps(jnp.asarray(kps), 32, 32, sigma=2.0),
        "angles": jnp.asarray(rng.uniform(-1, 1, size=(B, 3)).astype(np.float32)),
    }
    variables = model.init(
        jax.random.PRNGKey(0), batch["images"][:1], batch["view_ids"][:1], batch["view_mask"][:1]
    )
    cfg = TrainConfig(num_epochs=1, steps_per_epoch=10, lr_kpt=1e-3, lr_ang=1e-3)
    state = create_train_state(model, variables, cfg)
    step = make_multi_view_train_step(cfg, mesh)

    with mesh:
        sharded = shard_batch(mesh, batch)
        losses = []
        for i in range(8):
            state, m = step(state, sharded, jax.random.PRNGKey(i))
            losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


@pytest.mark.slow
def test_sharded_equals_unsharded(rng):
    """DP over 8 devices computes the same update as single-device."""
    model = SingleViewPoseEstimator(TINY)
    batch = make_sv_batch(rng, B=8)
    variables = model.init(jax.random.PRNGKey(0), batch["images"][:1])
    cfg = TrainConfig(num_epochs=1, steps_per_epoch=10)

    # Deep-copy per state: donation would otherwise invalidate the shared
    # init buffers.
    copy = lambda t: jax.tree_util.tree_map(jnp.array, t)

    state1 = create_train_state(model, copy(variables), cfg)
    step1 = make_single_view_train_step(cfg)
    state1, m1 = step1(state1, batch, jax.random.PRNGKey(0))

    mesh = make_mesh(n_data=8)
    state2 = create_train_state(model, copy(variables), cfg)
    step2 = make_single_view_train_step(cfg, mesh)
    with mesh:
        state2, m2 = step2(state2, shard_batch(mesh, batch), jax.random.PRNGKey(0))

    assert abs(float(m1["loss"]) - float(m2["loss"])) < 2e-3  # fp32 reduction order
    l1 = jax.tree_util.tree_leaves(state1.params["keypoint_head"])
    l2 = jax.tree_util.tree_leaves(state2.params["keypoint_head"])
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


def test_eval_step_and_metrics(rng):
    model = SingleViewPoseEstimator(TINY)
    batch = make_sv_batch(rng, B=4)
    variables = model.init(jax.random.PRNGKey(0), batch["images"][:1])
    cfg = TrainConfig()
    state = create_train_state(model, variables, cfg)
    ev = make_eval_step(cfg, multi_view=False)
    out = ev(state, batch)
    assert np.isfinite(float(out["loss"]))
    assert out["pred_heatmaps"].shape == batch["heatmaps"].shape

    pck = float(pck_at_k(jnp.zeros((4, 4, 2)), jnp.ones((4, 4, 2)) * 3.0, k_px=5.0))
    assert pck == 1.0
    add = float(add_metric(jnp.zeros((2, 4, 3)), jnp.ones((2, 4, 3))))
    assert abs(add - np.sqrt(3)) < 1e-5


def test_angle_metrics_ignore_weight0_samples():
    """Failed image loads produce weight-0 batch slots whose model outputs
    are garbage; the angle-space metrics must exclude them (the bug: eval
    averaged MAE/ADD/AUC over ALL slots, so one dead slot corrupted every
    reported number)."""
    from mvropose_tpu.train.metrics import angle_mae, add_auc

    gt = jnp.zeros((3, 5))
    pred = jnp.stack([jnp.zeros(5), jnp.zeros(5), jnp.full(5, 100.0)])  # slot 2 garbage
    w = jnp.array([1.0, 1.0, 0.0])
    assert float(angle_mae(pred, gt, valid=w)) == 0.0
    assert float(angle_mae(pred, gt)) > 30.0  # unweighted would be corrupted

    gt3 = jnp.zeros((3, 4, 3))
    pred3 = gt3.at[2].add(100.0)  # slot 2: 100 m off, every threshold fails
    assert float(add_metric(pred3, gt3, valid=w[:, None])) == 0.0
    auc_w = float(add_auc(pred3, gt3, valid=w))
    assert auc_w > 0.99  # valid slots are exact -> full area
    assert float(add_auc(pred3, gt3)) < 0.7  # unweighted drags the curve down


def test_pass_rate_auc_counts_failed_frames():
    """The DREAM protocol scores ALL frames: a PnP failure enters the
    pass-rate curve as inf (never passes), it does not drop out. The bug:
    eval filtered PnP-ADD by success before pass@10cm/AUC, so the headline
    was conditional on convergence and overstated whenever success < 1
    (committed instance: occlusion probe, success 0.763, conditional pass
    0.42 vs the all-frames ~0.32)."""
    from mvropose_tpu.train.metrics import add_auc, pass_rate_auc

    exact = jnp.zeros(4)
    assert float(pass_rate_auc(exact)) > 0.99
    # One failed frame out of four caps the curve at 0.75 everywhere.
    one_fail = jnp.array([0.0, 0.0, 0.0, jnp.inf])
    auc = float(pass_rate_auc(one_fail))
    assert 0.70 < auc <= 0.7501
    # Shared definition: add_auc on per-sample distances == pass_rate_auc.
    d = jnp.array([0.0, 0.05, 0.2])
    pred3 = jnp.zeros((3, 2, 3)).at[:, :, 0].set(d[:, None])
    gt3 = jnp.zeros((3, 2, 3))
    np.testing.assert_allclose(
        float(add_auc(pred3, gt3)), float(pass_rate_auc(d)), rtol=1e-6
    )


def test_solve_rig_pnp_matches_recover_pose_batch():
    """solve_rig_pnp (decode-free core, used by eval to solve PnP twice per
    frame from one decode) must agree exactly with recover_pose_batch's
    decode+solve on the same heatmaps."""
    from mvropose_tpu.decode import decode_keypoints
    from mvropose_tpu.geometry.camera import project_points
    from mvropose_tpu.geometry.heatmap import render_heatmaps
    from mvropose_tpu.geometry.robots import MECA500, forward_kinematics
    from mvropose_tpu.pose import recover_pose_batch, solve_rig_pnp

    hw = (120, 160)
    angles = jnp.array([10.0, -20.0, 30.0, 5.0, -15.0, 25.0])
    base = jnp.eye(3)[None]
    K = jnp.array([[[150.0, 0, 80.0], [0, 150.0, 60.0], [0, 0, 1.0]]])
    pts = MECA500.keypoints_from_fk(forward_kinematics(MECA500, angles))
    rvec, tvec = jnp.array([0.2, -0.1, 0.05]), jnp.array([0.05, -0.02, 0.6])
    xy_img = project_points(pts, rvec, tvec, K[0], None)
    hm_xy = xy_img * jnp.array([64.0 / hw[1], 64.0 / hw[0]])
    hm = render_heatmaps(hm_xy[None], 64, 64, sigma=2.0) * 8.0 - 4.0

    key = jax.random.PRNGKey(3)
    ref = recover_pose_batch(
        hm, angles, base, K, MECA500, hw, key=key, decode_mode="refine"
    )
    xy, conf = decode_keypoints(hm, image_hw=hw, mode="refine")
    out = solve_rig_pnp(xy, conf, angles, base, K, MECA500, key=key)
    for k in ("rvec", "tvec", "success", "n_inliers"):
        np.testing.assert_array_equal(np.asarray(ref[k]), np.asarray(out[k]))
    assert bool(out["success"][0])


@pytest.mark.slow
def test_fk_consistency_loss_trains(rng):
    """FK-consistency: projected FK(pred angles) pulled toward GT 2D points.

    With kpt/ang losses off-weighted, the FK term alone must reduce."""
    from mvropose_tpu.geometry.robots import MECA500, forward_kinematics_batch
    from mvropose_tpu.geometry.camera import project_points

    import dataclasses

    cfg_est = dataclasses.replace(TINY, num_angles=6)
    model = SingleViewPoseEstimator(cfg_est)
    B = 4
    gt_angles = rng.uniform(-30, 30, size=(B, 6)).astype(np.float32)
    rvec = np.tile(np.array([np.pi, 0, 0], np.float32), (B, 1))
    tvec = np.tile(np.array([0.0, 0.1, 0.8], np.float32), (B, 1))
    K = np.tile(np.array([[70.0, 0, 40], [0, 70.0, 30], [0, 0, 1]], np.float32), (B, 1, 1))
    base = np.tile(np.eye(3, dtype=np.float32), (B, 1, 1))
    pts = forward_kinematics_batch(MECA500, jnp.asarray(gt_angles))
    kps = jax.vmap(lambda p, r, t, k: project_points(p, r, t, k, None))(
        pts, jnp.asarray(rvec), jnp.asarray(tvec), jnp.asarray(K)
    )
    batch = {
        "images": jnp.asarray(rng.normal(size=(B, 64, 64, 3)).astype(np.float32)),
        "heatmaps": render_heatmaps(jnp.asarray(rng.uniform(4, 28, size=(B, 4, 2)).astype(np.float32)), 32, 32, sigma=2.0),
        "angles": jnp.asarray(gt_angles),
        "keypoints_2d": jnp.asarray(np.asarray(kps)),
        "rvec": jnp.asarray(rvec),
        "tvec": jnp.asarray(tvec),
        "K": jnp.asarray(K),
        "base_rotation": jnp.asarray(base),
        "sample_weight": jnp.ones((B,)),
    }
    variables = model.init(jax.random.PRNGKey(0), batch["images"][:1])
    cfg = TrainConfig(
        num_epochs=1, steps_per_epoch=40, lr_kpt=1e-8, lr_ang=2e-3,
        loss_weight_kpt=0.0, loss_weight_fk=1e-3,
    )
    state = create_train_state(model, variables, cfg)
    step = make_single_view_train_step(cfg, robot=MECA500)
    fks = []
    for i in range(25):
        state, m = step(state, batch, jax.random.PRNGKey(i))
        fks.append(float(m["loss_fk"]))
    assert np.isfinite(fks).all()
    assert fks[-1] < fks[0] * 0.9, fks[::8]


@pytest.mark.slow
def test_fit_resume_replicates_on_mesh(rng, tmp_path):
    """fit() resume on a multi-device mesh: restored state must compose with
    sharded batches (orbax commits restored arrays to one device)."""
    from mvropose_tpu.parallel import make_mesh, shard_batch
    from mvropose_tpu.train.loop import fit

    mesh = make_mesh(n_data=8)
    model = SingleViewPoseEstimator(TINY)
    batch = make_sv_batch(rng, B=8)
    variables = model.init(jax.random.PRNGKey(0), batch["images"][:1])
    cfg = TrainConfig(num_epochs=2, steps_per_epoch=1)
    state = create_train_state(model, variables, cfg)
    step = make_single_view_train_step(cfg, mesh)
    from mvropose_tpu.train import make_eval_step

    ev = make_eval_step(cfg, multi_view=False, mesh=mesh)

    with mesh:
        sharded = shard_batch(mesh, batch)
        mk_train = lambda epoch: iter([sharded])
        mk_val = lambda: iter([sharded])
        r1 = fit(state, step, ev, mk_train, mk_val, cfg, tmp_path / "w", mesh=mesh)
        assert r1.epochs_run == 2
        # Second fit resumes from the checkpoint (epoch 2 of 2 -> no-op) and
        # must not crash on device placement.
        fresh = create_train_state(model, model.init(jax.random.PRNGKey(1), batch["images"][:1]), cfg)
        r2 = fit(fresh, step, ev, mk_train, mk_val, cfg, tmp_path / "w", mesh=mesh)
        assert r2.epochs_run == 0
        assert r2.best_val_loss <= r1.best_val_loss

        # And resuming mid-training continues stepping on the mesh.
        cfg3 = TrainConfig(num_epochs=3, steps_per_epoch=1)
        fresh3 = create_train_state(model, model.init(jax.random.PRNGKey(2), batch["images"][:1]), cfg3)
        step3 = make_single_view_train_step(cfg3, mesh)
        ev3 = make_eval_step(cfg3, multi_view=False, mesh=mesh)
        r3 = fit(fresh3, step3, ev3, mk_train, mk_val, cfg3, tmp_path / "w", mesh=mesh)
        assert r3.epochs_run == 1  # epochs 2 -> 3


@pytest.mark.slow
@pytest.mark.parametrize("n_data,n_model", [(8, 1), (4, 2), (2, 4), (1, 8)])
def test_multiview_mesh_shapes_equal_unsharded(rng, n_data, n_model):
    """Every (data x model) mesh factorization computes the same multi-view
    update as single-device: sharding (batch over 'data', camera views over
    'model' / sequence parallelism) is layout, never semantics."""
    import dataclasses as _dc

    model = MultiViewPoseEstimator(_dc.replace(TINY, max_views=8))
    B, V = 8, 8  # divisible by every swept axis width
    kps = rng.uniform(4, 28, size=(B, V, 4, 2)).astype(np.float32)
    batch = {
        "images": jnp.asarray(rng.normal(size=(B, V, 64, 64, 3)).astype(np.float32)),
        "view_ids": jnp.tile(jnp.arange(V, dtype=jnp.int32), (B, 1)),
        "view_mask": jnp.asarray(rng.uniform(size=(B, V)) > 0.2),
        "heatmaps": render_heatmaps(jnp.asarray(kps), 32, 32, sigma=2.0),
        "angles": jnp.asarray(rng.uniform(-1, 1, size=(B, 3)).astype(np.float32)),
    }
    variables = model.init(
        jax.random.PRNGKey(0), batch["images"][:1], batch["view_ids"][:1], batch["view_mask"][:1]
    )
    cfg = TrainConfig(num_epochs=1, steps_per_epoch=10)
    copy = lambda t: jax.tree_util.tree_map(jnp.array, t)

    ref_state = create_train_state(model, copy(variables), cfg)
    ref_state, m_ref = make_multi_view_train_step(cfg)(ref_state, batch, jax.random.PRNGKey(0))

    mesh = make_mesh(n_data=n_data, n_model=n_model)
    state = create_train_state(model, copy(variables), cfg)
    step = make_multi_view_train_step(cfg, mesh)
    with mesh:
        state, m = step(state, shard_batch(mesh, batch), jax.random.PRNGKey(0))

    assert abs(float(m_ref["loss"]) - float(m["loss"])) < 2e-3
    for a, b in zip(
        jax.tree_util.tree_leaves(ref_state.params["fusion_module"]),
        jax.tree_util.tree_leaves(state.params["fusion_module"]),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


def test_eval_step_masks_padded_slots(rng):
    """val loss must exclude weight-0 padded slots (zero image, garbage GT):
    the old eval_step averaged them at full weight, biasing best-model
    selection whenever len(val) % batch_size != 0."""
    model = SingleViewPoseEstimator(TINY)
    batch = make_sv_batch(rng, B=4)
    variables = model.init(jax.random.PRNGKey(0), batch["images"][:1])
    cfg = TrainConfig()
    state = create_train_state(model, variables, cfg)
    ev = make_eval_step(cfg, multi_view=False)

    full = dict(batch)
    full["sample_weight"] = jnp.ones((4,))
    clean = ev(state, full)

    # Corrupt slot 3's GT wildly and zero its weight: the loss must not move.
    dirty = dict(full)
    dirty["heatmaps"] = full["heatmaps"].at[3].add(100.0)
    dirty["angles"] = full["angles"].at[3].add(1000.0)
    dirty["images"] = full["images"].at[3].set(0.0)
    dirty["sample_weight"] = jnp.array([1.0, 1.0, 1.0, 0.0])
    masked = ev(state, dirty)
    # Equal to evaluating the 3 valid slots alone.
    ref = ev(state, {k: v[:3] for k, v in full.items()})
    np.testing.assert_allclose(float(masked["loss"]), float(ref["loss"]), rtol=1e-5)
    assert abs(float(masked["loss"]) - float(clean["loss"])) < 1e3  # sanity
    assert float(dirty["heatmaps"][3].max()) > 50  # corruption was real


def test_multiview_angle_loss_masks_empty_groups(rng):
    """Padded tail groups (all views masked, zero angles) must contribute
    zero angle gradient: the old step trained the angle head toward
    predicting 0 from blank input on every partial batch."""
    model = MultiViewPoseEstimator(TINY)
    B, V = 4, 2
    kps = rng.uniform(4, 28, size=(B, V, 4, 2)).astype(np.float32)
    batch = {
        "images": jnp.asarray(rng.normal(size=(B, V, 64, 64, 3)).astype(np.float32)),
        "view_ids": jnp.tile(jnp.arange(V, dtype=jnp.int32), (B, 1)),
        "view_mask": jnp.ones((B, V), bool),
        "heatmaps": render_heatmaps(jnp.asarray(kps), 32, 32, sigma=2.0),
        "angles": jnp.asarray(rng.uniform(-1, 1, size=(B, 3)).astype(np.float32)),
    }
    variables = model.init(
        jax.random.PRNGKey(0), batch["images"][:1], batch["view_ids"][:1],
        batch["view_mask"][:1],
    )
    cfg = TrainConfig()
    state = create_train_state(model, variables, cfg)
    ev = make_eval_step(cfg, multi_view=True)

    full = dict(batch)
    full["view_mask"] = jnp.ones((4, 2), bool)
    # Empty group 3 with garbage angles: loss must equal the 3-group eval.
    dirty = dict(full)
    dirty["view_mask"] = full["view_mask"].at[3].set(False)
    dirty["angles"] = full["angles"].at[3].add(1000.0)
    masked = ev(state, dirty)
    ref = ev(state, {k: v[:3] for k, v in full.items()})
    np.testing.assert_allclose(
        float(masked["loss_ang"]), float(ref["loss_ang"]), rtol=1e-5
    )


def test_label_params_rejects_unknown_module():
    """A new/renamed top-level module must be assigned to an optimizer group
    explicitly - the old catch-all silently trained it under the kpt LR."""
    from mvropose_tpu.train.state import _label_params

    params = {"backbone": {"w": jnp.zeros(3)}, "mystery_head": {"w": jnp.zeros(3)}}
    with pytest.raises(ValueError, match="mystery_head"):
        _label_params(params)


def test_fk_loss_missing_fields_is_hard_error(rng):
    """--fk-loss-weight must never silently no-op when the batch lacks the
    extrinsic fields (the user explicitly enabled the loss)."""
    from mvropose_tpu.geometry.robots import MECA500

    model = SingleViewPoseEstimator(TINY)
    batch = make_sv_batch(rng, B=2)
    variables = model.init(jax.random.PRNGKey(0), batch["images"][:1])
    cfg = TrainConfig(loss_weight_fk=0.1)
    state = create_train_state(model, variables, cfg)
    step = make_single_view_train_step(cfg, robot=MECA500)
    with pytest.raises(ValueError, match="lacks"):
        step(state, batch, jax.random.PRNGKey(1))


def test_make_mesh_rejects_indivisible_model_axis():
    """8 devices / n_model=3 used to build a silent 2x3 mesh leaving two
    devices idle; the default path must refuse instead."""
    from mvropose_tpu.parallel import make_mesh

    with pytest.raises(ValueError, match="idle"):
        make_mesh(n_model=3)
    m = make_mesh(n_data=2, n_model=3)  # explicit partial mesh is allowed
    assert m.shape == {"data": 2, "model": 3}

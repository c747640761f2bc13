"""Convergence regression: the full train stack must LEARN, not just step.

Counterpart of the committed TPU runs in runs/synth_sv / runs/synth_mv (see
scripts/train_synthetic.py): trains the tiny single-view estimator on
framework-rendered synthetic data (FK -> projection -> colored blobs) until
held-out PCK@5px(image space) clears 0.9. Any frame/unit/indexing bug in FK,
projection, heatmap GT, the model, the loss, the optimizer grouping, decode,
or the metric itself caps PCK far below that - this is the one test that
exercises the whole learning loop end to end.

Marked slow: ~500 train steps of a 0.9M-param model on CPU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvropose_tpu.data.synthetic import (
    joint_palette,
    make_rig,
    rig_tuple,
    single_view_batch,
    synthesize_multiview_batch,
)
from mvropose_tpu.geometry.heatmap import argmax_decode
from mvropose_tpu.geometry.robots import get_robot
from mvropose_tpu.models import EstimatorConfig, SingleViewPoseEstimator
from mvropose_tpu.models.vit import ViTConfig
from mvropose_tpu.train import (
    TrainConfig,
    create_train_state,
    make_single_view_train_step,
    pck_at_k,
)

IMG, HM = 64, 32


def _make_batch(robot, rig_arrs, key, batch):
    mv = synthesize_multiview_batch(
        robot, rig_arrs, key, batch, image_hw=(IMG, IMG), heatmap_hw=(HM, HM),
        heatmap_sigma=1.5,
    )
    return single_view_batch(mv)


def test_synthetic_keypoints_in_frame():
    """Sanity (fast): the synthetic rig keeps all keypoints inside the image
    across the sampled joint range, so the convergence task is well-posed."""
    robot = get_robot("fr5")
    rig = make_rig(n_views=3, image_hw=(IMG, IMG))
    b = synthesize_multiview_batch(
        robot, rig_tuple(rig), jax.random.PRNGKey(3), 64,
        image_hw=(IMG, IMG), heatmap_hw=(HM, HM),
    )
    kp = np.asarray(b["keypoints_2d"])
    assert kp[..., 0].min() > 0 and kp[..., 0].max() < IMG
    assert kp[..., 1].min() > 0 and kp[..., 1].max() < IMG
    # Distinct palette: no two joints share a color (identity is learnable).
    pal = joint_palette(robot.n_keypoints)
    assert len({tuple(np.round(c, 3)) for c in pal}) == robot.n_keypoints


@pytest.mark.slow
def test_single_view_synthetic_convergence():
    robot = get_robot("fr5")
    rig = make_rig(n_views=1, image_hw=(IMG, IMG))
    rig_arrs = rig_tuple(rig)

    cfg = EstimatorConfig(
        vit=ViTConfig(
            image_size=IMG, patch_size=16, hidden_size=96, num_layers=2,
            num_heads=4, layerscale_init=None, dtype="float32",
        ),
        num_joints=robot.n_keypoints,
        num_angles=robot.n_joints,
        heatmap_size=(HM, HM),
        max_views=2,
        num_fusion_queries=4,
        num_angle_queries=2,
        freeze_backbone=False,
        dtype="float32",
    )
    model = SingleViewPoseEstimator(cfg)
    tcfg = TrainConfig(
        num_epochs=1, steps_per_epoch=500, lr_kpt=2e-3, lr_ang=2e-3,
        loss_weight_kpt=100.0, freeze_backbone=False,
    )
    init = _make_batch(robot, rig_arrs, jax.random.PRNGKey(99), 2)
    variables = model.init(jax.random.PRNGKey(1), init["images"][:1])
    state = create_train_state(model, variables, tcfg)
    step = make_single_view_train_step(tcfg)

    key = jax.random.PRNGKey(0)
    for i in range(500):
        key, bk, sk = jax.random.split(key, 3)
        state, m = step(state, _make_batch(robot, rig_arrs, bk, 32), sk)

    # Held-out eval (seed far from the training stream).
    ev = _make_batch(robot, rig_arrs, jax.random.PRNGKey(123_456), 64)
    pred_hm, pred_ang = state.apply_fn(
        {"params": state.params, "batch_stats": state.batch_stats}, ev["images"]
    )
    xy, _ = argmax_decode(pred_hm)
    pck5 = float(pck_at_k(xy * (IMG / HM), ev["keypoints_2d"], k_px=5.0))
    assert pck5 >= 0.9, f"held-out PCK@5px {pck5} < 0.9 (loss {float(m['loss'])})"
    # Angle regression from scratch needs far more optimization than 500
    # steps (see runs/synth_sv); here we only require the head's output to be
    # finite and batch-dependent (not a collapsed constant).
    assert bool(jnp.all(jnp.isfinite(pred_ang)))
    assert float(jnp.std(pred_ang, axis=0).max()) > 1e-3


def test_geometric_angle_head_learns_ik_from_gt_heatmaps():
    """The GeometricAngleHead must solve the well-conditioned part of the
    keypoints->angles regression almost immediately when fed GT-rendered
    heatmaps (no ViT in the loop): observable joint 1 to <10 deg in a few
    hundred Adam steps. This pins the quantitative claim behind
    --angle-head geometric (PARITY.md dissection) as a fast regression test."""
    import optax

    from mvropose_tpu.models import GeometricAngleHead

    robot = get_robot("fr5")
    rig = make_rig(n_views=1, image_hw=(IMG, IMG))
    rig_arrs = rig_tuple(rig)

    def batch_of(seed, n):
        b = _make_batch(robot, rig_arrs, jax.random.PRNGKey(seed), n)
        return b["heatmaps"], b["angles"]

    head = GeometricAngleHead(num_angles=robot.n_joints, hidden=128, depth=2)
    hm0, ang0 = batch_of(0, 8)
    params = head.init(jax.random.PRNGKey(1), hm0)
    tx = optax.adam(3e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, hm, ang):
        def loss(p):
            pred = head.apply(p, hm)
            return jnp.mean(optax.huber_loss(pred, ang))

        g = jax.grad(loss)(params)
        up, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, up), opt

    for i in range(400):
        hm, ang = batch_of(100 + i, 64)
        params, opt = step(params, opt, hm, ang)

    hm_te, ang_te = batch_of(9999, 128)  # held out
    pred = head.apply(params, hm_te)
    mae = np.asarray(jnp.mean(jnp.abs(pred - ang_te), axis=0))
    assert mae[0] < 10.0, mae  # most-observable joint converges fast
    assert mae[:3].mean() < 20.0, mae


def test_geometric3d_head_learns_ik_from_gt_multiview_heatmaps():
    """The geometric3d variant (per-view soft-argmax -> differentiable DLT ->
    fused 3D skeleton + 2D features -> MLP) must learn the observable joints
    from GT 3-view heatmaps as fast as the 2D head does single-view, while
    consuming the triangulated evidence that resolves multi-view ambiguity.
    The full-budget comparison lives in runs/synth_mv_tri (PARITY.md)."""
    import optax

    from mvropose_tpu.models import GeometricAngleHead

    robot = get_robot("fr5")
    rig = make_rig(n_views=3, image_hw=(IMG, IMG))
    rig_arrs = rig_tuple(rig)

    def batch_of(seed, n):
        b = synthesize_multiview_batch(
            robot, rig_arrs, jax.random.PRNGKey(seed), n,
            image_hw=(IMG, IMG), heatmap_hw=(HM, HM),
        )
        return b["heatmaps"], b["view_mask"], b["proj_mats"], b["angles"]

    head = GeometricAngleHead(
        num_angles=robot.n_joints, hidden=128, depth=2, max_views=3,
        use_triangulation=True,
    )
    hm0, vm0, pm0, _ = batch_of(0, 8)
    params = head.init(jax.random.PRNGKey(1), hm0, vm0, pm0)
    tx = optax.adam(3e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, hm, vm, pm, ang):
        def loss(p):
            pred = head.apply(p, hm, vm, pm)
            return jnp.mean(optax.huber_loss(pred, ang))

        g = jax.grad(loss)(params)
        up, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, up), opt

    for i in range(400):
        hm, vm, pm, ang = batch_of(100 + i, 64)
        params, opt = step(params, opt, hm, vm, pm, ang)

    hm_te, vm_te, pm_te, ang_te = batch_of(9999, 128)  # held out
    pred = head.apply(params, hm_te, vm_te, pm_te)
    mae = np.asarray(jnp.mean(jnp.abs(pred - ang_te), axis=0))
    assert mae[0] < 10.0, mae
    assert mae[:3].mean() < 20.0, mae


def test_link_render_makes_wrist_roll_observable():
    """render='link': images carry an oriented tool marker, so changing ONLY
    the final wrist-roll joint changes the pixels (and the marker-tip
    keypoint), while blob rendering is provably blind to it (the PARITY
    observability caveat, now measured in the framework's own renderer)."""
    robot = get_robot("fr5")
    rig = make_rig(n_views=1, image_hw=(IMG, IMG))
    rig_arrs = rig_tuple(rig)

    def batch_with_j6(delta, render):
        b = synthesize_multiview_batch(
            robot, rig_arrs, jax.random.PRNGKey(0), 2,
            image_hw=(IMG, IMG), heatmap_hw=(HM, HM), render=render,
        )
        ang = b["angles"].at[:, -1].add(delta)
        from mvropose_tpu.geometry.robots import forward_kinematics_frames
        # Re-render with modified angles through the same jitted generator is
        # not exposed; instead verify at the geometry level + renderer level.
        return b, ang

    b_link, _ = batch_with_j6(0.0, "link")
    b_blob, _ = batch_with_j6(0.0, "blob")
    J = robot.n_keypoints
    assert b_link["keypoints_3d"].shape[-2] == J + 1  # + tool-marker tip
    assert b_link["heatmaps"].shape[-3] == J + 1
    assert b_blob["keypoints_3d"].shape[-2] == J

    # Geometry: the tool tip moves with j6; joint origins do not.
    from mvropose_tpu.geometry.robots import forward_kinematics, forward_kinematics_frames

    ang = jnp.asarray(np.zeros(robot.n_joints, np.float32)).at[1].set(-30.0)
    ang2 = ang.at[-1].add(40.0)  # wrist roll only

    def tip(a):
        pos, rot = forward_kinematics_frames(robot, a)
        return pos[-1] + 0.08 * rot[-1][:, 0]

    np.testing.assert_allclose(
        np.asarray(forward_kinematics(robot, ang)),
        np.asarray(forward_kinematics(robot, ang2)), atol=1e-5,
    )  # origins blind to the roll
    moved = np.linalg.norm(np.asarray(tip(ang)) - np.asarray(tip(ang2)))
    assert moved > 0.03, moved  # marker tip sweeps with the roll

    # Renderer: distinct tool-tip positions -> distinct pixels.
    from mvropose_tpu.data.synthetic import joint_palette, render_segment_images

    p0 = jnp.asarray([[[20.0, 20.0]]])
    img_a = render_segment_images(p0, jnp.asarray([[[50.0, 20.0]]]), (IMG, IMG),
                                  jnp.asarray(joint_palette(1)))
    img_b = render_segment_images(p0, jnp.asarray([[[20.0, 50.0]]]), (IMG, IMG),
                                  jnp.asarray(joint_palette(1)))
    assert float(jnp.abs(img_a - img_b).max()) > 0.5

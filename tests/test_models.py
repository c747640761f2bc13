"""Model layer smoke + invariant tests (tiny configs, CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvropose_tpu.models import (
    EstimatorConfig,
    SingleViewPoseEstimator,
    MultiViewPoseEstimator,
    ViTBackbone,
)
from mvropose_tpu.models.vit import VIT_TINY_TEST


TINY = EstimatorConfig(
    vit=VIT_TINY_TEST,
    num_joints=8,
    num_angles=7,
    heatmap_size=(32, 32),
    max_views=8,
    num_fusion_queries=4,
    num_angle_queries=2,
    dtype="float32",
)


def test_vit_backbone_shapes():
    model = ViTBackbone(VIT_TINY_TEST)
    x = jnp.zeros((2, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out["patch_tokens"].shape == (2, 16, 64)
    assert out["cls_token"].shape == (2, 64)
    assert out["grid_hw"] == (4, 4)


def test_vit_pos_embed_interpolation():
    """Backbone trained at 64px runs at other resolutions (518->512 case)."""
    model = ViTBackbone(VIT_TINY_TEST)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    out = model.apply(params, jnp.zeros((1, 96, 96, 3)))
    assert out["patch_tokens"].shape == (1, 36, 64)
    assert out["grid_hw"] == (6, 6)


def test_single_view_estimator_shapes():
    model = SingleViewPoseEstimator(TINY)
    x = jnp.zeros((2, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    (heatmaps, angles), _ = model.apply(
        variables, x, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    assert heatmaps.shape == (2, 8, 32, 32)
    assert angles.shape == (2, 7)
    assert heatmaps.dtype == jnp.float32
    assert angles.dtype == jnp.float32


def test_multi_view_estimator_shapes():
    model = MultiViewPoseEstimator(TINY)
    B, V = 2, 4
    imgs = jnp.zeros((B, V, 64, 64, 3))
    vids = jnp.tile(jnp.arange(V, dtype=jnp.int32), (B, 1))
    mask = jnp.ones((B, V), dtype=bool)
    variables = model.init(jax.random.PRNGKey(0), imgs, vids, mask)
    heatmaps, angles = model.apply(variables, imgs, vids, mask)
    assert heatmaps.shape == (B, V, 8, 32, 32)
    assert angles.shape == (B, 7)


def test_multi_view_mask_invariance(rng):
    """Padding with masked-out garbage views must not change real outputs.

    This is the property the reference could NOT guarantee with zero-dummy
    images (dummies still fed attention); our masked fusion makes padding
    exact.
    """
    model = MultiViewPoseEstimator(TINY)
    B, V = 1, 3
    imgs = jnp.asarray(rng.normal(size=(B, V, 64, 64, 3)).astype(np.float32))
    vids = jnp.asarray([[0, 1, 2]], dtype=jnp.int32)
    mask3 = jnp.ones((B, V), dtype=bool)
    variables = model.init(jax.random.PRNGKey(0), imgs, vids, mask3)
    hm3, ang3 = model.apply(variables, imgs, vids, mask3)

    # Pad to V=5 with garbage images, masked out.
    garbage = jnp.asarray(rng.normal(size=(B, 2, 64, 64, 3)).astype(np.float32) * 50)
    imgs5 = jnp.concatenate([imgs, garbage], axis=1)
    vids5 = jnp.asarray([[0, 1, 2, 3, 4]], dtype=jnp.int32)
    mask5 = jnp.asarray([[True, True, True, False, False]])
    hm5, ang5 = model.apply(variables, imgs5, vids5, mask5)

    np.testing.assert_allclose(np.asarray(ang5), np.asarray(ang3), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(hm5[:, :V]), np.asarray(hm3), atol=1e-4
    )


def test_frozen_backbone_gets_no_grad():
    model = SingleViewPoseEstimator(TINY)
    x = jnp.ones((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)

    def loss_fn(params):
        hm, ang = model.apply({"params": params, "batch_stats": variables["batch_stats"]}, x)
        return jnp.sum(hm**2) + jnp.sum(ang**2)

    grads = jax.grad(loss_fn)(variables["params"])
    backbone_norm = jax.tree_util.tree_reduce(
        lambda a, b: a + jnp.sum(jnp.abs(b)), grads["backbone"], 0.0
    )
    head_norm = jax.tree_util.tree_reduce(
        lambda a, b: a + jnp.sum(jnp.abs(b)), grads["keypoint_head"], 0.0
    )
    assert float(backbone_norm) == 0.0
    assert float(head_norm) > 0.0


def test_self_attention_fusion_mask_invariance(rng):
    """Prototype self-attn fusion variant: masked views contribute nothing."""
    import jax.numpy as jnp

    from mvropose_tpu.models import SelfAttentionFusion

    model = SelfAttentionFusion(num_heads=4, dtype=jnp.float32)
    toks = jnp.asarray(rng.normal(size=(1, 2, 8, 32)).astype(np.float32))
    mask2 = jnp.ones((1, 2), dtype=bool)
    variables = model.init(jax.random.PRNGKey(0), toks, mask2)
    out2 = model.apply(variables, toks, mask2)
    assert out2.shape == (1, 2, 8, 32)

    garbage = jnp.asarray(rng.normal(size=(1, 1, 8, 32)).astype(np.float32) * 40)
    toks3 = jnp.concatenate([toks, garbage], axis=1)
    mask3 = jnp.asarray([[True, True, False]])
    out3 = model.apply(variables, toks3, mask3)
    np.testing.assert_allclose(np.asarray(out3[:, :2]), np.asarray(out2), atol=1e-4)


def test_geometric_angle_head_shapes(rng):
    """Optional beyond-reference angle head: soft-argmax(heatmaps) -> MLP.
    Single- and multi-view shapes, and the angle loss must leave the
    keypoint path untouched (stop_gradient on the heatmaps)."""
    import dataclasses as _dc

    cfg = _dc.replace(TINY, angle_head="geometric")
    sv = SingleViewPoseEstimator(cfg)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    variables = sv.init(jax.random.PRNGKey(0), x)
    hm, ang = sv.apply(variables, x)
    assert hm.shape == (2, cfg.num_joints, *cfg.heatmap_size)
    assert ang.shape == (2, cfg.num_angles)

    def ang_loss(params):
        _, a = sv.apply(
            {"params": params, "batch_stats": variables["batch_stats"]}, x
        )
        return jnp.sum(a**2)

    grads = jax.grad(ang_loss)(variables["params"])
    kpt_grad = jax.tree_util.tree_reduce(
        lambda a, b: a + jnp.sum(jnp.abs(b)), grads["keypoint_head"], 0.0
    )
    head_grad = jax.tree_util.tree_reduce(
        lambda a, b: a + jnp.sum(jnp.abs(b)), grads["angle_head"], 0.0
    )
    assert float(kpt_grad) == 0.0  # stop_gradient: angle loss can't distort heatmaps
    assert float(head_grad) > 0.0


def test_geometric_angle_head_multiview_mask_invariance(rng):
    """Same exact-padding-invariance guarantee as the flagship head: garbage
    masked views (and a different padded width V) change nothing."""
    import dataclasses as _dc

    cfg = _dc.replace(TINY, angle_head="geometric", max_views=8)
    model = MultiViewPoseEstimator(cfg)
    B, V = 1, 3
    imgs = jnp.asarray(rng.normal(size=(B, V, 64, 64, 3)).astype(np.float32))
    vids = jnp.asarray([[0, 1, 2]], dtype=jnp.int32)
    mask3 = jnp.ones((B, V), dtype=bool)
    variables = model.init(jax.random.PRNGKey(0), imgs, vids, mask3)
    hm3, ang3 = model.apply(variables, imgs, vids, mask3)
    assert ang3.shape == (B, cfg.num_angles)

    garbage = jnp.asarray(rng.normal(size=(B, 2, 64, 64, 3)).astype(np.float32) * 50)
    imgs5 = jnp.concatenate([imgs, garbage], axis=1)
    vids5 = jnp.asarray([[0, 1, 2, 3, 4]], dtype=jnp.int32)
    mask5 = jnp.asarray([[True, True, True, False, False]])
    hm5, ang5 = model.apply(variables, imgs5, vids5, mask5)
    np.testing.assert_allclose(np.asarray(ang5), np.asarray(ang3), atol=1e-4)


def test_geometric3d_head_mask_invariance_and_triangulation(rng):
    """geometric3d: the triangulated-DLT branch is exact on GT heatmaps and
    masked-view padding stays invariant (masked views carry weight 0 into the
    DLT, so garbage views cannot perturb the fused 3D skeleton)."""
    import dataclasses

    from mvropose_tpu.data.synthetic import make_rig, rig_tuple, synthesize_multiview_batch
    from mvropose_tpu.geometry.robots import get_robot
    from mvropose_tpu.geometry.triangulation import heatmap_projection_matrices

    robot = get_robot("fr5")
    rig = make_rig(n_views=3, image_hw=(64, 64))
    b = synthesize_multiview_batch(
        robot, rig_tuple(rig), jax.random.PRNGKey(2), 2,
        image_hw=(64, 64), heatmap_hw=(32, 32),
    )
    cfg = dataclasses.replace(
        TINY, num_joints=robot.n_keypoints, num_angles=robot.n_joints,
        angle_head="geometric3d", max_views=4,
    )
    model = MultiViewPoseEstimator(cfg)
    variables = model.init(
        jax.random.PRNGKey(0), b["images"], b["view_ids"], b["view_mask"],
        proj_mats=b["proj_mats"],
    )
    hm, ang = model.apply(
        variables, b["images"], b["view_ids"], b["view_mask"], proj_mats=b["proj_mats"]
    )
    assert ang.shape == (2, robot.n_joints)
    assert np.isfinite(np.asarray(ang)).all()

    # Mask invariance: append a garbage view with mask False + zero P.
    garbage = jnp.asarray(rng.normal(size=(2, 1, 64, 64, 3)).astype(np.float32) * 50)
    imgs4 = jnp.concatenate([b["images"], garbage], axis=1)
    vids4 = jnp.concatenate([b["view_ids"], jnp.full((2, 1), 3, jnp.int32)], axis=1)
    mask4 = jnp.concatenate([b["view_mask"], jnp.zeros((2, 1), bool)], axis=1)
    pm4 = jnp.concatenate([b["proj_mats"], jnp.zeros((2, 1, 3, 4))], axis=1)
    hm4, ang4 = model.apply(variables, imgs4, vids4, mask4, proj_mats=pm4)
    np.testing.assert_allclose(np.asarray(ang4), np.asarray(ang), atol=1e-4)

    # The branch's geometry: DLT on exact GT keypoints recovers the skeleton.
    K, rv, tv = rig_tuple(rig)
    P = heatmap_projection_matrices(rv, tv, K, (64, 64), (32, 32))
    from mvropose_tpu.geometry.triangulation import triangulate_keypoints

    tri = jax.vmap(lambda xy, w: triangulate_keypoints(xy, P, w))(
        b["keypoints_2d"] * 0.5, jnp.ones(b["keypoints_2d"].shape[:-1])
    )
    np.testing.assert_allclose(np.asarray(tri), np.asarray(b["keypoints_3d"]), atol=1e-4)


def test_s2d_conv_equivalence():
    """The space-to-depth stem formulation is EXACTLY the 3x3 stride-2 conv.

    scripts/bench_stem.py races the two on the chip (the s2d form widens the
    contraction from C_in 3/16/32 to 12/64/128, fixing the MXU lane waste the
    serve breakdown attributes the stem's 0.5% MFU to); this pins the math.
    """
    import sys

    sys.path.insert(0, ".")
    from scripts.bench_stem import conv_ref, conv_s2d

    rng = np.random.default_rng(3)
    for C, F, S in ((3, 16, 64), (16, 32, 32), (32, 64, 16)):
        x = jnp.asarray(rng.normal(size=(2, S, S, C)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(3, 3, C, F)).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(conv_s2d(x, w)), np.asarray(conv_ref(x, w)),
            rtol=1e-5, atol=1e-5,
        )


def test_single_view_rejects_geometric3d():
    """geometric3d is multi-view only; building the query head silently
    would save a checkpoint whose model_config lies about its params."""
    import dataclasses

    cfg = dataclasses.replace(TINY, angle_head="geometric3d")
    model = SingleViewPoseEstimator(cfg)
    with pytest.raises(ValueError, match="multi-view only"):
        model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))


def test_geometric3d_single_view_sample_stays_bounded(rng):
    """A group with ONE valid view leaves the DLT rank-deficient - the raw
    homogeneous solution can reach ~1e12. The head must zero unobservable
    points so the MLP never sees unbounded inputs (finite angles, moderate
    magnitude)."""
    import dataclasses

    cfg = dataclasses.replace(TINY, angle_head="geometric3d", max_views=4)
    model = MultiViewPoseEstimator(cfg)
    B, V = 2, 4
    imgs = jnp.asarray(rng.normal(size=(B, V, 64, 64, 3)).astype(np.float32))
    vids = jnp.tile(jnp.arange(V, dtype=jnp.int32), (B, 1))
    mask = jnp.zeros((B, V), bool).at[:, 0].set(True)  # ONE valid view each
    pm = jnp.asarray(rng.normal(size=(B, V, 3, 4)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), imgs, vids, mask, proj_mats=pm)
    hm, ang = model.apply(variables, imgs, vids, mask, proj_mats=pm)
    assert np.isfinite(np.asarray(ang)).all()
    assert float(jnp.abs(ang).max()) < 1e4, float(jnp.abs(ang).max())


def test_padded_views_do_not_contaminate_bn_stats(rng):
    """Zero-image padded view slots must not enter BatchNorm's batch
    statistics: the stem's stats population should be the sample's REAL
    images (masked slots hold substituted copies), so a 1-real-view sample
    padded to V=4 yields the same stem batch stats as the unpadded V=1 run.
    The old code normalized over the zero frames, shifting train-time stats
    and the saved running averages with the padding ratio."""
    model = MultiViewPoseEstimator(TINY)
    img = jnp.asarray(rng.normal(size=(1, 1, 64, 64, 3)).astype(np.float32))

    def stem_stats(images, vids, mask):
        variables = model.init(jax.random.PRNGKey(0), images, vids, mask)
        _, mutated = model.apply(
            variables, images, vids, mask, train=True,
            mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(1)},
        )
        return mutated["batch_stats"]["cnn_stem"]

    stats1 = stem_stats(img, jnp.zeros((1, 1), jnp.int32), jnp.ones((1, 1), bool))
    padded = jnp.concatenate([img, jnp.zeros((1, 3, 64, 64, 3))], axis=1)
    vids4 = jnp.asarray([[0, 1, 2, 3]], jnp.int32)
    mask4 = jnp.asarray([[True, False, False, False]])
    stats4 = stem_stats(padded, vids4, mask4)
    for a, b in zip(
        jax.tree_util.tree_leaves(stats1), jax.tree_util.tree_leaves(stats4)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_pos_embed_interpolates_for_rectangular_grid_same_count():
    """A 32x128 input at patch 16 gives a 2x8 grid - 16 patches, the same
    COUNT as the config's 4x4 grid. The interpolation gate must compare the
    grid shape, not the count, or the square-raster pos-embed is added to a
    rectangular raster with every token mis-embedded (silently)."""
    model = ViTBackbone(VIT_TINY_TEST)  # image_size 64 / patch 16 -> 4x4
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    out = model.apply(params, jnp.zeros((1, 32, 128, 3)))
    assert out["grid_hw"] == (2, 8)
    assert out["patch_tokens"].shape == (1, 16, 64)
    # The pos-embed rows for a CONSTANT image are the only source of token
    # variation; under correct rectangular interpolation row 0 (y~top) and
    # row 1 (y~bottom) must differ from a naive square-raster read that
    # would assign rows 0..3 of the 4x4 grid across the first two tokens.
    toks = np.asarray(out["patch_tokens"]).reshape(2, 8, -1)
    assert not np.allclose(toks[0], toks[1])

"""Full pose estimators: single-view and multi-view.

Equivalents of DINOv2PoseEstimator (/root/reference/model/DREAM_Train.py:321)
and DINOv3PoseEstimator (/root/reference/model/MvRoPose_FR3.py:549), rebuilt
for SPMD execution:

  * Multi-view input is a dense (B, V_max, H, W, 3) tensor + (B, V_max) view
    mask + (B, V_max) static view-id table (serial->index decided by the rig
    config, not discovered statefully during forward like the reference's
    view_to_idx registry).
  * The per-view backbone runs once over the folded (B*V, H, W, 3) batch -
    one big MXU-friendly matmul stream instead of a Python loop over views
    (the reference loops views serially, MvRoPose_FR3.py:590-607).
  * The backbone can be frozen (stop_gradient on its tokens): same semantics
    as the reference's requires_grad=False + torch.no_grad.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from mvropose_tpu.models.vit import ViTBackbone, ViTConfig
from mvropose_tpu.models.stem import LightCNNStem
from mvropose_tpu.models.heads import UNetViTKeypointHead, JointAngleHead, DecoderLayer
from mvropose_tpu.models.fusion import MultiViewFusion


@dataclasses.dataclass(frozen=True)
class EstimatorConfig:
    vit: ViTConfig
    num_joints: int = 8  # heatmap channels (keypoints)
    num_angles: int = 7  # regressed joint angles
    heatmap_size: Tuple[int, int] = (128, 128)
    max_views: int = 10
    num_fusion_queries: int = 16
    num_angle_queries: int = 4
    freeze_backbone: bool = True
    dtype: str = "bfloat16"
    # "query": the reference's token-attending transformer head
    # (MvRoPose_FR3.py:355-402). "geometric": beyond-reference explicit
    # geometric bottleneck - soft-argmax of the predicted heatmaps -> MLP
    # (see GeometricAngleHead). "geometric3d" (multi-view only): geometric
    # plus a differentiable-DLT branch - the per-view keypoints are
    # triangulated through the rig's calibrated projection matrices and the
    # fused 3D skeleton feeds the MLP alongside the 2D features, so angle
    # estimation consumes the multi-view evidence that actually resolves the
    # single-view IK ambiguity (the mechanism the reference attributes to
    # fusion, MvRoPose_FR3.py:404-433, but never gives the angle head).
    angle_head: str = "query"

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)


class GeometricAngleHead(nn.Module):
    """Angles from the model's OWN decoded keypoints.

    Beyond-reference: the reference regresses angles from backbone tokens
    through a query transformer (/root/reference/model/MvRoPose_FR3.py:355-402).
    Measured on the synthetic task (PARITY.md dissection), the keypoint path
    localizes ~perfectly thousands of steps before token-based angle
    regression moves off the predict-the-mean floor, while an MLP on the
    *decoded coordinates* solves observable joints to ~1 degree almost
    immediately. This head inserts that explicit geometric bottleneck:
    differentiable soft-argmax of the predicted heatmaps -> normalized
    keypoint coordinates + confidences (masked per view in multi-view) ->
    MLP. stop_gradient on the heatmaps keeps the angle loss from distorting
    keypoint training (the optimizer groups already keep params disjoint).
    """

    num_angles: int
    hidden: int = 256
    depth: int = 3
    temperature: float = 1.0
    max_views: int = 0  # >0: multi-view; MLP input width is fixed at max_views
    use_triangulation: bool = False  # multi-view: add the fused-3D DLT branch

    # Decode mode for the keypoint bottleneck. "refine" (default): hard
    # argmax + peak-local softmax centroid. "soft": full-map soft-argmax -
    # kept for ablation, but measured to be the WRONG choice: on gaussian-
    # target heatmaps (peak 1, background 0) the background's softmax mass
    # contracts the expectation ~99% toward image center, so the MLP must
    # amplify decode noise ~100x and the DLT branch receives geometrically
    # inconsistent rays (runs/synth_mv_tri vs runs/task_bound_mv.json: the
    # exact-2D task bound has j4/j5 at 6/11 deg while soft-decode runs
    # stall at the 25-32 deg floor). The heatmaps are stop_gradient-ed
    # either way, so decode differentiability is irrelevant here.
    decode: str = "refine"

    @nn.compact
    def __call__(self, heatmaps, view_mask=None, proj_mats=None):
        # The one decode dispatch lives in decode_keypoints - a decode fix
        # there must reach this bottleneck too (image_hw=None keeps heatmap
        # pixels; the heatmaps are stop_gradient-ed so differentiability of
        # the decode path is irrelevant here).
        from mvropose_tpu.decode import decode_keypoints

        hm = jax.lax.stop_gradient(heatmaps).astype(jnp.float32)
        xy, conf = decode_keypoints(
            hm, image_hw=None, mode=self.decode, temperature=self.temperature,
            use_pallas=False,
        )  # (..., J, 2), (..., J)
        h, w = hm.shape[-2], hm.shape[-1]
        xy_px = xy  # heatmap-pixel coords, kept for the triangulation branch
        xy = xy / jnp.asarray([w - 1.0, h - 1.0], jnp.float32) * 2.0 - 1.0
        feats = jnp.concatenate(
            [xy.reshape(*xy.shape[:-2], -1), conf], axis=-1
        )  # (B[, V], 3J)
        pts3d_feats = None
        if self.use_triangulation:
            # Differentiable DLT: per-view soft-argmax keypoints (heatmap px)
            # -> one 3D point per joint through the rig's projection matrices
            # (expressed in the SAME heatmap-pixel convention, see
            # heatmap_projection_matrices). Views are weighted by
            # mask x confidence; <2 confident views leaves the DLT
            # ill-conditioned, which the conf feature lets the MLP discount.
            from mvropose_tpu.geometry.triangulation import triangulate_keypoints

            assert proj_mats is not None, "geometric3d head needs proj_mats"
            assert feats.ndim == 3, "triangulation branch is multi-view only"
            wgt = conf
            if view_mask is not None:
                wgt = wgt * view_mask.astype(jnp.float32)[..., None]  # (B, V, J)
            pts3d = jax.vmap(triangulate_keypoints)(xy_px, proj_mats, wgt)  # (B, J, 3)
            obs = jnp.sum((wgt > 0.05).astype(jnp.float32), axis=1)  # (B, J) view count
            # DLT needs >= 2 observing views; below that the homogeneous
            # system is rank-deficient, the null-space vector is arbitrary,
            # and X[:3]/X[3] can reach ~1e12 - an unbounded MLP input the
            # conf feature cannot rescale. Zero unobservable points (the obs
            # feature tells the MLP they're absent) and clip the rest to a
            # generous workspace bound as a numerical backstop.
            pts3d = jnp.where((obs >= 2.0)[..., None], pts3d, 0.0)
            pts3d = jnp.clip(pts3d, -100.0, 100.0)
            pts3d_feats = jnp.concatenate(
                [pts3d.reshape(pts3d.shape[0], -1), obs], axis=-1
            )  # (B, 4J)
        if feats.ndim == 3:  # multi-view: zero masked views, append the mask
            if view_mask is not None:
                m = view_mask.astype(jnp.float32)[..., None]
                feats = jnp.concatenate([feats * m, m], axis=-1)
            else:
                feats = jnp.concatenate(
                    [feats, jnp.ones((*feats.shape[:2], 1), jnp.float32)], axis=-1
                )
            # Fixed input width regardless of runtime V: pad the view axis to
            # max_views with zeros (identical to extra masked views), so the
            # same params serve any padded batch width <= max_views.
            V = feats.shape[1]
            assert self.max_views >= V, (self.max_views, V)
            feats = jnp.pad(feats, ((0, 0), (0, self.max_views - V), (0, 0)))
            feats = feats.reshape(feats.shape[0], -1)  # (B, max_views*(3J+1))
        if pts3d_feats is not None:
            feats = jnp.concatenate([feats, pts3d_feats], axis=-1)
        x = feats
        for i in range(self.depth):
            x = nn.gelu(nn.Dense(self.hidden, dtype=jnp.float32, name=f"fc{i}")(x))
        return nn.Dense(self.num_angles, dtype=jnp.float32, name="out")(x)


class SingleViewPoseEstimator(nn.Module):
    """images (B, H, W, 3) -> (heatmaps (B, J, Hm, Wm), angles (B, A))."""

    cfg: EstimatorConfig

    @nn.compact
    def __call__(self, images, train: bool = False):
        c = self.cfg
        if c.angle_head == "geometric3d":
            # Silently building the query head here would save a checkpoint
            # whose model_config claims geometric3d while its params are a
            # JointAngleHead.
            raise ValueError(
                "angle_head='geometric3d' is multi-view only (its DLT branch "
                "triangulates across views); use 'geometric' for single-view"
            )
        out = ViTBackbone(c.vit, name="backbone")(images)
        tokens = out["patch_tokens"]
        if c.freeze_backbone:
            tokens = jax.lax.stop_gradient(tokens)
        stem_feats = LightCNNStem(dtype=c.compute_dtype, name="cnn_stem")(images, train)
        heatmaps = UNetViTKeypointHead(
            c.num_joints, c.heatmap_size, dtype=c.compute_dtype, name="keypoint_head"
        )(tokens, out["grid_hw"], stem_feats, train)
        if c.angle_head == "geometric":
            angles = GeometricAngleHead(c.num_angles, name="angle_head")(heatmaps)
        else:
            angles = JointAngleHead(
                c.num_angles,
                num_queries=c.num_angle_queries,
                dtype=c.compute_dtype,
                name="angle_head",
            )(tokens, train=train)
        return heatmaps, angles


class MultiViewPoseEstimator(nn.Module):
    """Multi-view fusion estimator.

    __call__(images (B, V, H, W, 3), view_ids (B, V) int32, view_mask (B, V))
      -> (heatmaps (B, V, J, Hm, Wm), angles (B, A))

    Pipeline per the reference architecture (MvRoPose_FR3.py:584-627):
    backbone per view + view embedding -> latent-query fusion (masked) ->
    angle head on fused queries; per-view keypoint enricher cross-attends the
    fused queries -> UNet keypoint head per view.
    """

    cfg: EstimatorConfig

    @nn.compact
    def __call__(self, images, view_ids, view_mask, train: bool = False, proj_mats=None):
        """proj_mats (B, V, 3, 4), heatmap-pixel convention: required by the
        geometric3d angle head (see heatmap_projection_matrices), ignored
        otherwise."""
        c = self.cfg
        B, V, H, W, _ = images.shape
        # BatchNorm in the folded B*V stem/keypoint head computes batch
        # statistics over EVERY slot; the dataset pads missing views with
        # zero images, so the stats (and the saved running averages) would
        # shift with the padding ratio - e.g. 2 real views padded to V=10
        # puts ~80% black frames into the normalization population.
        # Substitute each sample's first REAL view into its masked slots:
        # those slots' outputs are already excluded everywhere downstream
        # (masked fusion attention, masked losses, masked decode features),
        # so only the normalization population changes - real images instead
        # of black frames. All-masked samples keep their zero images.
        first_valid = jnp.argmax(view_mask, axis=1)  # (B,)
        ref_img = jnp.take_along_axis(
            images, first_valid[:, None, None, None, None], axis=1
        )  # (B, 1, H, W, 3)
        images = jnp.where(view_mask[..., None, None, None], images, ref_img)
        flat = images.reshape(B * V, H, W, 3)

        out = ViTBackbone(c.vit, name="backbone")(flat)
        tokens = out["patch_tokens"]  # (B*V, N, D)
        if c.freeze_backbone:
            tokens = jax.lax.stop_gradient(tokens)
        N, D = tokens.shape[1], tokens.shape[2]

        view_embed = nn.Embed(
            c.max_views, D, name="view_embeddings", dtype=c.compute_dtype
        )(view_ids.reshape(B * V))  # (B*V, D)
        tokens = tokens.astype(c.compute_dtype) + view_embed[:, None, :]

        stem_feats = LightCNNStem(dtype=c.compute_dtype, name="cnn_stem")(flat, train)

        view_tokens = tokens.reshape(B, V, N, D)
        fused = MultiViewFusion(
            num_queries=c.num_fusion_queries,
            dtype=c.compute_dtype,
            name="fusion_module",
        )(view_tokens, view_mask, train)  # (B, Q, D)

        # Per-view keypoint enrichment: each view's tokens attend the fused
        # scene summary, then decode to heatmaps. Runs folded over B*V.
        fused_per_view = jnp.repeat(fused, V, axis=0)  # (B*V, Q, D)
        enriched = DecoderLayer(dtype=c.compute_dtype, name="keypoint_enricher")(
            tokens, fused_per_view, train=train
        )
        heatmaps = UNetViTKeypointHead(
            c.num_joints, c.heatmap_size, dtype=c.compute_dtype, name="keypoint_head"
        )(enriched, out["grid_hw"], stem_feats, train)
        Hm, Wm = c.heatmap_size
        heatmaps = heatmaps.reshape(B, V, c.num_joints, Hm, Wm)

        if c.angle_head in ("geometric", "geometric3d"):
            angles = GeometricAngleHead(
                c.num_angles,
                max_views=c.max_views,
                use_triangulation=c.angle_head == "geometric3d",
                name="angle_head",
            )(heatmaps, view_mask, proj_mats)
        else:
            angles = JointAngleHead(
                c.num_angles,
                num_queries=c.num_fusion_queries,
                dtype=c.compute_dtype,
                name="angle_head",
            )(fused, train=train)
        return heatmaps, angles

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

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)


class SingleViewPoseEstimator(nn.Module):
    """images (B, H, W, 3) -> (heatmaps (B, J, Hm, Wm), angles (B, A))."""

    cfg: EstimatorConfig

    @nn.compact
    def __call__(self, images, train: bool = False):
        c = self.cfg
        out = ViTBackbone(c.vit, name="backbone")(images)
        tokens = out["patch_tokens"]
        if c.freeze_backbone:
            tokens = jax.lax.stop_gradient(tokens)
        stem_feats = LightCNNStem(dtype=c.compute_dtype, name="cnn_stem")(images, train)
        heatmaps = UNetViTKeypointHead(
            c.num_joints, c.heatmap_size, dtype=c.compute_dtype, name="keypoint_head"
        )(tokens, out["grid_hw"], stem_feats, train)
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
    def __call__(self, images, view_ids, view_mask, train: bool = False):
        c = self.cfg
        B, V, H, W, _ = images.shape
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

        angles = JointAngleHead(
            c.num_angles,
            num_queries=c.num_fusion_queries,
            dtype=c.compute_dtype,
            name="angle_head",
        )(fused, train=train)

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
        return heatmaps, angles

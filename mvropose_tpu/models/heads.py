"""Prediction heads: UNet-style keypoint heatmap head + query angle head.

Equivalents of the reference heads:
  * TokenFuser           (/root/reference/model/DREAM_Train.py:203-223)
  * FusedUpsampleBlock   (DREAM_Train.py:253-286)
  * UNetViTKeypointHead  (DREAM_Train.py:288-319)
  * JointAngleHead       (DREAM_Train.py:144-201)

Differences by design (TPU-first, not quirks-for-quirks):
  * NHWC layout; bilinear resizes via jax.image.resize (XLA lowers these to
    fused gathers on TPU).
  * The keypoint head consumes the FULL patch-token grid (gh x gw) instead of
    the reference's first-196-tokens slice (DREAM_Train.py:301-307), which for
    DINOv3 accidentally mixed register tokens into the spatial map. The slice
    only ever existed to force a 14x14 map; we reshape the true grid.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn


class TokenFuser(nn.Module):
    """(B, gh, gw, D) token map -> refined (B, gh, gw, out) feature map."""

    out_features: int = 256
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        x = x.astype(dt)
        proj = nn.Conv(self.out_features, (1, 1), dtype=dt, name="projection")(x)
        h = nn.Conv(self.out_features, (3, 3), padding=1, use_bias=False, dtype=dt, name="refine1")(proj)
        h = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32, name="bn1")(h)
        h = nn.gelu(h.astype(dt), approximate=False)
        h = nn.Conv(self.out_features, (3, 3), padding=1, use_bias=False, dtype=dt, name="refine2")(h)
        h = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32, name="bn2")(h)
        res = nn.Conv(self.out_features, (1, 1), dtype=dt, name="residual")(x)
        return nn.gelu(h.astype(dt) + res, approximate=False)


def _resize_bilinear(x, hw: Tuple[int, int]):
    B, _, _, C = x.shape
    return jax.image.resize(x, (B, hw[0], hw[1], C), method="bilinear")


class FusedUpsampleBlock(nn.Module):
    """x2 bilinear upsample + skip concat + two conv-BN-GELU refinements."""

    out_features: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, skip, train: bool = False):
        dt = self.dtype
        H, W = x.shape[1] * 2, x.shape[2] * 2
        x = _resize_bilinear(x.astype(dt), (H, W))
        if skip.shape[1] != H or skip.shape[2] != W:
            skip = _resize_bilinear(skip, (H, W))
        x = jnp.concatenate([x, skip.astype(dt)], axis=-1)
        x = nn.Conv(self.out_features, (3, 3), padding=1, use_bias=False, dtype=dt, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32, name="bn1")(x)
        x = nn.gelu(x.astype(dt), approximate=False)
        x = nn.Conv(self.out_features, (3, 3), padding=1, use_bias=False, dtype=dt, name="conv2")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32, name="bn2")(x)
        return nn.gelu(x.astype(dt), approximate=False)


class UNetViTKeypointHead(nn.Module):
    """(tokens (B, N, D), grid_hw, stem feats) -> heatmaps (B, J, Hm, Wm).

    Decoder: TokenFuser -> up(+stem 1/8) -> up(+stem 1/4) -> x2 up -> 3x3
    conv -> bilinear to heatmap_size. Output heatmaps are f32 (they feed the
    MSE loss and the peak decoder).
    """

    num_joints: int
    heatmap_size: Tuple[int, int] = (128, 128)
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, tokens, grid_hw, stem_feats, train: bool = False):
        gh, gw = grid_hw
        feat_4, feat_8 = stem_feats
        B, N, D = tokens.shape
        x = tokens[:, : gh * gw, :].reshape(B, gh, gw, D)
        x = TokenFuser(256, dtype=self.dtype, name="token_fuser")(x, train)
        x = FusedUpsampleBlock(128, dtype=self.dtype, name="decoder_block1")(x, feat_8, train)
        x = FusedUpsampleBlock(64, dtype=self.dtype, name="decoder_block2")(x, feat_4, train)
        # Final x2 upsample only when the decoder is still below the heatmap
        # resolution (with large inputs, e.g. 512px -> 32x32 grid, the chain
        # would overshoot to 256^2 and immediately resize back down - wasted
        # conv area; the reference always overshot, DREAM_Train.py:316-319).
        if x.shape[1] < self.heatmap_size[0]:
            x = _resize_bilinear(x, (x.shape[1] * 2, x.shape[2] * 2))
        x = nn.Conv(self.num_joints, (3, 3), padding=1, dtype=self.dtype, name="heatmap_predictor")(x)
        x = _resize_bilinear(x.astype(jnp.float32), self.heatmap_size)
        return jnp.transpose(x, (0, 3, 1, 2))  # (B, J, Hm, Wm)


class DecoderLayer(nn.Module):
    """Post-LN transformer decoder layer (torch nn.TransformerDecoderLayer
    semantics, norm_first=False): self-attn -> cross-attn -> FFN."""

    num_heads: int = 8
    dtype: jnp.dtype = jnp.bfloat16
    dropout: float = 0.1

    @nn.compact
    def __call__(self, tgt, memory, memory_mask=None, train: bool = False):
        dt = self.dtype
        deterministic = not train
        attn = lambda name: nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            dtype=dt,
            dropout_rate=self.dropout,
            deterministic=deterministic,
            name=name,
        )
        h = attn("self_attn")(tgt.astype(dt), tgt.astype(dt))
        tgt = nn.LayerNorm(dtype=jnp.float32, name="norm1")(tgt + h).astype(dt)
        h = attn("cross_attn")(tgt, memory.astype(dt), mask=memory_mask)
        tgt = nn.LayerNorm(dtype=jnp.float32, name="norm2")(tgt + h).astype(dt)
        D = tgt.shape[-1]
        h = nn.Dense(D * 4, dtype=dt, name="ffn1")(tgt)
        h = nn.gelu(h, approximate=False)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Dense(D, dtype=dt, name="ffn2")(h)
        return nn.LayerNorm(dtype=jnp.float32, name="norm3")(tgt + h).astype(dt)


class JointAngleHead(nn.Module):
    """Learnable pose queries cross-attend image/fused tokens -> joint angles.

    (B, N, D) memory -> (B, num_angles) via num_queries learnable queries,
    num_layers decoder layers, and a LayerNorm/Dense MLP. Angle output is f32.
    """

    num_angles: int
    num_queries: int = 4
    num_layers: int = 2
    num_heads: int = 8
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, memory, memory_mask=None, train: bool = False):
        B, _, D = memory.shape
        q = self.param(
            "pose_queries", nn.initializers.normal(1.0), (1, self.num_queries, D)
        )
        x = jnp.broadcast_to(q, (B, self.num_queries, D)).astype(self.dtype)
        for i in range(self.num_layers):
            x = DecoderLayer(self.num_heads, dtype=self.dtype, name=f"layer_{i}")(
                x, memory, memory_mask=memory_mask, train=train
            )
        x = x.reshape(B, self.num_queries * D).astype(jnp.float32)
        x = nn.LayerNorm(name="mlp_norm0")(x)
        x = nn.Dense(512, name="mlp_fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.LayerNorm(name="mlp_norm1")(x)
        x = nn.Dense(256, name="mlp_fc2")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.LayerNorm(name="mlp_norm2")(x)
        return nn.Dense(self.num_angles, name="mlp_out")(x)

"""Latent-query multi-view fusion with view masking.

Equivalent of the reference MultiViewFusion
(/root/reference/model/MvRoPose_FR3.py:404-433): learnable global queries
cross-attend the concatenation of all views' tokens through transformer
decoder layers, producing a fixed-size scene summary.

TPU-first difference: variable view counts are expressed as a boolean view
mask over a dense (B, V_max, N, D) token tensor. Masked views contribute
nothing to attention (additive -inf mask), replacing the reference's
zero-dummy-image padding - dummy views there still produced attention mass;
here they are exactly excluded, which also makes the fusion result invariant
to V_max padding.
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from mvropose_tpu.models.heads import DecoderLayer

# Re-export under the reference-facing name.
TransformerDecoderLayer = DecoderLayer


class SelfAttentionFusion(nn.Module):
    """Prototype fusion variant: one self-attention + MLP block over the
    concatenation of all views' tokens (reference MV-model.ipynb cell 3,
    185-238 / Fr5_model_train.ipynb cell 15), with masking added.

    Returns the full (B, V*N, D) cross-view-contextualized token sequence;
    callers pool or slice per view. Kept for architecture ablations - the
    latent-query MultiViewFusion below is the flagship (it summarizes to a
    fixed Q regardless of V, which is both cheaper and V_max-invariant).
    """

    num_heads: int = 8
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, view_tokens, view_mask=None, train: bool = False):
        from mvropose_tpu.models.vit import FusedMHA

        B, V, N, D = view_tokens.shape
        x = view_tokens.reshape(B, V * N, D).astype(self.dtype)
        key_mask = None
        if view_mask is not None:
            key_mask = jnp.repeat(view_mask.astype(bool), N, axis=1)  # (B, V*N)
        # FusedMHA has the exact flax-MHA param tree (query/key/value/out) so
        # existing checkpoints load unchanged; at this module's token count
        # (V*N >= ~2k) the Pallas flash path engages on TPU - measured 2.3x
        # over XLA at T=4104 (scripts/bench_attention_fusion.py).
        h = FusedMHA(num_heads=self.num_heads, dtype=self.dtype, name="self_attn")(
            x, key_mask=key_mask
        )
        x = nn.LayerNorm(dtype=jnp.float32, name="norm1")(x + h).astype(self.dtype)
        h = nn.Dense(D * 4, dtype=self.dtype, name="mlp1")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(D, dtype=self.dtype, name="mlp2")(h)
        x = nn.LayerNorm(dtype=jnp.float32, name="norm2")(x + h).astype(self.dtype)
        return x.reshape(B, V, N, D)


class MultiViewFusion(nn.Module):
    """(B, V, N, D) view tokens + (B, V) mask -> (B, num_queries, D) summary."""

    num_queries: int = 16
    num_layers: int = 2
    num_heads: int = 8
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, view_tokens, view_mask=None, train: bool = False):
        B, V, N, D = view_tokens.shape
        memory = view_tokens.reshape(B, V * N, D)
        memory_mask = None
        if view_mask is not None:
            # (B, V) -> (B, 1, Q, V*N) attention mask (True = attend).
            key_mask = jnp.repeat(view_mask.astype(bool), N, axis=1)  # (B, V*N)
            memory_mask = key_mask[:, None, None, :]
        q = self.param(
            "global_queries", nn.initializers.normal(1.0), (1, self.num_queries, D)
        )
        x = jnp.broadcast_to(q, (B, self.num_queries, D)).astype(self.dtype)
        for i in range(self.num_layers):
            x = DecoderLayer(self.num_heads, dtype=self.dtype, name=f"layer_{i}")(
                x, memory, memory_mask=memory_mask, train=train
            )
        return x

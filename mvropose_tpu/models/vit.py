"""Vision Transformer backbone (DINOv2/v3-compatible) in Flax.

Replaces the reference's timm/HF frozen backbones
(/root/reference/model/DREAM_Train.py:133-142, MvRoPose_FR3.py:326-353).
Supports the structural features needed to host converted DINO checkpoints:
patch embedding, CLS + register tokens, LayerScale, interpolatable position
embeddings, pre-norm blocks. A small config trains from scratch for tests.

TPU notes:
  * All matmuls run in `dtype` (bf16 by default) with f32 params, keeping the
    MXU fed; LayerNorms accumulate in f32.
  * Token count is static per config; attention is a single fused
    dot-product-attention per block (XLA fuses the softmax chain).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn


def _cubic_kernel(x: np.ndarray, a: float) -> np.ndarray:
    """Cubic convolution kernel. torch's standard bicubic uses a=-0.75; its
    antialiased path (adapted from PIL) uses a=-0.5. jax.image.resize uses
    Catmull-Rom a=-0.5 but WITHOUT torch's sampling/normalization scheme, so
    neither jax mode matches torch checkpoints' interpolated embeddings."""
    ax = np.abs(x)
    return np.where(
        ax <= 1.0,
        (a + 2.0) * ax**3 - (a + 3.0) * ax**2 + 1.0,
        np.where(ax < 2.0, a * (ax**3 - 5.0 * ax**2 + 8.0 * ax - 4.0), 0.0),
    )


@functools.lru_cache(maxsize=64)
def _torch_bicubic_matrix(n_in: int, n_out: int, antialias: bool = False) -> np.ndarray:
    """(n_out, n_in) 1-D resize matrix reproducing torch
    `F.interpolate(mode="bicubic", align_corners=False, antialias=...)`
    exactly (verified <= 3e-6 against torch on up/down/non-integer scales).

    antialias=False is the op HF DINOv2 uses for position-embedding
    interpolation (transformers Dinov2Embeddings.interpolate_pos_encoding):
    4 taps of the a=-0.75 kernel with border-replicated out-of-range taps.
    antialias=True is torch's PIL-adapted path: a=-0.5 kernel stretched by
    the downscale factor, window clamped to the valid range, renormalized.
    """
    scale = n_in / n_out
    M = np.zeros((n_out, n_in), np.float64)
    if antialias:
        ks = max(scale, 1.0)  # kernel stretch on downscale
        support = 2.0 * ks
        for i in range(n_out):
            center = (i + 0.5) * scale
            jmin = max(int(center - support + 0.5), 0)
            js = np.arange(jmin, min(int(center + support + 0.5), n_in))
            w = _cubic_kernel((js - center + 0.5) / ks, a=-0.5)
            M[i, js] = w / w.sum()
    else:
        for i in range(n_out):
            x = (i + 0.5) * scale - 0.5
            x0 = int(np.floor(x))
            js = np.arange(x0 - 1, x0 + 3)
            w = _cubic_kernel(x - js, a=-0.75)
            np.add.at(M[i], np.clip(js, 0, n_in - 1), w)  # border replication
    return M


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image_size: int = 224
    patch_size: int = 16
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    num_register_tokens: int = 0
    layerscale_init: Optional[float] = 1e-5  # None disables LayerScale
    dtype: str = "bfloat16"
    # DINOv3 mode: axial rotary position embeddings applied to q/k of the
    # PATCH tokens in every attention block (cls/register tokens unrotated),
    # instead of learned absolute position embeddings - the real
    # facebook/dinov3-* ViTs have no pos_embed parameter at all (HF
    # DINOv3ViTModel semantics: patch-center coords normalized to [-1, 1],
    # inv_freq = rope_theta ** -arange(0, 1, 4/head_dim)). Works at any
    # input grid without interpolation - the coords are recomputed per grid.
    use_rope: bool = False
    rope_theta: float = 100.0
    # torch LayerNorm eps: timm/HF DINOv2 use 1e-6, HF DINOv3 uses 1e-5 -
    # parity with converted checkpoints needs the exact value.
    layer_norm_eps: float = 1e-6
    # "int8": AQT-style dynamically-quantized matmuls in every block (see
    # models/quantize.py) - the serve-path attack on the HBM roofline.
    # Params come from quantize_backbone_params over a float checkpoint.
    quant: Optional[str] = None
    # "int8": int8-probability attention (ops/attention.int8_prob_attention)
    # - the second roofline attack: the (B, H, T, T) probs stream halves and
    # the softmax normalization pass folds into the dequant scale. Separate
    # from `quant` so the two promotions stay individually attributable in
    # bench arms; no parameters change (pure activation quantization).
    quant_attn: Optional[str] = None
    # Pallas fused (residual +) LayerNorm (ops/layernorm.py): one bf16 pass
    # per LN site instead of XLA's f32-materialized stream, with the
    # mid-block residual add fused in. Param tree is unchanged
    # (FusedLayerNorm owns the same scale/bias leaves as nn.LayerNorm), so
    # any float/int8 checkpoint runs with it - serve-path opt-in, benched
    # separately (runs/attn8_ln_bench.json).
    fused_ln: bool = False

    @property
    def grid_size(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid_size * self.grid_size

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)


# Canonical configs mirroring the backbones the reference uses.
VIT_B16 = ViTConfig(patch_size=16, hidden_size=768, num_layers=12, num_heads=12)
VIT_L16 = ViTConfig(patch_size=16, hidden_size=1024, num_layers=24, num_heads=16)
VIT_B14_518 = ViTConfig(image_size=518, patch_size=14, hidden_size=768, num_layers=12, num_heads=12)
VIT_TINY_TEST = ViTConfig(
    image_size=64, patch_size=16, hidden_size=64, num_layers=2, num_heads=4,
    layerscale_init=None, dtype="float32",
)


class Mlp(nn.Module):
    hidden: int
    out: int
    dtype: jnp.dtype
    quant: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        if self.quant == "int8":
            from mvropose_tpu.models.quantize import Int8Dense

            dense = lambda f, name: Int8Dense(f, dtype=self.dtype, name=name)
        else:
            dense = lambda f, name: nn.Dense(f, dtype=self.dtype, name=name)
        x = dense(self.hidden, "fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = dense(self.out, "fc2")(x)
        return x


class LayerScale(nn.Module):
    dim: int
    init: float

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.constant(self.init), (self.dim,))
        return x * gamma.astype(x.dtype)


def _rope_cos_sin(gh: int, gw: int, head_dim: int, theta: float):
    """Static (N, head_dim) cos/sin tables for axial RoPE over a gh x gw
    patch grid, reproducing HF DINOv3ViTRopePositionEmbedding exactly:
    patch-center coords (i + 0.5)/n mapped to [-1, 1]; angles =
    2*pi*coords (x) inv_freq over the (h, w) axis pair, flattened then
    tiled to head_dim. Pure numpy at trace time - constants under jit."""
    inv_freq = 1.0 / theta ** np.arange(0, 1, 4 / head_dim, dtype=np.float64)
    ch = 2.0 * ((np.arange(gh, dtype=np.float64) + 0.5) / gh) - 1.0
    cw = 2.0 * ((np.arange(gw, dtype=np.float64) + 0.5) / gw) - 1.0
    coords = np.stack(np.meshgrid(ch, cw, indexing="ij"), axis=-1).reshape(-1, 2)
    angles = 2.0 * np.pi * coords[:, :, None] * inv_freq[None, None, :]
    angles = angles.reshape(coords.shape[0], -1)
    angles = np.tile(angles, (1, 2))  # (N, head_dim)
    return (
        jnp.asarray(np.cos(angles), jnp.float32),
        jnp.asarray(np.sin(angles), jnp.float32),
    )


def _apply_rope(x: jnp.ndarray, cos, sin, n_prefix: int) -> jnp.ndarray:
    """Rotate the PATCH tokens of (B, T, H, dh) q/k; prefix tokens
    (cls + registers) pass through unrotated (HF apply_rotary_pos_emb)."""
    prefix, patches = x[:, :n_prefix], x[:, n_prefix:]
    c = cos[None, :, None, :].astype(x.dtype)
    s = sin[None, :, None, :].astype(x.dtype)
    x1, x2 = jnp.split(patches, 2, axis=-1)
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    patches = patches * c + rotated * s
    return jnp.concatenate([prefix, patches], axis=1)


class FusedMHA(nn.Module):
    """Self-attention with the Pallas flash kernel on TPU.

    Parameter tree is identical to flax nn.MultiHeadDotProductAttention
    (query/key/value DenseGeneral (D, H, dh) + out (H, dh, D)), so converted
    DINO checkpoints plug in unchanged; only the score computation differs
    (tiled online softmax instead of a materialized (B, H, T, T) matrix).
    rope: optional (cos, sin, n_prefix) - DINOv3-style rotary embedding
    applied to q/k patch tokens after projection.
    """

    num_heads: int
    dtype: jnp.dtype
    quant: Optional[str] = None
    quant_attn: Optional[str] = None

    @nn.compact
    def __call__(self, x, key_mask=None, rope=None):
        from mvropose_tpu.ops.attention import (
            fused_self_attention,
            int8_prob_attention,
        )

        B, T, D = x.shape
        head_dim = D // self.num_heads
        if self.quant == "int8":
            # Same module names as the float path; 2-D int8 kernels
            # ((D, H*dh) / (H*dh, D)) - quantize_backbone_params reshapes
            # the float DenseGeneral kernels to match.
            from mvropose_tpu.models.quantize import Int8Dense

            proj = lambda name: (
                lambda y: Int8Dense(D, dtype=self.dtype, name=name)(y).reshape(
                    B, T, self.num_heads, head_dim
                )
            )
        else:
            proj = lambda name: nn.DenseGeneral(
                features=(self.num_heads, head_dim), axis=-1, dtype=self.dtype,
                name=name,
            )
        q = proj("query")(x)
        k = proj("key")(x)
        v = proj("value")(x)
        if rope is not None:
            cos, sin, n_prefix = rope
            q = _apply_rope(q, cos, sin, n_prefix)
            k = _apply_rope(k, cos, sin, n_prefix)
        if self.quant_attn == "int8":
            out = int8_prob_attention(q, k, v, key_mask=key_mask)
        else:
            out = fused_self_attention(q, k, v, key_mask=key_mask)
        if self.quant == "int8":
            from mvropose_tpu.models.quantize import Int8Dense

            return Int8Dense(D, dtype=self.dtype, name="out")(out.reshape(B, T, D))
        return nn.DenseGeneral(
            features=D, axis=(-2, -1), dtype=self.dtype, name="out"
        )(out)


class FusedLayerNorm(nn.Module):
    """nn.LayerNorm-compatible module (same `scale`/`bias` param leaves)
    running the Pallas fused kernel; with `residual` it also emits the
    fused residual update (ops/layernorm.fused_residual_layernorm)."""

    epsilon: float

    @nn.compact
    def __call__(self, x, residual=None, out_dtype=None):
        from mvropose_tpu.ops.layernorm import (
            fused_layernorm,
            fused_residual_layernorm,
        )

        D = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (D,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (D,), jnp.float32)
        assert D % 128 == 0, (
            f"FusedLayerNorm needs a lane-multiple feature dim, got {D}; "
            "use nn.LayerNorm (cfg.fused_ln=False) for this width"
        )
        if residual is None:
            return fused_layernorm(x, scale, bias, eps=self.epsilon, out_dtype=out_dtype)
        return fused_residual_layernorm(
            x, residual, scale, bias, eps=self.epsilon, out_dtype=out_dtype
        )


class Block(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x, rope=None):
        c = self.cfg
        dt = c.compute_dtype
        eps = c.layer_norm_eps
        if c.fused_ln:
            h = FusedLayerNorm(eps, name="norm1")(x, out_dtype=dt)
        else:
            h = nn.LayerNorm(dtype=jnp.float32, epsilon=eps, name="norm1")(x).astype(dt)
        h = FusedMHA(
            num_heads=c.num_heads, dtype=dt, quant=c.quant,
            quant_attn=c.quant_attn, name="attn",
        )(h, rope=rope)
        if c.layerscale_init is not None:
            h = LayerScale(c.hidden_size, c.layerscale_init, name="ls1")(h)
        if c.fused_ln:
            # Mid-block fusion: the residual update and its normalization
            # are one kernel pass (the LayerScale multiply above fuses into
            # the attention projection's epilogue on the XLA side).
            x, h = FusedLayerNorm(eps, name="norm2")(x, residual=h, out_dtype=dt)
        else:
            x = x + h
            h = nn.LayerNorm(dtype=jnp.float32, epsilon=eps, name="norm2")(x).astype(dt)
        h = Mlp(int(c.hidden_size * c.mlp_ratio), c.hidden_size, dt, quant=c.quant, name="mlp")(h)
        if c.layerscale_init is not None:
            h = LayerScale(c.hidden_size, c.layerscale_init, name="ls2")(h)
        return x + h


class ViTBackbone(nn.Module):
    """ViT producing normalized patch tokens.

    __call__(images NHWC in [-norm space]) -> dict with:
      patch_tokens: (B, N, D)  - the backbone interface every head consumes
      cls_token:    (B, D)
      register_tokens: (B, R, D)
    """

    cfg: ViTConfig

    @nn.compact
    def __call__(self, images: jnp.ndarray):
        c = self.cfg
        dt = c.compute_dtype
        B = images.shape[0]

        x = nn.Conv(
            c.hidden_size,
            kernel_size=(c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size),
            padding="VALID",
            dtype=dt,
            name="patch_embed",
        )(images.astype(dt))
        gh, gw = x.shape[1], x.shape[2]
        x = x.reshape(B, gh * gw, c.hidden_size)

        cls = self.param(
            "cls_token", nn.initializers.truncated_normal(0.02), (1, 1, c.hidden_size)
        )
        rope = None
        if c.use_rope:
            # DINOv3: no absolute pos-embed parameter; position enters as
            # rotary embeddings on q/k in every block (patch tokens only).
            cos, sin = _rope_cos_sin(
                gh, gw, c.hidden_size // c.num_heads, c.rope_theta
            )
            rope = (cos, sin, 1 + c.num_register_tokens)
            cls_tok = jnp.broadcast_to(cls.astype(dt), (B, 1, c.hidden_size))
        else:
            pos = self.param(
                "pos_embed",
                nn.initializers.truncated_normal(0.02),
                (1, c.num_patches + 1, c.hidden_size),
            )
            # Interpolate position embeddings if the input grid differs from
            # the config grid (e.g. converted 518px DINO weights run at
            # 224/512). Separable torch-exact bicubic as two small matmuls:
            # the resize matrices are computed in numpy at TRACE time
            # (static shapes), so under jit this is just two einsums - and
            # it reproduces torch's a=-0.75 antialiased kernel bit-for-bit,
            # which jax.image.resize (Catmull-Rom a=-0.5) does not.
            patch_pos = pos[:, 1:, :]
            # Compare the GRID, not the patch count: a rectangular input
            # whose gh*gw happens to equal grid^2 (e.g. 28x7 vs 14x14) still
            # needs the interpolation - adding the square-raster embedding
            # to a different raster would assign every token the wrong
            # spatial embedding.
            if (gh, gw) != (c.grid_size, c.grid_size):
                g0 = c.grid_size
                Mh = jnp.asarray(_torch_bicubic_matrix(g0, gh), jnp.float32)
                Mw = jnp.asarray(_torch_bicubic_matrix(g0, gw), jnp.float32)
                grid_pos = patch_pos.reshape(g0, g0, c.hidden_size)
                grid_pos = jnp.einsum("Hh,hwd->Hwd", Mh, grid_pos)
                grid_pos = jnp.einsum("Ww,hwd->hWd", Mw, grid_pos)
                patch_pos = grid_pos.reshape(1, gh * gw, c.hidden_size)
            x = x + patch_pos.astype(dt)
            cls_tok = (cls + pos[:, :1, :]).astype(dt)
            cls_tok = jnp.broadcast_to(cls_tok, (B, 1, c.hidden_size))

        toks = [cls_tok]
        if c.num_register_tokens > 0:
            reg = self.param(
                "register_tokens",
                nn.initializers.truncated_normal(0.02),
                (1, c.num_register_tokens, c.hidden_size),
            )
            toks.append(jnp.broadcast_to(reg.astype(dt), (B, c.num_register_tokens, c.hidden_size)))
        toks.append(x)
        x = jnp.concatenate(toks, axis=1)

        for i in range(c.num_layers):
            x = Block(c, name=f"block_{i}")(x, rope=rope)
        if c.fused_ln:
            x = FusedLayerNorm(c.layer_norm_eps, name="norm")(x, out_dtype=jnp.float32)
        else:
            x = nn.LayerNorm(dtype=jnp.float32, epsilon=c.layer_norm_eps, name="norm")(x)

        n_prefix = 1 + c.num_register_tokens
        return {
            "cls_token": x[:, 0, :],
            "register_tokens": x[:, 1:n_prefix, :],
            "patch_tokens": x[:, n_prefix:, :],
            "grid_hw": (gh, gw),
        }

"""int8 quantization of the frozen ViT backbone's matmuls (serve path).

Why: the committed roofline (runs/serve_breakdown.json) shows the serve
program is HBM-bandwidth-bound - the backbone forward moves ~6.5 GB/step at
116 FLOP/byte against a 240 ridge. The dominant byte streams are the matmul
operands (activations in bf16 + weights); storing weights as int8 with
per-output-channel scales and quantizing activations per token on the fly
halves both streams through every Dense, which is where a bandwidth-bound
program's time goes. The MXU has a native int8 x int8 -> int32 path
(`lax.dot_general(..., preferred_element_type=int32)`), so the compute side
gets faster too, not just the memory side.

Scheme (AQT-style dynamic symmetric quantization):
  * weights:     per-output-channel scale  s_w[j] = max_i |W[i, j]| / 127
  * activations: per-token scale           s_x[t] = max_d |x[t, d]| / 127
                 computed inside the jitted forward (no calibration pass)
  * y = (x_q @ W_q).int32 * s_x * s_w + b   - exact up to the two roundings

This targets the FROZEN backbone only (the reference freezes DINOv2/v3:
/root/reference/model/DREAM_Train.py:137-142); heads keep full precision -
they are <5% of the bytes, and they are the trained, robot-specific part.

The quantized parameter tree replaces every Dense kernel with
{kernel_q (int8), scale (f32)} (bias unchanged), so a quantized checkpoint
is structurally distinct from a float one - `quantize_backbone_params`
converts, `cli eval/serve --int8-backbone` applies it at load time.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn


def int8_matmul(x, kernel_q, scale, bias, out_dtype):
    """Dynamically quantized matmul: x (..., Din) f32/bf16, kernel_q
    (Din, Dout) int8, scale (Dout,) f32 -> (..., Dout) in out_dtype."""
    xf = x.astype(jnp.float32)
    # Per-token symmetric scale. The max is over the contraction axis only,
    # so one badly-scaled token cannot crush the resolution of the others.
    sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-6) / 127.0
    xq = jnp.round(xf / sx).astype(jnp.int8)
    y = jax.lax.dot_general(
        xq, kernel_q,
        (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * sx * scale
    if bias is not None:
        y = y + bias
    return y.astype(out_dtype)


class Int8Dense(nn.Module):
    """Dense with int8 kernel + per-channel scale; bias in f32.

    Initializes kernel_q to zeros / scale to ones - a quantized model is
    never trained from scratch, its params come from
    `quantize_backbone_params` over a float checkpoint.
    """

    features: int
    dtype: jnp.dtype
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        din = x.shape[-1]
        kq = self.param(
            "kernel_q", nn.initializers.zeros, (din, self.features), jnp.int8
        )
        scale = self.param(
            "scale", nn.initializers.ones, (self.features,), jnp.float32
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        return int8_matmul(x, kq, scale, bias, self.dtype)


def _quantize_kernel(kernel: np.ndarray, in_dims: int):
    """f32 kernel (*in_shape, *out_shape) -> int8 (Din, Dout) + f32 (Dout,)
    per-output-channel scales. `in_dims` = number of leading input axes."""
    k = np.asarray(kernel, np.float32)
    din = int(np.prod(k.shape[:in_dims]))
    k2 = k.reshape(din, -1)
    scale = np.maximum(np.abs(k2).max(axis=0), 1e-12) / 127.0
    kq = np.clip(np.round(k2 / scale), -127, 127).astype(np.int8)
    return kq, scale.astype(np.float32)


def quantize_backbone_params(backbone_params):
    """Convert a float ViTBackbone param tree to the int8 layout.

    Quantizes every block's attn {query,key,value,out} and mlp {fc1,fc2}
    (>95% of the backbone's weight and activation bytes). Patch embedding,
    LayerNorms, LayerScale, cls/register/pos embeddings stay float - they
    are a rounding error in bytes and the most precision-sensitive.
    DenseGeneral kernels reshape to 2-D: query/key/value (D, H, dh) ->
    (D, H*dh); out (H, dh, D) -> (H*dh, D); biases flatten to match.
    """
    out = jax.tree_util.tree_map(np.asarray, backbone_params)

    def conv(p, in_dims):
        kq, scale = _quantize_kernel(p["kernel"], in_dims)
        q = {"kernel_q": kq, "scale": scale}
        if "bias" in p:
            q["bias"] = np.asarray(p["bias"], np.float32).reshape(-1)
        return q

    for name, blk in out.items():
        if not name.startswith("block_"):
            continue
        attn = blk["attn"]
        for proj in ("query", "key", "value"):
            attn[proj] = conv(attn[proj], in_dims=1)
        attn["out"] = conv(attn["out"], in_dims=2)
        blk["mlp"]["fc1"] = conv(blk["mlp"]["fc1"], in_dims=1)
        blk["mlp"]["fc2"] = conv(blk["mlp"]["fc2"], in_dims=1)
    return out

"""Fused (residual-add +) LayerNorm Pallas kernel for the serve path.

Why: the ViT blocks keep LayerNorm statistics in f32 for checkpoint parity
(flax nn.LayerNorm(dtype=f32)), and at serve time XLA materializes the
f32-normalized stream before the bf16 cast - an extra full-width f32 pass
per LN site on an HBM-bound program (runs/serve_breakdown.json: the bf16
serve step runs at 72-79% HBM utilization). This kernel reads the bf16
residual stream ONCE per site, keeps mean/variance in f32 registers inside
VMEM, and writes bf16 - and the mid-block variant fuses the preceding
residual add, emitting the new residual AND its normalization in one pass
(two reads + two writes instead of three reads + two writes, with no f32
stream at all).

Math matches flax nn.LayerNorm with use_fast_variance=True (its default):
mean and E[x^2] in f32, var = E[x^2] - mean^2, y = (x - mean) * rsqrt(var +
eps) * scale + bias. Parity is asserted by tests/test_ops.py against the
flax module; the measured verdict lives in runs/attn8_ln_bench.json.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln_kernel(x_ref, g_ref, b_ref, y_ref, *, eps: float):
    x = x_ref[:].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(x * x, axis=-1, keepdims=True) - mean * mean
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    y = y * g_ref[:].astype(jnp.float32) + b_ref[:].astype(jnp.float32)
    y_ref[:] = y.astype(y_ref.dtype)


def _res_ln_kernel(x_ref, h_ref, g_ref, b_ref, xnew_ref, y_ref, *, eps: float):
    xn = x_ref[:].astype(jnp.float32) + h_ref[:].astype(jnp.float32)
    xnew_ref[:] = xn.astype(xnew_ref.dtype)
    mean = jnp.mean(xn, axis=-1, keepdims=True)
    var = jnp.mean(xn * xn, axis=-1, keepdims=True) - mean * mean
    y = (xn - mean) * jax.lax.rsqrt(var + eps)
    y = y * g_ref[:].astype(jnp.float32) + b_ref[:].astype(jnp.float32)
    y_ref[:] = y.astype(y_ref.dtype)


def _rows(x):
    lead = x.shape[:-1]
    m = 1
    for d in lead:
        m *= d
    return m, x.shape[-1]


@functools.partial(
    jax.jit, static_argnames=("eps", "out_dtype", "block_m", "interpret")
)
def fused_layernorm(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    eps: float = 1e-6,
    out_dtype=None,
    block_m: int = 256,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """LayerNorm over the last axis, f32 statistics, one HBM pass.

    Requires the feature dim to be a lane multiple (128); callers with other
    widths use the jnp path (mvropose_tpu.models.vit.FusedLayerNorm guards).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    out_dtype = jnp.dtype(out_dtype or x.dtype)
    M, D = _rows(x)
    flat = x.reshape(M, D)
    M_pad = ((M + block_m - 1) // block_m) * block_m
    if M_pad != M:
        # Out-of-range rows are row-independent garbage; their writes are
        # clipped by the block machinery and sliced off below.
        flat = jnp.pad(flat, ((0, M_pad - M), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((M_pad, D), out_dtype),
        grid=(M_pad // block_m,),
        in_specs=[
            pl.BlockSpec((block_m, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(flat, scale.reshape(1, D), bias.reshape(1, D))
    return out[:M].reshape(*x.shape[:-1], D)


@functools.partial(
    jax.jit, static_argnames=("eps", "out_dtype", "block_m", "interpret")
)
def fused_residual_layernorm(
    x: jnp.ndarray,
    h: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    eps: float = 1e-6,
    out_dtype=None,
    block_m: int = 256,
    interpret: bool | None = None,
):
    """(x + h, LayerNorm(x + h)) in one pass - the transformer's
    mid-block pattern (residual update feeding the next normalization)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    out_dtype = jnp.dtype(out_dtype or x.dtype)
    M, D = _rows(x)
    fx = x.reshape(M, D)
    fh = h.reshape(M, D).astype(fx.dtype)
    M_pad = ((M + block_m - 1) // block_m) * block_m
    if M_pad != M:
        fx = jnp.pad(fx, ((0, M_pad - M), (0, 0)))
        fh = jnp.pad(fh, ((0, M_pad - M), (0, 0)))
    xnew, y = pl.pallas_call(
        functools.partial(_res_ln_kernel, eps=eps),
        out_shape=(
            jax.ShapeDtypeStruct((M_pad, D), fx.dtype),
            jax.ShapeDtypeStruct((M_pad, D), out_dtype),
        ),
        grid=(M_pad // block_m,),
        in_specs=[
            pl.BlockSpec((block_m, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_m, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(fx, fh, scale.reshape(1, D), bias.reshape(1, D))
    shp = (*x.shape[:-1], D)
    return xnew[:M].reshape(shp), y[:M].reshape(shp)

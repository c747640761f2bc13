"""Fused heatmap peak decoder as a Pallas TPU kernel.

One VMEM pass per heatmap computes, simultaneously:
  * hard argmax (x, y)          - parity with the reference's host decode
  * soft-argmax (x, y)          - temperature-softmax subpixel expectation
  * confidence = sigmoid(peak)  - the PnP gate score

The reference decodes on host with a per-joint python loop over
argmax/unravel_index (/root/reference/DIP_REAL.py:115-124 and
Fr5_model_train.ipynb cell 14, lines 1372-1403): a device->host sync per
frame. Here decode is part of the jitted serve step; only the final (J, 6)
vector leaves the device.

Layout: heatmaps are flattened to (M, H*W) rows; the grid walks row-blocks of
size BLOCK_M. All reductions are row-wise on the VPU; no matmuls involved.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _decode_kernel(hm_ref, gx_ref, gy_ref, out_ref, *, temperature: float, width: int):
    hm = hm_ref[:].astype(jnp.float32)  # (BM, HW)
    gx = gx_ref[:]  # (1, HW)
    gy = gy_ref[:]

    peak = jnp.max(hm, axis=-1, keepdims=True)  # (BM, 1)
    # First index achieving the max (torch.argmax tie-break parity). The
    # (x, y) coords then follow from index arithmetic - no gather needed
    # (TPU Mosaic has no general gather).
    hw = hm.shape[-1]
    iota = jax.lax.broadcasted_iota(jnp.int32, hm.shape, dimension=1)
    idx = jnp.min(jnp.where(hm >= peak, iota, hw), axis=-1, keepdims=True)
    amax_x = (idx % width).astype(jnp.float32)
    amax_y = (idx // width).astype(jnp.float32)

    # Soft-argmax expectation under temperature softmax.
    p = jnp.exp((hm - peak) * temperature)
    z = jnp.sum(p, axis=-1, keepdims=True)
    soft_x = jnp.sum(p * gx, axis=-1, keepdims=True) / z
    soft_y = jnp.sum(p * gy, axis=-1, keepdims=True) / z

    conf = jax.nn.sigmoid(peak)

    out_ref[:, 0:1] = amax_x
    out_ref[:, 1:2] = amax_y
    out_ref[:, 2:3] = soft_x
    out_ref[:, 3:4] = soft_y
    out_ref[:, 4:5] = conf
    out_ref[:, 5:6] = peak
    # Channels 6:8 are padding (the out row is 8 wide for lane alignment);
    # zero-filled so the buffer is fully initialized.
    out_ref[:, 6:8] = jnp.zeros((hm.shape[0], 2), jnp.float32)


@functools.partial(
    jax.jit, static_argnames=("temperature", "block_m", "interpret")
)
def fused_peak_decode(
    heatmaps: jnp.ndarray,
    temperature: float = 1.0,
    block_m: int = 8,
    interpret: bool | None = None,
):
    """Decode heatmaps (..., H, W) -> dict of per-map peak statistics.

    Returns dict with:
      argmax_xy: (..., 2) hard peak coords
      soft_xy:   (..., 2) subpixel soft-argmax coords
      confidence:(...,)   sigmoid(peak)
      peak:      (...,)   raw peak value
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    *lead, H, W = heatmaps.shape
    M = 1
    for d in lead:
        M *= d
    hw = H * W
    flat = heatmaps.reshape(M, hw).astype(jnp.float32)

    # Pad M up to a block multiple.
    M_pad = ((M + block_m - 1) // block_m) * block_m
    if M_pad != M:
        flat = jnp.pad(flat, ((0, M_pad - M), (0, 0)))

    xs = jnp.tile(jnp.arange(W, dtype=jnp.float32), H).reshape(1, hw)
    ys = jnp.repeat(jnp.arange(H, dtype=jnp.float32), W).reshape(1, hw)

    grid = (M_pad // block_m,)
    out = pl.pallas_call(
        functools.partial(_decode_kernel, temperature=temperature, width=W),
        out_shape=jax.ShapeDtypeStruct((M_pad, 8), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, hw), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hw), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hw), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(flat, xs, ys)

    out = out[:M].reshape(*lead, 8)
    return {
        "argmax_xy": out[..., 0:2],
        "soft_xy": out[..., 2:4],
        "confidence": out[..., 4],
        "peak": out[..., 5],
    }

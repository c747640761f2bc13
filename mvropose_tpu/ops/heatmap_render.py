"""Gaussian GT heatmap rendering as a Pallas TPU kernel.

The reference renders GT heatmaps per joint in numpy inside dataloader worker
processes (/root/reference/model/MvRoPose_FR3.py:220-222) - host CPU burning
~J*H*W flops per sample. Here rendering happens on device as part of the
jitted input-preprocessing step: the kernel writes each (H, W) map in one VMEM
pass from a (x, y, 1/2sigma^2) scalar triple.

Grid: one program per row-block of maps; maps are materialized directly in
VMEM from broadcasted iotas - zero HBM reads besides the keypoint table.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_F64_EPS = 2.220446049250313e-16


def _render_kernel(kp_ref, out_ref, *, height: int, width: int):
    # kp_ref: (BM, 3) rows of [x, y, inv_two_sigma_sq]; out: (BM, H, W)
    bm = out_ref.shape[0]
    col = jax.lax.broadcasted_iota(jnp.float32, (bm, height, width), dimension=2)
    row = jax.lax.broadcasted_iota(jnp.float32, (bm, height, width), dimension=1)
    x = kp_ref[:, 0][:, None, None]
    y = kp_ref[:, 1][:, None, None]
    inv2s2 = kp_ref[:, 2][:, None, None]
    d2 = (col - x) ** 2 + (row - y) ** 2
    hm = jnp.exp(-d2 * inv2s2)
    peak = jnp.max(hm, axis=(1, 2), keepdims=True)
    out_ref[:] = jnp.where(hm < _F64_EPS * peak, 0.0, hm)


@functools.partial(
    jax.jit, static_argnames=("height", "width", "block_m", "interpret")
)
def render_heatmaps_pallas(
    keypoints: jnp.ndarray,
    height: int,
    width: int,
    sigma: float | jnp.ndarray = 5.0,
    block_m: int = 8,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Keypoints (..., 2) -> heatmaps (..., H, W), parity with
    geometry.heatmap.render_heatmaps."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    *lead, _ = keypoints.shape
    M = 1
    for d in lead:
        M *= d
    kp = keypoints.reshape(M, 2).astype(jnp.float32)
    # Scalar sigma or per-map sigma broadcastable against the lead dims
    # (e.g. (J,) per-joint widths for (B, J, 2) keypoints).
    inv = 1.0 / (2.0 * jnp.asarray(sigma, jnp.float32) ** 2)
    inv = jnp.broadcast_to(inv, tuple(lead)).reshape(M, 1)
    kp3 = jnp.concatenate([kp, inv], axis=1)

    M_pad = ((M + block_m - 1) // block_m) * block_m
    if M_pad != M:
        kp3 = jnp.pad(kp3, ((0, M_pad - M), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_render_kernel, height=height, width=width),
        out_shape=jax.ShapeDtypeStruct((M_pad, height, width), jnp.float32),
        grid=(M_pad // block_m,),
        in_specs=[
            pl.BlockSpec((block_m, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_m, height, width), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(kp3)
    return out[:M].reshape(*lead, height, width)

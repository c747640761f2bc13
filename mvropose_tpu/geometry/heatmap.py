"""Gaussian keypoint heatmap rendering + decoding (pure-jnp reference path).

Rendering matches the reference's `create_gt_heatmap`
(/root/reference/model/MvRoPose_FR3.py:65-73): unnormalized gaussian with an
eps-relative floor clip, one (H, W) map per keypoint. Here all keypoints of a
sample render in one vectorized op, on device, so GT generation fuses into the
input pipeline instead of running per-joint numpy loops in dataloader workers.

Decoding replaces the reference's host-side argmax+unravel_index loop
(/root/reference/model/Fr5_model_train.ipynb cell 14): `argmax_decode` is the
exact-parity mode, `soft_argmax_decode` is the differentiable/subpixel mode.
The Pallas-fused production decoder lives in mvropose_tpu/ops; it is tested
against these.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_F64_EPS = 2.220446049250313e-16  # np.finfo(float).eps, as the reference uses


@functools.partial(jax.jit, static_argnames=("height", "width"))
def render_heatmaps(
    keypoints: jnp.ndarray, height: int, width: int, sigma: float | jnp.ndarray = 5.0
) -> jnp.ndarray:
    """Keypoints (..., J, 2) in heatmap pixel coords -> heatmaps (..., J, H, W)."""
    kp = jnp.asarray(keypoints, dtype=jnp.float32)
    xs = jnp.arange(width, dtype=jnp.float32)
    ys = jnp.arange(height, dtype=jnp.float32)
    # Broadcast: (..., J, 1, W) + (..., J, H, 1) -> (..., J, H, W)
    dx = (xs.reshape(1, -1) - kp[..., 0, None, None]) ** 2  # (..., J, 1, W)
    dy = (ys.reshape(-1, 1) - kp[..., 1, None, None]) ** 2  # (..., J, H, 1)
    dist_sq = dx + dy  # (..., J, H, W)
    # Non-scalar sigma is per-map (broadcasts against the (..., J) lead dims,
    # e.g. per-joint widths) - it must NOT align with the trailing W axis,
    # which raw broadcasting would silently do whenever J == W.
    sig = jnp.asarray(sigma, jnp.float32)
    if sig.ndim:
        sig = sig[..., None, None]
    hm = jnp.exp(-dist_sq / (2.0 * sig**2))
    peak = jnp.max(hm, axis=(-2, -1), keepdims=True)
    return jnp.where(hm < _F64_EPS * peak, 0.0, hm)


def argmax_decode(heatmaps: jnp.ndarray, apply_sigmoid: bool = True):
    """Hard-argmax decode: (..., J, H, W) -> ((..., J, 2) xy, (..., J) score).

    Exact parity with the reference's unravel_index decode; score is the
    sigmoid-ed peak value (the PnP confidence gate input).
    """
    h, w = heatmaps.shape[-2], heatmaps.shape[-1]
    flat = heatmaps.reshape(*heatmaps.shape[:-2], h * w)
    idx = jnp.argmax(flat, axis=-1)
    peak = jnp.take_along_axis(flat, idx[..., None], axis=-1)[..., 0]
    if apply_sigmoid:
        peak = jax.nn.sigmoid(peak)
    y = (idx // w).astype(jnp.float32)
    x = (idx % w).astype(jnp.float32)
    return jnp.stack([x, y], axis=-1), peak


def soft_argmax_decode(
    heatmaps: jnp.ndarray, temperature: float = 1.0, apply_sigmoid: bool = True
):
    """Differentiable sub-pixel decode via spatial softmax expectation.

    Returns ((..., J, 2) xy, (..., J) confidence). Confidence is the
    sigmoid-ed max, same gate semantics as argmax_decode.
    """
    h, w = heatmaps.shape[-2], heatmaps.shape[-1]
    flat = heatmaps.reshape(*heatmaps.shape[:-2], h * w)
    probs = jax.nn.softmax(flat * temperature, axis=-1)
    xs = jnp.arange(w, dtype=jnp.float32)
    ys = jnp.arange(h, dtype=jnp.float32)
    grid_x = jnp.tile(xs, h)
    grid_y = jnp.repeat(ys, w)
    x = jnp.sum(probs * grid_x, axis=-1)
    y = jnp.sum(probs * grid_y, axis=-1)
    peak = jnp.max(flat, axis=-1)
    if apply_sigmoid:
        peak = jax.nn.sigmoid(peak)
    return jnp.stack([x, y], axis=-1), peak


def peak_refine_decode(
    heatmaps: jnp.ndarray,
    window: int = 2,
    temperature: float = 1.0,
    apply_sigmoid: bool = True,
):
    """Subpixel decode: hard argmax + softmax centroid over a local window.

    Full-map soft-argmax (`soft_argmax_decode`) is biased toward the image
    center on logit heatmaps: the diffuse background carries more total
    softmax mass than the peak unless the logit scale is large (measured in
    test_pose_error_metrics_on_perfect_heatmaps - it *worsens* recovered pose
    vs hard argmax). Restricting the expectation to a (2*window+1)^2
    neighborhood of the argmax keeps the subpixel precision and removes the
    background pull at any logit scale. Static shapes, fully vectorized (the
    window mask is a broadcasted comparison, no gathers).
    """
    xy0, conf = argmax_decode(heatmaps, apply_sigmoid)
    h, w = heatmaps.shape[-2], heatmaps.shape[-1]
    xs = jnp.arange(w, dtype=jnp.float32)
    ys = jnp.arange(h, dtype=jnp.float32)
    in_x = jnp.abs(xs.reshape(1, -1) - xy0[..., 0, None, None]) <= window
    in_y = jnp.abs(ys.reshape(-1, 1) - xy0[..., 1, None, None]) <= window
    in_win = in_x & in_y  # (..., J, H, W)
    logits = jnp.where(in_win, heatmaps * temperature, -jnp.inf)
    flat = logits.reshape(*logits.shape[:-2], h * w)
    probs = jax.nn.softmax(flat, axis=-1)
    grid_x = jnp.tile(xs, h)
    grid_y = jnp.repeat(ys, w)
    x = jnp.sum(probs * grid_x, axis=-1)
    y = jnp.sum(probs * grid_y, axis=-1)
    return jnp.stack([x, y], axis=-1), conf


def scale_keypoints(
    keypoints: jnp.ndarray, from_hw: tuple[int, int], to_hw: tuple[int, int]
) -> jnp.ndarray:
    """Rescale xy keypoints between resolutions (e.g. heatmap -> image)."""
    sx = to_hw[1] / from_hw[1]
    sy = to_hw[0] / from_hw[0]
    return keypoints * jnp.asarray([sx, sy], dtype=keypoints.dtype)

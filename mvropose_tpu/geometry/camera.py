"""Pinhole camera model with OpenCV-style lens distortion, in pure jnp.

Replaces the reference's native OpenCV calls:
  * cv2.projectPoints  (/root/reference/model/MvRoPose_FR3.py:140) ->
    `project_points` - closed-form and differentiable, which additionally
    enables the FK->2D consistency loss the reference only sketched.
  * cv2.undistort      (/root/reference/model/MvRoPose_FR3.py:212) ->
    `undistort_map` (precomputed per-camera remap grid, host or device) +
    `remap_bilinear` (jit-fused gather) - the TPU-friendly formulation: the
    iterationless forward-distortion map is computed once per camera at
    calibration time and the per-frame work is a single fused gather.

Distortion coefficients are (k1, k2, p1, p2, k3) as stored by the ZED .conf
extraction (/root/reference/dataset/3_Calib_cam_save.py:41-47).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def distort_normalized(xy: jnp.ndarray, dist: jnp.ndarray) -> jnp.ndarray:
    """Apply radial+tangential distortion to normalized coords (..., 2)."""
    dist = jnp.asarray(dist)
    k1, k2, p1, p2, k3 = dist[0], dist[1], dist[2], dist[3], dist[4]
    x = xy[..., 0]
    y = xy[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def project_points(
    points_3d: jnp.ndarray,
    rvec: jnp.ndarray,
    tvec: jnp.ndarray,
    K: jnp.ndarray,
    dist: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """World points (N, 3) -> pixel coords (N, 2). Matches cv2.projectPoints."""
    from mvropose_tpu.geometry.rotations import rodrigues_to_matrix

    R = rodrigues_to_matrix(jnp.asarray(rvec).reshape(3))
    t = jnp.asarray(tvec).reshape(3)
    cam = points_3d @ R.T + t
    xy = cam[..., :2] / (cam[..., 2:3] + 1e-12)
    if dist is not None:
        xy = distort_normalized(xy, dist)
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    u = fx * xy[..., 0] + cx
    v = fy * xy[..., 1] + cy
    return jnp.stack([u, v], axis=-1)


def project_camera_frame(
    points_cam: jnp.ndarray, K: jnp.ndarray, dist: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Camera-frame points (N, 3) -> pixels (N, 2) (no extrinsic)."""
    xy = points_cam[..., :2] / (points_cam[..., 2:3] + 1e-12)
    if dist is not None:
        xy = distort_normalized(xy, dist)
    u = K[0, 0] * xy[..., 0] + K[0, 2]
    v = K[1, 1] * xy[..., 1] + K[1, 2]
    return jnp.stack([u, v], axis=-1)


def undistort_points(
    pixels: jnp.ndarray, K: jnp.ndarray, dist: jnp.ndarray, iters: int = 8
) -> jnp.ndarray:
    """Distorted pixels (N, 2) -> ideal (undistorted) pixels (N, 2).

    Fixed-point inversion of the distortion model (the same Newton-free
    iteration cv2.undistortPoints uses), with a static iteration count so it
    jits cleanly.
    """
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    xd = (pixels[..., 0] - cx) / fx
    yd = (pixels[..., 1] - cy) / fy
    target = jnp.stack([xd, yd], axis=-1)

    def body(_, xy):
        d = distort_normalized(xy, dist) - xy  # pure distortion delta
        return target - d

    xy = jax.lax.fori_loop(0, iters, body, target)
    u = fx * xy[..., 0] + cx
    v = fy * xy[..., 1] + cy
    return jnp.stack([u, v], axis=-1)


@functools.partial(jax.jit, static_argnames=("height", "width"))
def undistort_map(K: jnp.ndarray, dist: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Precompute the (2, H, W) remap grid for cv2.undistort-equivalent output.

    out[y, x] = in[map[0, y, x], map[1, y, x]] (row, col source coordinates).
    For each undistorted destination pixel, apply the FORWARD distortion to
    find its source in the raw image - no iteration required.
    """
    ys = jnp.arange(height, dtype=jnp.float32)
    xs = jnp.arange(width, dtype=jnp.float32)
    grid_y, grid_x = jnp.meshgrid(ys, xs, indexing="ij")
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    x = (grid_x - cx) / fx
    y = (grid_y - cy) / fy
    xy = jnp.stack([x, y], axis=-1)
    xyd = distort_normalized(xy, dist)
    src_x = fx * xyd[..., 0] + cx
    src_y = fy * xyd[..., 1] + cy
    return jnp.stack([src_y, src_x], axis=0)


def remap_bilinear(image: jnp.ndarray, remap: jnp.ndarray) -> jnp.ndarray:
    """Sample image (H, W, C) at remap (2, H', W') row/col coords, bilinear.

    Out-of-range samples clamp to the border (cv2.undistort default is
    BORDER_CONSTANT=0; we expose zero-fill via mask below for parity).
    """
    H, W = image.shape[0], image.shape[1]
    sy = remap[0]
    sx = remap[1]
    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    wy = sy - y0
    wx = sx - x0
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    y1i = jnp.clip(y0i + 1, 0, H - 1)
    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    x1i = jnp.clip(x0i + 1, 0, W - 1)

    def gather(yi, xi):
        return image[yi, xi]  # (H', W', C) advanced indexing

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x1i)
    v10 = gather(y1i, x0i)
    v11 = gather(y1i, x1i)
    wy = wy[..., None]
    wx = wx[..., None]
    out = (
        v00 * (1 - wy) * (1 - wx)
        + v01 * (1 - wy) * wx
        + v10 * wy * (1 - wx)
        + v11 * wy * wx
    )
    # Zero-fill outside the source image (cv2 BORDER_CONSTANT behaviour).
    valid = (sy >= 0) & (sy <= H - 1) & (sx >= 0) & (sx <= W - 1)
    return jnp.where(valid[..., None], out, 0.0).astype(image.dtype)


def undistort_image(image: jnp.ndarray, K: jnp.ndarray, dist: jnp.ndarray) -> jnp.ndarray:
    """One-shot undistort (map computed inline). Prefer precomputing the map
    per camera with `undistort_map` and reusing it with `remap_bilinear`."""
    remap = undistort_map(K, dist, image.shape[0], image.shape[1])
    return remap_bilinear(image, remap)

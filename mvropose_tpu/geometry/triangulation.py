"""Multi-view DLT triangulation with view masking.

The reference recovers 3D only through FK + single-view PnP; the multi-view
rig makes direct triangulation of each keypoint from >=2 camera rays both
possible and cheap. Part of the BASELINE north star ("Multi-view DLT
triangulation ... become batched jax.numpy solvers").

Masked formulation: every sample carries all V_max views; invalid views get
weight 0, keeping shapes static for XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def projection_matrix(rvec: jnp.ndarray, tvec: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """(3,) rvec + (3,) tvec + (3, 3) K -> (3, 4) projection matrix."""
    from mvropose_tpu.geometry.rotations import rodrigues_to_matrix

    R = rodrigues_to_matrix(rvec)
    Rt = jnp.concatenate([R, tvec.reshape(3, 1)], axis=1)
    return K @ Rt


def triangulate_dlt(
    pixels: jnp.ndarray,  # (V, 2) one observation per view
    proj_matrices: jnp.ndarray,  # (V, 3, 4)
    weights: jnp.ndarray | None = None,  # (V,) 0 => ignore view
) -> jnp.ndarray:
    """DLT triangulation of one 3D point from V (masked) views -> (3,).

    Solves for the null vector of the stacked cross-product constraints
    [u P3 - P1; v P3 - P2] per view, weighted. Batch over keypoints/samples
    with vmap.
    """
    V = pixels.shape[0]
    if weights is None:
        weights = jnp.ones((V,), dtype=pixels.dtype)
    P1 = proj_matrices[:, 0, :]  # (V, 4)
    P2 = proj_matrices[:, 1, :]
    P3 = proj_matrices[:, 2, :]
    u = pixels[:, 0:1]
    v = pixels[:, 1:2]
    rows_u = u * P3 - P1  # (V, 4)
    rows_v = v * P3 - P2
    A = jnp.concatenate([rows_u, rows_v], axis=0)  # (2V, 4)
    w2 = jnp.concatenate([weights, weights], axis=0)
    # Row normalization improves conditioning before weighting.
    norm = jnp.linalg.norm(A, axis=1, keepdims=True) + 1e-12
    A = A / norm * w2[:, None]
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    X = Vt[-1]
    return X[:3] / (X[3] + 1e-12)


def heatmap_projection_matrices(
    rvecs: jnp.ndarray,  # (V, 3)
    tvecs: jnp.ndarray,  # (V, 3)
    K: jnp.ndarray,  # (3, 3) or (V, 3, 3), IMAGE-pixel intrinsics
    image_hw: tuple[int, int],
    heatmap_hw: tuple[int, int],
) -> jnp.ndarray:
    """(V, 3, 4) projection matrices in HEATMAP-pixel convention.

    The estimators decode keypoints in heatmap pixels; triangulating them
    directly needs P scaled by diag(hm_w/img_w, hm_h/img_h, 1) on the left.
    3D stays metric.
    """
    S = jnp.diag(
        jnp.asarray(
            [heatmap_hw[1] / image_hw[1], heatmap_hw[0] / image_hw[0], 1.0],
            jnp.float32,
        )
    )
    Ks = jnp.broadcast_to(K, (rvecs.shape[0], 3, 3))
    return jax.vmap(lambda r, t, k: S @ projection_matrix(r, t, k))(rvecs, tvecs, Ks)


def triangulate_keypoints(
    pixels: jnp.ndarray,  # (V, J, 2)
    proj_matrices: jnp.ndarray,  # (V, 3, 4)
    weights: jnp.ndarray | None = None,  # (V, J) or (V,)
) -> jnp.ndarray:
    """Triangulate J keypoints from V views -> (J, 3)."""
    V, J = pixels.shape[0], pixels.shape[1]
    if weights is None:
        weights = jnp.ones((V, J), dtype=pixels.dtype)
    elif weights.ndim == 1:
        weights = jnp.broadcast_to(weights[:, None], (V, J))
    fn = lambda px, w: triangulate_dlt(px, proj_matrices, w)
    return jax.vmap(fn, in_axes=(1, 1))(pixels, weights)

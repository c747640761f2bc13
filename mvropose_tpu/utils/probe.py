"""Backbone feature probe: PCA-RGB visualization of patch tokens.

Equivalent of the reference's DINOv2 PCA probe
(/root/reference/model/MV-model.ipynb cell 3, 56-144): project patch tokens
onto their top-3 principal components and render as an RGB map - the quick
"is the backbone seeing the robot" sanity check. PCA runs in jnp (eigh of
the token covariance), so the probe also works on-device.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def pca_rgb(patch_tokens: jnp.ndarray, grid_hw: tuple[int, int]) -> np.ndarray:
    """(N, D) or (B, N, D) patch tokens -> (gh, gw, 3) / (B, gh, gw, 3) uint8.

    Components are computed over all tokens jointly (batch pooled), matching
    the sklearn-PCA behaviour of the reference probe.
    """
    toks = jnp.asarray(patch_tokens, jnp.float32)
    lead = toks.shape[:-2]
    flat = toks.reshape(-1, toks.shape[-1])
    mean = jnp.mean(flat, axis=0, keepdims=True)
    X = flat - mean
    cov = (X.T @ X) / (X.shape[0] - 1)
    _, eigvecs = jnp.linalg.eigh(cov)
    comps = eigvecs[:, -3:][:, ::-1]  # top-3 components
    proj = X @ comps  # (M, 3)
    lo = jnp.percentile(proj, 2.0, axis=0)
    hi = jnp.percentile(proj, 98.0, axis=0)
    norm = jnp.clip((proj - lo) / (hi - lo + 1e-8), 0.0, 1.0)
    gh, gw = grid_hw
    out = np.asarray(norm).reshape(*lead, gh, gw, 3)
    return (out * 255).astype(np.uint8)


def probe_backbone(model, variables, images: jnp.ndarray) -> np.ndarray:
    """Run a ViTBackbone and return the PCA-RGB maps for a batch."""
    out = model.apply(variables, images)
    return pca_rgb(out["patch_tokens"], out["grid_hw"])

"""Heatmap -> keypoint decoding: Pallas fast path + jnp parity path.

`decode_keypoints` is the single entry the serve/eval paths use; it returns
image-space keypoints + confidences and hides the kernel/backend choice.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from mvropose_tpu.geometry.heatmap import (
    argmax_decode,
    peak_refine_decode,
    soft_argmax_decode,
    scale_keypoints,
)
from mvropose_tpu.ops.peak_decode import fused_peak_decode


def decode_keypoints(
    heatmaps: jnp.ndarray,
    image_hw: Tuple[int, int] | None = None,
    mode: str = "argmax",
    temperature: float = 1.0,
    use_pallas: bool = True,
):
    """Decode heatmaps (..., J, H, W) -> (keypoints_xy (..., J, 2), conf (..., J)).

    mode: "argmax" (reference-parity hard peak), "soft" (full-map subpixel
    soft-argmax), or "refine" (argmax + peak-local softmax centroid - the
    recommended subpixel mode; see peak_refine_decode for why full-map soft
    is biased on logit heatmaps).
    image_hw: optionally rescale coords from heatmap space to image space
    (the reference's decode always rescales, e.g. DIP_REAL.py:120-123).
    """
    if mode == "refine":
        xy, conf = peak_refine_decode(heatmaps, temperature=temperature)
    elif use_pallas:
        out = fused_peak_decode(heatmaps, temperature=temperature)
        xy = out["argmax_xy"] if mode == "argmax" else out["soft_xy"]
        conf = out["confidence"]
    else:
        if mode == "argmax":
            xy, conf = argmax_decode(heatmaps)
        else:
            xy, conf = soft_argmax_decode(heatmaps, temperature=temperature)
    if image_hw is not None:
        hm_hw = (heatmaps.shape[-2], heatmaps.shape[-1])
        xy = scale_keypoints(xy, hm_hw, image_hw)
    return xy, conf


__all__ = ["decode_keypoints"]

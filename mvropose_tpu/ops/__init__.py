"""Pallas TPU kernels for the hot non-matmul ops.

The matmul-heavy path (ViT, heads) belongs to XLA; these kernels cover the
ops XLA fuses poorly or that the reference performed on host:
  * fused_peak_decode - heatmap -> (argmax xy, soft-argmax xy, confidence)
    in one VMEM pass (replaces the host unravel_index loop of the reference,
    /root/reference/model/Fr5_model_train.ipynb cell 14).
  * render_heatmaps_pallas - gaussian GT rendering on device.

Every kernel has a pure-jnp reference implementation in mvropose_tpu.geometry
and is tested against it; `use_pallas=False` falls back (e.g. on CPU test
meshes, where Pallas runs in interpret mode instead).
"""

from mvropose_tpu.ops.peak_decode import fused_peak_decode
from mvropose_tpu.ops.heatmap_render import render_heatmaps_pallas

__all__ = ["fused_peak_decode", "render_heatmaps_pallas"]

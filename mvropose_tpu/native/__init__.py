"""ctypes bindings for the native host-runtime library (libmvropose).

Builds on demand with g++ (cached .so next to the package); every entry has
a pure-Python/numpy fallback so the framework works without a toolchain.
"""

from mvropose_tpu.native.lib import (
    load_native,
    native_available,
    match_nearest_native,
    render_heatmaps_native,
    FrameRing,
)

__all__ = [
    "load_native",
    "native_available",
    "match_nearest_native",
    "render_heatmaps_native",
    "FrameRing",
]

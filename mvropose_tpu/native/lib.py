"""Build + bind libmvropose_native.so via ctypes."""

from __future__ import annotations

import ctypes
import functools
import subprocess
import threading
from pathlib import Path

import numpy as np

# Repo checkout keeps the canonical source in top-level native/; installed
# wheels ship a copy as package data next to this file (pyproject.toml).
_SRC = next(
    (
        p
        for p in (
            Path(__file__).resolve().parents[2] / "native" / "mvropose_native.cpp",
            Path(__file__).resolve().parent / "mvropose_native.cpp",
        )
        if p.exists()
    ),
    Path(__file__).resolve().parent / "mvropose_native.cpp",
)
_SO = Path(__file__).resolve().parent / "libmvropose_native.so"
_build_lock = threading.Lock()


def _build() -> bool:
    if not _SRC.exists():
        return False
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        str(_SRC), "-o", str(_SO),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError, subprocess.TimeoutExpired):
        return False


@functools.lru_cache(maxsize=1)
def load_native() -> ctypes.CDLL | None:
    with _build_lock:
        if not _SO.exists() or (_SRC.exists() and _SRC.stat().st_mtime > _SO.stat().st_mtime):
            if not _build() and not _SO.exists():
                # No toolchain AND no prior artifact - genuinely unavailable.
                # (A failed REbuild with a stale-but-loadable .so on disk
                # falls through and loads it: git checkouts don't preserve
                # mtimes, so 'source newer than .so' happens on fresh clones
                # with no compiler, and refusing would disable the native
                # path a usable artifact could serve.)
                return None
        try:
            lib = ctypes.CDLL(str(_SO))
        except OSError:
            return None

    lib.match_nearest_f64.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.c_double,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.render_heatmaps_f32.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_float,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.frame_ring_create.restype = ctypes.c_void_p
    lib.frame_ring_create.argtypes = [ctypes.c_int64]
    lib.frame_ring_destroy.argtypes = [ctypes.c_void_p]
    lib.frame_ring_write.restype = ctypes.c_int
    lib.frame_ring_write.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_double,
    ]
    lib.frame_ring_read.restype = ctypes.c_int64
    lib.frame_ring_read.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
    ]
    lib.frame_ring_seq.restype = ctypes.c_uint64
    lib.frame_ring_seq.argtypes = [ctypes.c_void_p]
    return lib


def native_available() -> bool:
    return load_native() is not None


def match_nearest_native(query, ref, tolerance_s: float):
    """Native nearest-timestamp matcher; same contract as data.sync.match_nearest."""
    lib = load_native()
    query = np.ascontiguousarray(query, dtype=np.float64)
    ref = np.ascontiguousarray(ref, dtype=np.float64)
    if lib is None:
        from mvropose_tpu.data.sync import match_nearest

        return match_nearest(query, ref, tolerance_s)
    idx = np.zeros(len(query), np.int64)
    valid = np.zeros(len(query), np.uint8)
    lib.match_nearest_f64(
        query.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(query),
        ref.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(ref),
        tolerance_s,
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        valid.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return idx, valid.astype(bool)


def render_heatmaps_native(keypoints, height: int, width: int, sigma: float):
    """Native gaussian heatmap render; (..., 2) -> (..., H, W) float32."""
    lib = load_native()
    kp = np.ascontiguousarray(keypoints, dtype=np.float32)
    lead = kp.shape[:-1]
    flat = kp.reshape(-1, 2)
    if lib is None:
        import jax.numpy as jnp

        from mvropose_tpu.geometry.heatmap import render_heatmaps

        return np.asarray(render_heatmaps(jnp.asarray(kp), height, width, sigma))
    out = np.zeros((flat.shape[0], height, width), np.float32)
    lib.render_heatmaps_f32(
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), flat.shape[0],
        height, width, sigma,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out.reshape(*lead, height, width)


class FrameRing:
    """Seqlock latest-frame mailbox over native memory (SPSC, torn-read free)."""

    def __init__(self, capacity_bytes: int):
        self._lib = load_native()
        if self._lib is None:
            raise RuntimeError("native library unavailable (g++ missing?)")
        self._ring = self._lib.frame_ring_create(capacity_bytes)
        self.capacity = capacity_bytes

    def write(self, frame: np.ndarray, timestamp: float) -> bool:
        buf = np.ascontiguousarray(frame, dtype=np.uint8)
        rc = self._lib.frame_ring_write(
            self._ring,
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            buf.nbytes,
            timestamp,
        )
        return rc == 0

    def read(self, shape, max_retries: int = 64):
        """-> (frame ndarray, timestamp) or None if nothing published yet."""
        out = np.empty(shape, np.uint8)
        ts = ctypes.c_double(0.0)
        n = self._lib.frame_ring_read(
            self._ring,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            out.nbytes,
            ctypes.byref(ts),
            max_retries,
        )
        if n == -1 or (n > 0 and n != out.nbytes):
            # The producer published a different frame size than this reader
            # expects - a rig misconfiguration, not an empty ring; surfacing
            # it as None would read as "no frame" forever.
            raise BufferError(
                f"FrameRing size mismatch: published {n} bytes, reader "
                f"expects {out.nbytes} (shape {tuple(shape)})"
            )
        if n <= 0:  # 0 = nothing published yet, -2 = contended past retries
            return None
        return out, ts.value

    @property
    def seq(self) -> int:
        return int(self._lib.frame_ring_seq(self._ring))

    def __del__(self):
        if getattr(self, "_ring", None) and self._lib is not None:
            self._lib.frame_ring_destroy(self._ring)
            self._ring = None

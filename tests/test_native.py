"""Native C++ runtime vs Python/jnp reference implementations."""

import threading
import time

import numpy as np
import pytest

import jax.numpy as jnp

from mvropose_tpu.native import (
    native_available,
    match_nearest_native,
    render_heatmaps_native,
    FrameRing,
)
from mvropose_tpu.data.sync import match_nearest
from mvropose_tpu.geometry.heatmap import render_heatmaps

pytestmark = pytest.mark.skipif(not native_available(), reason="g++ unavailable")


def test_native_match_nearest_parity(rng):
    ref = np.sort(rng.uniform(0, 100, size=500))
    q = rng.uniform(-5, 105, size=300)
    idx_n, val_n = match_nearest_native(q, ref, 0.1)
    idx_p, val_p = match_nearest(q, ref, 0.1)
    np.testing.assert_array_equal(idx_n, idx_p)
    np.testing.assert_array_equal(val_n, val_p)


def test_native_match_nearest_empty():
    idx, valid = match_nearest_native(np.array([1.0]), np.array([]), 0.1)
    assert not valid.any()


def test_native_render_parity(rng):
    kps = rng.uniform(0, 63, size=(3, 5, 2)).astype(np.float32)
    got = render_heatmaps_native(kps, 64, 64, 3.0)
    want = np.asarray(render_heatmaps(jnp.asarray(kps), 64, 64, sigma=3.0))
    assert got.shape == (3, 5, 64, 64)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_frame_ring_roundtrip():
    ring = FrameRing(64 * 64 * 3)
    assert ring.read((64, 64, 3)) is None  # nothing yet
    frame = np.arange(64 * 64 * 3, dtype=np.uint8).reshape(64, 64, 3)
    assert ring.write(frame, 123.5)
    out = ring.read((64, 64, 3))
    assert out is not None
    got, ts = out
    np.testing.assert_array_equal(got, frame)
    assert ts == 123.5


def test_frame_ring_rejects_oversize():
    ring = FrameRing(16)
    assert not ring.write(np.zeros(32, np.uint8), 0.0)


def test_frame_ring_no_torn_reads_under_contention():
    """Writer hammers alternating solid frames; reader must only ever see a
    uniform frame (the exact race the reference's unlocked shared frame had)."""
    shape = (32, 32, 3)
    ring = FrameRing(int(np.prod(shape)))
    stop = threading.Event()
    frames = [np.full(shape, v, np.uint8) for v in (0, 255)]

    def writer():
        i = 0
        while not stop.is_set():
            ring.write(frames[i & 1], float(i))
            i += 1

    t = threading.Thread(target=writer)
    t.start()
    try:
        torn = 0
        reads = 0
        # Generous deadline with an early exit: under a loaded box (full
        # suite + a background TPU run) the spinning writer can starve the
        # reader for a while; the property under test is torn == 0, the
        # read-count floor only guards against a dead ring.
        deadline = time.time() + 10.0
        while time.time() < deadline and reads < 500:
            out = ring.read(shape)
            if out is None:
                continue
            got, _ = out
            reads += 1
            u = np.unique(got)
            if len(u) != 1:
                torn += 1
        assert reads > 50, f"only {reads} successful reads"
        assert torn == 0, f"{torn}/{reads} torn reads"
    finally:
        stop.set()
        t.join()


def test_packaged_native_source_in_sync():
    """The wheel ships a copy of the C++ source as package data
    (pyproject.toml [tool.setuptools.package-data], materialized from a repo
    symlink); lib.py self-builds from whichever copy exists. Guard against
    the two drifting (e.g. a checkout that materializes the symlink as a
    regular file and then edits only one side)."""
    from pathlib import Path

    import mvropose_tpu.native.lib as nlib

    pkg_copy = Path(nlib.__file__).resolve().parent / "mvropose_native.cpp"
    repo_src = Path(nlib.__file__).resolve().parents[2] / "native" / "mvropose_native.cpp"
    assert nlib._SRC.exists()
    if pkg_copy.exists() and repo_src.exists():
        assert pkg_copy.read_bytes() == repo_src.read_bytes()


def test_frame_ring_size_mismatch_is_loud():
    """A producer publishing a different frame size than the reader expects
    is a rig misconfiguration - it must raise, not read as an eternally
    empty ring (None)."""
    import pytest

    from mvropose_tpu.native.lib import FrameRing, native_available

    if not native_available():
        pytest.skip("no native toolchain")
    ring = FrameRing(64 * 64 * 3)
    ring.write(np.zeros((32, 32, 3), np.uint8), 1.0)
    with pytest.raises(BufferError, match="size mismatch"):
        ring.read((64, 64, 3))
    # Matching shape reads fine.
    out = ring.read((32, 32, 3))
    assert out is not None and out[0].shape == (32, 32, 3)

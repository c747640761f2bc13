"""Rig layer: replay/synthetic sources, streaming loop, failure handling."""

import time

import numpy as np
import pytest

from mvropose_tpu.rig import (
    FileReplaySource,
    SyntheticSource,
    StreamingPipeline,
    tile_frames,
    draw_keypoints_overlay,
)


def test_file_replay_source(tmp_path):
    import cv2

    paths = []
    for i in range(3):
        p = tmp_path / f"f{i}.jpg"
        cv2.imwrite(str(p), np.full((16, 24, 3), i * 40, np.uint8))
        paths.append(p)
    src = FileReplaySource("123", paths, fps=200.0)
    src.start()
    try:
        deadline = time.time() + 5
        while src.latest() is None and time.time() < deadline:
            time.sleep(0.01)
        f = src.latest()
        assert f is not None
        assert f.image.shape == (16, 24, 3)
        assert f.serial == "123"
    finally:
        src.stop()


def test_file_replay_source_missing_files():
    src = FileReplaySource("999", ["/nonexistent/a.jpg"], fps=30.0)
    src.start()
    deadline = time.time() + 5
    while not (src.is_ready or src.initialization_failed) and time.time() < deadline:
        time.sleep(0.01)
    assert src.initialization_failed
    src.stop()


def test_streaming_pipeline_batches_all_cameras():
    hw = (16, 24)
    sources = [SyntheticSource(f"cam{i}", hw=hw, fps=500.0) for i in range(3)]
    sources.append(FileReplaySource("dead", ["/nope.jpg"]))  # failing camera

    calls = []

    def infer_fn(images, mask):
        calls.append((images.shape, mask.copy()))
        return mask.sum()

    pipe = StreamingPipeline(sources, infer_fn, frame_hw=hw, init_timeout_s=5.0)
    pipe.start()
    try:
        assert len(pipe.active) == 3
        assert len(pipe.failed) == 1
        deadline = time.time() + 5
        while not all(s.latest() is not None for s in sources[:3]) and time.time() < deadline:
            time.sleep(0.01)
        stats = pipe.run(max_ticks=5)
    finally:
        pipe.stop()
    assert stats.ticks == 5
    # One batched call per tick covering ALL cameras (not per-camera calls).
    shape, mask = calls[0]
    assert shape == (4, *hw, 3)
    assert mask[:3].all() and not mask[3]
    # frames_processed deduplicates by Frame.seq: 5 ticks faster than the
    # cameras produce must NOT claim 15 camera frames (the old stat counted
    # mask bits per tick, inflating camera_fps above the sources' real
    # rate); each live camera contributes at least its first frame.
    assert 3 <= stats.frames_processed <= 15


def test_tile_frames_layout_and_placeholder():
    hw = (20, 30)
    frames = {
        "top": np.zeros((*hw, 3), np.uint8),
        "left": np.zeros((*hw, 3), np.uint8),
        "right": None,  # failed camera -> placeholder
    }
    canvas = tile_frames(frames, frame_hw=hw, max_wh=(1000, 1000))
    assert canvas.ndim == 3
    assert canvas.shape[0] == 40  # two rows of height 20
    assert canvas.shape[1] == 60  # bottom row 2x30 wide


def test_draw_keypoints_skips_low_confidence():
    img = np.zeros((32, 32, 3), np.uint8)
    kps = np.array([[5.0, 5.0], [20.0, 20.0]])
    out = draw_keypoints_overlay(
        img, kps, links=[(0, 1)], scores=np.array([0.9, 0.1]), min_score=0.5
    )
    assert out[5, 5].tolist() == [0, 255, 0]
    assert out[20, 20].tolist() == [0, 0, 0]  # low-confidence point not drawn


def test_streaming_pipeline_staleness_gate():
    """A camera whose frames are stale gets masked for the tick."""
    import time as _time

    from mvropose_tpu.rig.source import _MailboxSource

    class FrozenSource(_MailboxSource):
        """Publishes one frame then stops updating (stale camera)."""

        def __init__(self, serial, hw, ts):
            super().__init__(serial)
            self._hw = hw
            self._ts = ts

        def _run(self):
            self._ready = True
            self._publish(np.zeros((*self._hw, 3), np.uint8), self._ts)
            while not self._stop.is_set():
                _time.sleep(0.01)

    hw = (8, 12)
    now = _time.time()
    fresh = FrozenSource("fresh", hw, now)
    stale = FrozenSource("stale", hw, now - 5.0)

    masks = []

    def infer(images, mask):
        masks.append(mask.copy())
        return None

    pipe = StreamingPipeline([fresh, stale], infer, frame_hw=hw, max_skew_s=0.5)
    pipe.start()
    try:
        deadline = _time.time() + 5
        while _time.time() < deadline:
            if pipe.tick() is not None or masks:
                break
            _time.sleep(0.01)
    finally:
        pipe.stop()
    assert masks, "no tick ran"
    assert masks[0].tolist() == [True, False]


def test_streaming_pipeline_double_buffer_overlaps():
    """Double-buffered mode: host work of set N+1 runs while the 'device'
    computes set N, so wall time approaches max(host, device) per tick, not
    host + device. Simulated with a dispatch that completes on a background
    timer (async device) and a fetch that joins it (blocking fetch)."""
    import threading

    hw = (8, 8)
    sources = [SyntheticSource("cam0", hw=hw, fps=2000.0)]
    HOST_S, DEVICE_S = 0.02, 0.02
    N = 10
    seq = {"n": 0}

    def dispatch(images, mask):
        time.sleep(HOST_S)  # host preprocess (undistort/H2D stand-in)
        done = threading.Event()
        t = threading.Timer(DEVICE_S, done.set)  # device computes async
        t.start()
        seq["n"] += 1
        return (done, seq["n"])

    def fetch(handle):
        done, i = handle
        done.wait()  # blocking device->host fetch
        return i

    delivered = []
    pipe = StreamingPipeline(
        sources, dispatch,
        on_result=lambda r, f: delivered.append(r),
        frame_hw=hw, fetch_fn=fetch,
    )
    pipe.start()
    try:
        while sources[0].latest() is None:
            time.sleep(0.005)
        t0 = time.perf_counter()
        stats = pipe.run(max_ticks=N)
        wall = time.perf_counter() - t0
    finally:
        pipe.stop()

    assert stats.ticks == N
    assert stats.overlapped
    # Every dispatched set is delivered exactly once, in order (incl. drain).
    assert delivered == list(range(1, N + 1))
    serial = N * (HOST_S + DEVICE_S)
    # True overlap: wall well under the serial sum (allow scheduler slack).
    assert wall < 0.8 * serial, (wall, serial)
    # And the phase accounting shows both phases paid in full.
    assert stats.total_step_time_s >= N * HOST_S * 0.9


def test_worker_exception_marks_source_failed():
    """A source worker that dies on an uncaught exception must flag
    initialization_failed instead of leaving the source in limbo (neither
    ready nor failed), which made the pipeline block its full init timeout
    before misclassifying it."""
    from mvropose_tpu.rig.source import _MailboxSource

    class Exploding(_MailboxSource):
        def _run(self):
            raise ValueError("boom")

    src = Exploding("s1")
    src.start()
    deadline = time.time() + 5
    while not src.initialization_failed and time.time() < deadline:
        time.sleep(0.01)
    assert src.initialization_failed and not src.is_ready

    # And the pipeline classifies it promptly (well under init_timeout_s).
    t0 = time.time()
    pipe = StreamingPipeline([Exploding("s2")], lambda im, m: None,
                             frame_hw=(8, 8), init_timeout_s=10.0)
    pipe.start()
    try:
        assert time.time() - t0 < 5.0
        assert len(pipe.failed) == 1 and not pipe.active
    finally:
        pipe.stop()


def test_source_restart_after_stop():
    """stop() then start() must spawn a live worker again (the stop event is
    cleared), not a thread that exits on its first loop check while the
    source still claims to be ready with a stale frame."""
    src = SyntheticSource("cam", hw=(8, 8), fps=500.0)
    src.start()
    deadline = time.time() + 5
    while src.latest() is None and time.time() < deadline:
        time.sleep(0.01)
    src.stop()
    seq_at_stop = src.latest().seq
    src.start()
    try:
        deadline = time.time() + 5
        while src.latest().seq == seq_at_stop and time.time() < deadline:
            time.sleep(0.01)
        assert src.latest().seq > seq_at_stop, "restarted worker never published"
    finally:
        src.stop()


def test_run_duration_zero_returns_immediately():
    src = SyntheticSource("cam", hw=(8, 8), fps=500.0)
    pipe = StreamingPipeline([src], lambda im, m: None, frame_hw=(8, 8))
    pipe.start()
    try:
        t0 = time.time()
        stats = pipe.run(duration_s=0.0)
        assert time.time() - t0 < 1.0
        assert stats.ticks == 0
    finally:
        pipe.stop()


def test_resolution_mismatch_counted_not_silent():
    """Frames whose size differs from frame_hw are dropped but COUNTED, so
    a misconfigured rig is diagnosable instead of a silent infinite spin."""
    src = SyntheticSource("cam", hw=(16, 16), fps=500.0)
    pipe = StreamingPipeline([src], lambda im, m: None, frame_hw=(8, 8))
    pipe.start()
    try:
        deadline = time.time() + 5
        while src.latest() is None and time.time() < deadline:
            time.sleep(0.01)
        assert pipe.tick() is None
        assert pipe.stats.skipped_resolution >= 1
    finally:
        pipe.stop()


def test_double_buffer_drains_pending_when_sources_stall():
    """A dispatched set must not be withheld when the cameras stall: the
    next tick with no new frames fetches and delivers the pending set (the
    consumer most needs the last pose exactly when cameras misbehave)."""
    hw = (8, 8)
    src = SyntheticSource("cam", hw=hw, fps=500.0)
    delivered = []

    pipe = StreamingPipeline(
        [src], lambda im, m: ("handle", int(m.sum())),
        on_result=lambda r, f: delivered.append(r),
        frame_hw=hw, fetch_fn=lambda h: ("fetched", h[1]),
    )
    pipe.start()
    try:
        deadline = time.time() + 5
        while src.latest() is None and time.time() < deadline:
            time.sleep(0.01)
        assert pipe.tick() is None  # set 0 dispatched, nothing to fetch yet
        assert pipe._pending is not None
        src.stop()  # cameras die; mailbox keeps the stale frame
        # Simulate total stall: empty the mailbox so the gather sees nothing.
        with src._lock:
            src._frame = None
        out = pipe.tick()  # no new frames -> drains set 0
        assert out == ("fetched", 1)
        assert delivered == [("fetched", 1)]
        assert pipe._pending is None
    finally:
        pipe.stop()

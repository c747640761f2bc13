"""Stage timing harness + jax.profiler integration.

Replaces the reference's manual time.time() + cuda.synchronize() brackets
(/root/reference/model/MV-model.ipynb cell 4, 382-446). Stages are named jit
scopes: under `StageTimer.stage(name)` the wall time (with a
block_until_ready on the stage output) is accumulated, and the same names
appear in jax.profiler traces via jax.named_scope.

CAVEAT: on the tunneled-TPU (axon) backend `jax.block_until_ready` does NOT
synchronize, so StageTimer numbers there measure dispatch only. For honest
device timings in that environment use the chained-dependency + scalar-fetch
pattern in bench.py/bench_train.py; on real (non-tunneled) TPU/CPU backends
StageTimer is accurate.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Iterator

import jax


class StageTimer:
    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        """Time a named stage (wall time of the enclosed block; for device
        work prefer `timed`, which blocks on the result). The name also
        becomes a jax.named_scope, so it shows up in profiler traces."""
        with jax.named_scope(name):
            t0 = time.perf_counter()
            yield
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def timed(self, name: str, fn, *args, **kwargs):
        """Run fn, block on its result, record the wall time."""
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1
        return out

    def report(self) -> dict[str, dict[str, float]]:
        return {
            name: {
                "total_s": self.totals[name],
                "count": self.counts[name],
                "mean_s": self.totals[name] / max(self.counts[name], 1),
            }
            for name in self.totals
        }

    def summary(self) -> str:
        lines = []
        for name, r in sorted(self.report().items(), key=lambda kv: -kv[1]["total_s"]):
            lines.append(
                f"{name:30s} total {r['total_s']:8.3f}s  n={r['count']:5d}  mean {r['mean_s'] * 1e3:8.2f}ms"
            )
        return "\n".join(lines)


@contextlib.contextmanager
def profile_trace(log_dir: str) -> Iterator[None]:
    """jax.profiler trace context (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

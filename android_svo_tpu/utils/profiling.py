"""Per-stage timing instrumentation — the rebuild of the reference's
`SVO_START_TIMER/SVO_STOP_TIMER` scaffolding, whose implementation
(`vk::PerformanceMonitor`) was never vendored and whose `SVO_TRACE` gate is
never defined (SURVEY.md §5: "the instrumentation points are the spec").

We register the reference's 10 timer names (`frame_handler_base.cpp:46-55`)
for per-stage comparability, add TPU-side `jax.profiler` trace annotations,
and emit a per-frame trace file in the same spirit as
`PerformanceMonitor::writeToFile` (frame_handler_base.cpp:126-132).

NOTE: stages fused into one jitted program can't be timed separately from
the host; host timers measure whole dispatches (e.g. `tot_time`), while
stage-level attribution comes from `jax.profiler` device traces.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict

import jax

# ref frame_handler_base.cpp:46-55
REFERENCE_TIMERS = (
    "pyramid_creation", "sparse_img_align", "reproject", "reproject_kfs",
    "reproject_candidates", "feature_align", "pose_optimizer",
    "point_optimizer", "local_ba", "tot_time",
)


class PerformanceMonitor:
    """Named host-side timers + per-frame log channels, JSONL trace output."""

    def __init__(self, trace_path: str | None = None):
        self.trace_path = trace_path
        self._file = open(trace_path, "w") if trace_path else None
        self.timers: dict[str, float] = {}
        self.logs: dict[str, object] = {}
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)
        for name in REFERENCE_TIMERS:
            self.add_timer(name)

    def add_timer(self, name: str) -> None:
        self.timers.setdefault(name, 0.0)

    @contextlib.contextmanager
    def timer(self, name: str):
        """Host wall-clock timer + device trace annotation."""
        with jax.profiler.TraceAnnotation(name):
            t0 = time.perf_counter()
            try:
                yield
            finally:
                dt = time.perf_counter() - t0
                self.timers[name] = dt
                self.totals[name] += dt
                self.counts[name] += 1

    def log(self, name: str, value) -> None:
        self.logs[name] = value

    def write_frame(self) -> None:
        """Flush one frame's timers+logs (ref writeToFile per frame)."""
        if self._file is None:
            return
        rec = {**{f"t_{k}": v for k, v in self.timers.items() if v > 0},
               **self.logs}
        self._file.write(json.dumps(rec) + "\n")
        self.timers = {k: 0.0 for k in self.timers}
        self.logs = {}

    def summary(self) -> dict:
        return {k: {"total_s": self.totals[k],
                    "mean_ms": 1e3 * self.totals[k] / max(self.counts[k], 1),
                    "count": self.counts[k]}
                for k in self.totals}

    def close(self):
        if self._file:
            self._file.close()
            self._file = None


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a jax.profiler device trace (open with TensorBoard/xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

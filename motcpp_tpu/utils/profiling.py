"""Tracing / profiling helpers.

The reference has no in-library tracing (SURVEY.md §5 — FPS was
measured externally). Here: a per-frame step timer reporting the
streams x FPS headline, and a thin wrapper over ``jax.profiler`` for
XPlane traces viewable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import time

import numpy as np


class FrameTimer:
    """Accumulates per-frame wall times; reports throughput.

    Example:
        timer = FrameTimer(n_streams=256)
        for frame in frames:
            with timer:
                out = tracker.update(...)
        print(timer.report())
    """

    def __init__(self, n_streams: int = 1):
        self.n_streams = n_streams
        self.times: list[float] = []
        self._t0 = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)
        return False

    @property
    def fps(self) -> float:
        if not self.times:
            return 0.0
        return self.n_streams * len(self.times) / sum(self.times)

    def report(self) -> dict:
        t = np.asarray(self.times)
        if t.size == 0:
            return {}
        return dict(
            frames=len(t),
            streams=self.n_streams,
            mean_ms=float(t.mean() * 1e3),
            p50_ms=float(np.percentile(t, 50) * 1e3),
            p95_ms=float(np.percentile(t, 95) * 1e3),
            aggregate_fps=float(self.fps),
            streams_at_30fps=float(self.fps / 30.0),
        )


@contextlib.contextmanager
def trace(logdir: str = "/tmp/motcpp_trace"):
    """XPlane trace context (open in TensorBoard's profile plugin or
    Perfetto). No-op if the profiler cannot start (e.g. remote backend
    limitations)."""
    import jax

    started = False
    try:
        jax.profiler.start_trace(logdir)
        started = True
    except Exception:
        pass
    try:
        yield logdir
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass

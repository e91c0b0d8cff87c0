"""Profiling hooks: jax.profiler traces + lightweight stage timers.

An upgrade over the reference's tqdm/wall-clock prints (SURVEY.md §5
tracing): wrap any region in `trace(logdir)` to capture a TensorBoard-
viewable XLA trace, and use StageTimer in the video pipeline to report
per-stage (decode/infer/encode) time.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


@contextlib.contextmanager
def trace(logdir: str | None):
    """jax.profiler trace context; no-op when logdir is falsy."""
    if not logdir:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> dict:
        return {
            name: {
                "total_s": round(self.totals[name], 4),
                "count": self.counts[name],
                "mean_ms": round(self.totals[name] / max(1, self.counts[name]) * 1e3, 3),
            }
            for name in self.totals
        }

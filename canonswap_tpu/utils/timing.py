"""Tracing / profiling: per-stage wall-clock + optional jax.profiler traces.

Replaces the reference's Timer (src/utils/timer.py:10-29) and extends it into
the structured per-stage observability SURVEY.md §5 calls for: named stage
timers, frames/sec counters, and a context manager that can capture a
jax.profiler trace for offline analysis.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class StageTimer:
    """Accumulates wall-clock per named stage; reports fps per stage."""

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)
        self.items: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, items: int = 0):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1
            self.items[name] += items

    def tic(self):
        self._t0 = time.perf_counter()

    def toc(self) -> float:
        return time.perf_counter() - self._t0

    def report(self) -> str:
        lines = []
        for name, total in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            line = f"{name:30s} {total:8.3f}s  x{self.counts[name]}"
            if self.items[name]:
                line += f"  {self.items[name] / total:8.1f} items/s"
            lines.append(line)
        return "\n".join(lines)


@contextlib.contextmanager
def profile_trace(log_dir: str | None):
    """Capture a jax.profiler trace when log_dir is set; no-op otherwise."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

"""Tracing / profiling hooks.

The reference has no timing instrumentation at all — only unconditional
stdout prints (SURVEY.md §5.1). Here every pipeline stage can be wrapped
in a :class:`StageTimer`, global counters accumulate per-event statistics,
and :func:`profile_trace` wires into ``jax.profiler`` for device-level
traces viewable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator

# Global event counters: counters["keyframe_added"] += 1 etc.
counters: Dict[str, float] = defaultdict(float)


class StageTimer:
    """Accumulating wall-clock timer per named stage.

    >>> timer = StageTimer()
    >>> with timer.stage("icp"):
    ...     run_icp()
    >>> timer.summary()
    {'icp': {'count': 1, 'total_s': ..., 'mean_ms': ...}}
    """

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                "count": self.counts[name],
                "total_s": round(self.totals[name], 4),
                "mean_ms": round(1e3 * self.totals[name]
                                 / max(self.counts[name], 1), 3),
            }
            for name in self.totals
        }

    def reset(self) -> None:
        self.totals.clear()
        self.counts.clear()


@contextlib.contextmanager
def profile_trace(logdir: str) -> Iterator[None]:
    """Capture a jax.profiler device trace for the enclosed block."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

"""Profiling/observability: per-stage timers + jax profiler hooks.

The reference has no tracing at all (SURVEY §5); here profiling is a
first-class utility: cheap wall-clock stage timers that the engine
maintains (SlamEngine.timings), a context manager for jax's XLA profiler
(view in TensorBoard / xprof), and a convenience report."""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional


class StageTimer:
    """Accumulating wall-clock timers keyed by stage name."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def time(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            t, c = self.totals[name], self.counts[name]
            lines.append(f"{name:>16}: {t:8.3f}s total, {c:6d} calls, "
                         f"{1000 * t / max(c, 1):8.2f} ms/call")
        return "\n".join(lines)


@contextlib.contextmanager
def xla_trace(logdir: Optional[str]):
    """Capture an XLA device trace (open with TensorBoard's profile tab).
    No-op when logdir is None."""
    if logdir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

"""Observability: stage timers, throughput counters, device profiler.

The reference has no tracing/profiling at all (SURVEY.md §5); these are
the TPU-build equivalents promised there: jax.profiler traces for device
timelines plus lightweight host-side counters.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional


class StageTimers:
    """Accumulating wall-clock timers keyed by stage name."""

    def __init__(self) -> None:
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            t = self.totals[name]
            n = self.counts[name]
            lines.append(f"{name:24s} {t*1e3:9.1f} ms total  "
                         f"{t/n*1e3:8.2f} ms/call  x{n}")
        return "\n".join(lines)


class ThroughputCounter:
    """images/sec over a sliding horizon."""

    def __init__(self, horizon_seconds: float = 30.0) -> None:
        self.horizon = horizon_seconds
        self._events = []  # (t, n)

    def add(self, n: int) -> None:
        now = time.time()
        self._events.append((now, n))
        cutoff = now - self.horizon
        while self._events and self._events[0][0] < cutoff:
            self._events.pop(0)

    def rate(self) -> float:
        if len(self._events) < 2:
            return 0.0
        t0 = self._events[0][0]
        t1 = self._events[-1][0]
        n = sum(n for (_t, n) in self._events[1:])
        return n / max(t1 - t0, 1e-9)


@contextlib.contextmanager
def device_trace(log_dir: Optional[str] = None) -> Iterator[None]:
    """jax.profiler trace scope (view with TensorBoard / xprof)."""
    import jax

    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

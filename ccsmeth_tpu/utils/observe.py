"""Observability: per-stage throughput counters + jax.profiler tracing.

The reference has no tracing/metrics beyond wall-clock logs (SURVEY.md §5.1); this
engine reports periodic reads/s / sites/s per pipeline stage and can capture a
device trace for TensorBoard/xprof.
"""

from __future__ import annotations

import contextlib
import time

from .logging import mylogger

LOGGER = mylogger(__name__)


class ThroughputMeter:
    """Counts named events and logs rates every ``interval`` seconds."""

    def __init__(self, name: str, interval: float = 30.0):
        self.name = name
        self.interval = interval
        self.t0 = time.time()
        self._last = self.t0
        self.counts: dict[str, int] = {}

    def add(self, key: str, n: int = 1) -> None:
        self.counts[key] = self.counts.get(key, 0) + n
        now = time.time()
        if now - self._last >= self.interval:
            self._last = now
            self.log()

    def rate(self, key: str) -> float:
        dt = time.time() - self.t0
        return self.counts.get(key, 0) / dt if dt > 0 else 0.0

    def log(self) -> None:
        dt = time.time() - self.t0
        parts = ["{}={} ({:.1f}/s)".format(k, v, v / dt if dt > 0 else 0.0)
                 for k, v in sorted(self.counts.items())]
        LOGGER.info("[%s] %s, elapsed %.1fs", self.name, ", ".join(parts), dt)


@contextlib.contextmanager
def device_trace(trace_dir: str | None):
    """jax.profiler trace context; no-op when trace_dir is None."""
    if not trace_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(trace_dir)
    LOGGER.info("jax profiler trace -> %s", trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        LOGGER.info("jax profiler trace saved to %s", trace_dir)

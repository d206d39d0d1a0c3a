"""Tracing / profiling / metrics.

The reference's observability is GPU timestamps + a gigainstruction
accounting model + CSV prints (SquareAttentionTest.swift:724-761,
README.md:104-133). TPU equivalents here:

- :func:`trace` — jax.profiler trace context (xplane dumps for tensorboard)
- roofline accounting lives in utils/roofline.py (same instruction model)
- :class:`Metrics` — counters/gauges for the serving path (the C++ side
  logs cache hit/miss the same way the reference's GEMMShaderCache.cpp:14-17
  does)
"""

from __future__ import annotations

import contextlib
import threading
import time
from collections import defaultdict

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/mfa_tpu_trace"):
    """Capture a jax.profiler trace around a region (view in tensorboard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class Metrics:
    """Thread-safe counters + gauges + latency histograms (coarse)."""

    def __init__(self):
        self._lock = threading.Lock()
        self.counters: dict = defaultdict(int)
        self.gauges: dict = {}
        self.latencies: dict = defaultdict(list)

    def inc(self, name: str, value: int = 1):
        with self._lock:
            self.counters[name] += value

    def set(self, name: str, value):
        with self._lock:
            self.gauges[name] = value

    @contextlib.contextmanager
    def timed(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            with self._lock:
                self.latencies[name].append(time.perf_counter() - t0)

    def snapshot(self) -> dict:
        with self._lock:
            lat = {
                k: {
                    "count": len(v),
                    "mean_ms": 1e3 * sum(v) / len(v),
                    "max_ms": 1e3 * max(v),
                }
                for k, v in self.latencies.items() if v
            }
            return {
                "counters": dict(self.counters),
                "gauges": dict(self.gauges),
                "latencies": lat,
            }


metrics = Metrics()

"""Profiler hooks: jax.profiler traces + iteration-rate counters.

The reference's only timing instrumentation is `%%time` cell magics
(SURVEY §5). Here: a context manager around `jax.profiler.trace` for
TensorBoard-viewable device traces, `annotate` for named trace regions,
and a simple iterations/s counter used by the benchmark harness.
"""

from __future__ import annotations

import time
from contextlib import contextmanager
from typing import Optional

import jax


@contextmanager
def device_trace(logdir: str, host_tracer_level: int = 2):
    """Capture a jax.profiler trace (open in TensorBoard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace region (shows up in the profiler timeline)."""
    return jax.profiler.TraceAnnotation(name)


class RateCounter:
    """iterations/s counter with warmup exclusion."""

    def __init__(self):
        self._t0: Optional[float] = None
        self._units = 0.0

    def start(self):
        self._t0 = time.perf_counter()
        self._units = 0.0

    def add(self, units: float):
        self._units += units

    @property
    def rate(self) -> float:
        if self._t0 is None:
            return 0.0
        dt = time.perf_counter() - self._t0
        return self._units / dt if dt > 0 else 0.0

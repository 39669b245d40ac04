"""Profiling / tracing hooks.

The reference has no profiling subsystem (SURVEY.md §5); its only debug
surface is the `return_model_detail` dict of intermediate shapes
(model.py:140,156-167), which this framework keeps (speechmix_forward
`return_model_detail=True`).  On top of that:

  * trace(ctx): jax.profiler trace context writing TensorBoard-compatible
    traces (xplane) for TPU timeline inspection
  * annotate(name): TraceAnnotation for labeling spans inside jitted code
  * StepTimer: host-side rolling step timing with compile-step detection
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a profiler trace for the enclosed block:
        with profiling.trace('/tmp/trace'):
            train_step(...)
    View with TensorBoard or xprof."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Span annotation visible in profiler timelines."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Rolling wall-clock stats; flags compile steps (>5x median)."""

    def __init__(self, window: int = 50):
        self.window = window
        self.times = []
        self._last = None

    def tick(self) -> Optional[dict]:
        now = time.perf_counter()
        if self._last is None:
            self._last = now
            return None
        dt = now - self._last
        self._last = now
        self.times.append(dt)
        if len(self.times) > self.window:
            self.times.pop(0)
        med = sorted(self.times)[len(self.times) // 2]
        return {
            "step_time_s": dt,
            "median_step_time_s": med,
            "likely_compile": dt > 5 * med and len(self.times) > 3,
        }

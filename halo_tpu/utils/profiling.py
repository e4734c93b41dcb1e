"""Profiling/tracing utilities (SURVEY.md §5: the reference has none; the
TPU build ships jax.profiler traces + step timers)."""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (view with TensorBoard/xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up on the trace timeline."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Wall-clock step timing with EMA throughput; blocks on the given
    array so async dispatch doesn't hide device time."""

    def __init__(self, ema: float = 0.9):
        self.ema = ema
        self.avg_s: Optional[float] = None
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, block_on=None) -> float:
        if block_on is not None:
            jax.block_until_ready(block_on)
        dt = time.perf_counter() - self._t0
        self.avg_s = dt if self.avg_s is None else (
            self.ema * self.avg_s + (1 - self.ema) * dt)
        return dt

    def stats(self, items_per_step: float = 1.0) -> Dict[str, float]:
        if self.avg_s is None:
            return {}
        return {"step_time_s": self.avg_s,
                "throughput": items_per_step / self.avg_s}

"""Profiling / tracing hooks (aux subsystem; the reference has none — only
tqdm bars around hot loops, SURVEY §5).

- :func:`trace` — context manager around ``jax.profiler`` emitting a
  TensorBoard-viewable trace of everything inside.
- :class:`StepTimer` — cheap wall-clock step timing with EMA smoothing,
  used by the Trainer's samples/sec metric.
- :func:`annotate` — named TraceAnnotation for marking regions inside steps.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax

__all__ = ["trace", "annotate", "StepTimer"]


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False) -> Iterator[None]:
    """Capture a device trace into ``log_dir`` (view in TensorBoard)."""
    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region annotation that shows up in profiler traces."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Wall-clock per-step timing with exponential smoothing."""

    def __init__(self, smoothing: float = 0.9):
        self.smoothing = smoothing
        self._last: Optional[float] = None
        self.ema_step_time: Optional[float] = None

    def tick(self) -> Optional[float]:
        now = time.perf_counter()
        dt = None
        if self._last is not None:
            dt = now - self._last
            self.ema_step_time = (
                dt
                if self.ema_step_time is None
                else self.smoothing * self.ema_step_time + (1 - self.smoothing) * dt
            )
        self._last = now
        return dt

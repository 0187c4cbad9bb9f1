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
import gzip
import json
import time
from collections import defaultdict
from pathlib import Path
from typing import Callable, Dict, Iterator, Optional, Tuple

import jax

__all__ = [
    "trace",
    "annotate",
    "StepTimer",
    "categorize_op",
    "parse_trace_categories",
    "profile_categories",
]


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


def categorize_op(name: str) -> str:
    """Device-trace op name → coarse category (the round-1 profiling recipe
    from tools/profile_sampler.py, shared so bench.py's step_budget leg and
    the tools agree on the taxonomy)."""
    n = name.lower()
    # "convolution" before generic substrings: "convert_reduce_fusion" must
    # land in reduce, not conv (a round-3 misattribution that inflated the
    # conv category with GroupNorm stat reductions).
    if "convolution" in n:
        return "conv"
    if "attn" in n or "custom-call" in n:
        return "custom-call"
    for key in ("reduce", "copy", "transpose", "rng", "threefry", "dot",
                "dynamic-slice", "dynamic_update", "scatter", "gather",
                "all-reduce", "bitcast", "broadcast", "iota", "fusion"):
        if key in n:
            return key
    return "other"


def parse_trace_categories(
    trace_dir: Path,
) -> Tuple[float, Dict[str, float], Dict[str, float]]:
    """Sum 'X' (complete) events on the TPU device tracks of a profiler
    trace dir; returns (total_ms, ms_by_category, ms_by_op_name)."""
    files = list(Path(trace_dir).rglob("*.trace.json.gz"))
    if not files:
        raise FileNotFoundError(f"no trace under {trace_dir}")
    with gzip.open(files[0], "rt") as f:
        data = json.load(f)
    events = data["traceEvents"]
    tpu_pids = {
        e["pid"]
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "TPU" in str(e.get("args", {}).get("name", ""))
        and "pjrt" not in str(e.get("args", {}).get("name", "")).lower()
    }
    by_name: Dict[str, float] = defaultdict(float)
    by_cat: Dict[str, float] = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in tpu_pids:
            dur = e.get("dur", 0) / 1e3  # us → ms
            by_name[e["name"]] += dur
            by_cat[categorize_op(e["name"])] += dur
            total += dur
    return total, dict(by_cat), dict(by_name)


def profile_categories(
    run: Callable[[], None],
) -> Tuple[float, Dict[str, float], Dict[str, float]]:
    """Run ``run()`` under ``jax.profiler`` and return the device-time
    summary (total_ms, ms_by_category, ms_by_op_name). ``run`` must block
    until the device work is done (``.block_until_ready()``)."""
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        jax.profiler.start_trace(d)
        try:
            run()
        finally:
            jax.profiler.stop_trace()
        return parse_trace_categories(Path(d))


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

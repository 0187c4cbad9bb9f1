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
    """Sum 'X' (complete) events on the TPU device OP tracks of a profiler
    trace dir; returns (total_ms, ms_by_category, ms_by_op_name).

    The device pid carries several thread tracks: op-level events ("XLA
    Ops") plus whole-execution WRAPPER tracks ("XLA Modules", "Steps") —
    each wrapper event spans an entire module execution, so summing all
    tracks double/triple-counts the run (observed: a 1.18 ms/step sampling
    chain read back as 3.5 ms/step with `other` = 2× the true total). Only
    "XLA Ops" threads are summed when thread metadata is present; traces
    without thread names fall back to all-track summing minus events whose
    name looks like a module execution (``jit_<fn>`` / ``*.module``).
    """
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
    op_tids = {
        (e["pid"], e.get("tid"))
        for e in events
        if e.get("ph") == "M" and e.get("name") == "thread_name"
        and e.get("pid") in tpu_pids
        and "XLA Ops" in str(e.get("args", {}).get("name", ""))
    }
    def _container(name: str) -> bool:
        # Control-flow CONTAINER ops span their entire body: a fused
        # sampling chain's `while` event equals the whole loop, so summing
        # it alongside the body ops double-counts the run (measured: a
        # 1.18 ms/step chain read back as 2.35 ms/step). Same for module
        # wrappers in traces without thread metadata.
        base = name.split(".", 1)[0]
        return (base in ("while", "conditional")
                or name.startswith("jit_") or name.endswith(".module"))

    def _sum(keep):
        by_name: Dict[str, float] = defaultdict(float)
        by_cat: Dict[str, float] = defaultdict(float)
        total = 0.0
        for e in events:
            if e.get("ph") != "X" or e.get("pid") not in tpu_pids:
                continue
            if _container(e["name"]) or not keep(e):
                continue
            dur = e.get("dur", 0) / 1e3  # us → ms
            by_name[e["name"]] += dur
            by_cat[categorize_op(e["name"])] += dur
            total += dur
        return total, dict(by_cat), dict(by_name)

    if op_tids:
        total, by_cat, by_name = _sum(lambda e: (e["pid"], e.get("tid")) in op_tids)
        if total > 0:
            return total, by_cat, by_name
    # no (or empty) op track: all tracks, containers excluded above
    return _sum(lambda e: True)


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

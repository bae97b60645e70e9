"""Tracing, per-stage timing, and structured metrics (SURVEY §5).

The reference has no observability at all (not even timers); this module
adds the three layers the rebuild commits to:

  - `trace(logdir)`: jax.profiler device traces (view in TensorBoard/XProf)
  - `stage_timer(name)`: wall-clock per pipeline stage, collected into a
    process-global registry
  - `Metrics`: structured counters/values stages can record (match counts,
    inlier ratios, residuals) and dump as one JSON blob
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from typing import Any, Dict, Iterator

import jax


class Metrics:
    """Process-global structured metrics registry."""

    def __init__(self):
        self.values: Dict[str, Any] = {}
        self.timings: Dict[str, list] = defaultdict(list)

    def record(self, name: str, value) -> None:
        self.values[name] = value

    def add_timing(self, stage: str, seconds: float) -> None:
        self.timings[stage].append(seconds)

    def summary(self) -> Dict[str, Any]:
        out = dict(self.values)
        for stage, ts in self.timings.items():
            out[f"time/{stage}_s"] = sum(ts) / len(ts)
            out[f"time/{stage}_calls"] = len(ts)
        return out

    def dump(self) -> str:
        return json.dumps(self.summary(), default=float, sort_keys=True)

    def reset(self) -> None:
        self.values.clear()
        self.timings.clear()


METRICS = Metrics()


@contextlib.contextmanager
def stage_timer(name: str, metrics: Metrics = METRICS) -> Iterator[None]:
    """Wall-clock a pipeline stage (blocks on async dispatch at exit)."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        metrics.add_timing(name, time.perf_counter() - t0)


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Capture a jax.profiler device trace for TensorBoard/XProf."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a trace (TraceAnnotation)."""
    return jax.profiler.TraceAnnotation(name)

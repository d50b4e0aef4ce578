"""Profiling & tracing — the observability subsystem the reference lacks
(SURVEY.md §5: only commented-out tic/toc, reference evaluate.py:92-98).

* ``trace(logdir)``: context manager around ``jax.profiler`` producing
  TensorBoard-loadable device traces (HLO timelines, memory viewer).
* ``annotate(name)``: named TraceAnnotation visible in the trace viewer.
* ``StepProfiler``: host-side per-step wall-clock aggregator reporting the
  BASELINE metric (edges/s/chip) plus percentile step times.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import numpy as np


@contextlib.contextmanager
def trace(logdir: str, create_perfetto_link: bool = False):
    """Capture a device trace for the enclosed region."""
    import jax

    jax.profiler.start_trace(logdir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace region (shows up in the profiler timeline)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class StepProfiler:
    """Accumulates per-step timings and work counters; reports edges/s/chip
    and step-time percentiles."""

    def __init__(self, n_chips: int = 1):
        self.n_chips = max(1, n_chips)
        self._times: List[float] = []
        self._edges: List[int] = []
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        return False

    def step_start(self) -> None:
        self._t0 = time.perf_counter()

    def step_end(self, num_edges: int = 0) -> float:
        dt = time.perf_counter() - (self._t0 or time.perf_counter())
        self._times.append(dt)
        self._edges.append(int(num_edges))
        return dt

    def summary(self, skip_warmup: int = 1) -> Dict[str, float]:
        ts = np.asarray(self._times[skip_warmup:] or self._times)
        es = np.asarray(self._edges[skip_warmup:] or self._edges)
        total_t = float(ts.sum()) if len(ts) else 0.0
        return {
            "steps": int(len(ts)),
            "mean_step_ms": float(ts.mean() * 1e3) if len(ts) else 0.0,
            "p50_step_ms": float(np.percentile(ts, 50) * 1e3) if len(ts) else 0.0,
            "p99_step_ms": float(np.percentile(ts, 99) * 1e3) if len(ts) else 0.0,
            "edges_per_s_per_chip": (
                float(es.sum()) / total_t / self.n_chips if total_t else 0.0),
            "steps_per_s": float(len(ts)) / total_t if total_t else 0.0,
        }

"""Profiling & step metering — the observability layer (SURVEY.md §5.1).

The reference's tracing is VLOG wall-times inside kernels + a --timeline
hook; TPU-native we wrap ``jax.profiler`` traces and provide a StepMeter
that tracks examples/s, step-time percentiles, and per-table lookup volume.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/XProf."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    import jax
    with jax.profiler.TraceAnnotation(name):
        yield


class StepMeter:
    """Rolling training-step metrics (examples/s, ms/step percentiles)."""

    def __init__(self, window: int = 200):
        self.window = window
        self._times: List[float] = []
        self._examples: List[int] = []
        self._last: Optional[float] = None
        self.total_steps = 0
        self.total_examples = 0

    def step(self, batch_size: int):
        now = time.perf_counter()
        if self._last is not None:
            self._times.append(now - self._last)
            self._examples.append(batch_size)
            if len(self._times) > self.window:
                self._times.pop(0)
                self._examples.pop(0)
        self._last = now
        self.total_steps += 1
        self.total_examples += batch_size

    def snapshot(self) -> Dict[str, float]:
        if not self._times:
            return {"steps": self.total_steps}
        t = np.array(self._times)
        return {
            "steps": self.total_steps,
            "examples_per_s": float(sum(self._examples) / t.sum()),
            "step_ms_p50": float(np.percentile(t, 50) * 1e3),
            "step_ms_p99": float(np.percentile(t, 99) * 1e3),
        }

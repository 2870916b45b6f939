"""Tracing / profiling (SURVEY §5: the reference's opt-in Lightning
AdvancedProfiler becomes jax.profiler traces + per-step wall timing)."""
from __future__ import annotations

import contextlib
import json
import os
import time

import jax


@contextlib.contextmanager
def trace(log_dir, enabled=True):
    """jax.profiler trace context (view with TensorBoard / xprof)."""
    if not enabled:
        yield
        return
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Per-step timing with simple percentile summary written as JSON
    (the AdvancedProfiler-style 'profile.log' replacement)."""

    def __init__(self, log_path=None):
        self.times = []
        self.log_path = log_path
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *a):
        self.times.append(time.perf_counter() - self._t0)

    def summary(self):
        import numpy as np

        if not self.times:
            return {}
        arr = np.asarray(self.times)
        s = {
            "n": len(arr),
            "mean_s": float(arr.mean()),
            "p50_s": float(np.percentile(arr, 50)),
            "p95_s": float(np.percentile(arr, 95)),
            "max_s": float(arr.max()),
        }
        if self.log_path:
            with open(self.log_path, "w") as f:
                json.dump(s, f, indent=2)
        return s

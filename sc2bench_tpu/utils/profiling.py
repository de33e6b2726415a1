"""Tracing / profiling hooks (SURVEY.md §5.1: the reference only has img/s
meters; we expose `jax.profiler` traces plus per-stage wall timers for the
deploy pipeline: encode / entropy-code / decode / tail)."""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Accumulates wall-clock per named stage; summarize() returns
    mean/total ms per stage."""

    def __init__(self):
        self.times = defaultdict(list)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.times[name].append(time.perf_counter() - t0)

    def summarize(self):
        return {
            name: {'mean_ms': float(np.mean(v) * 1000),
                   'total_ms': float(np.sum(v) * 1000),
                   'count': len(v)}
            for name, v in self.times.items()}

    def clear(self):
        self.times.clear()

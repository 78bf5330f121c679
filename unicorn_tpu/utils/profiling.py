"""Profiling / tracing helpers.

Reference had only wall-clock segment timing around torch.cuda.synchronize
(SURVEY.md §5). TPU-native: jax.profiler traces (xprof-compatible) + the
data-time/step-time meter split the reference logs.
"""
from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture an xprof trace around a code block:
    with trace('/tmp/xprof'): step(...)"""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region visible in the trace viewer."""
    with jax.profiler.TraceAnnotation(name):
        yield


class StepTimer:
    """data-time / step-time split (reference trainer.py:172-190)."""

    def __init__(self):
        self.data_time = 0.0
        self.step_time = 0.0
        self.n = 0
        self._t = time.perf_counter()

    def mark_data(self):
        t = time.perf_counter()
        self.data_time += t - self._t
        self._t = t

    def mark_step(self, sync_obj=None):
        if sync_obj is not None:
            jax.block_until_ready(sync_obj)
        t = time.perf_counter()
        self.step_time += t - self._t
        self._t = t
        self.n += 1

    def summary(self):
        n = max(self.n, 1)
        return {"data_ms": 1e3 * self.data_time / n,
                "step_ms": 1e3 * self.step_time / n}


def device_memory_stats():
    """HBM usage (reference gpu_mem_usage via nvidia-smi, utils/metric.py)."""
    out = {}
    for d in jax.devices():
        try:
            s = d.memory_stats()
            out[str(d)] = {
                "bytes_in_use": s.get("bytes_in_use", 0),
                "peak_bytes_in_use": s.get("peak_bytes_in_use", 0),
                "bytes_limit": s.get("bytes_limit", 0),
            }
        except Exception:
            out[str(d)] = {}
    return out

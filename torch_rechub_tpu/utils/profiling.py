"""Tracing / profiling hooks.

The reference has no profiler integration (SURVEY §5 — only wall-clock
timing in the benchmark runner).  TPU-native equivalents here:

- ``trace(log_dir)``: context manager around ``jax.profiler`` capturing a
  TensorBoard-viewable trace of everything inside (XLA ops, transfers).
- ``StepTimer``: cheap per-step wall-clock accumulator with percentile
  summary — the tqdm-postfix analogue that doesn't need tqdm.
- ``annotate(name)``: ``jax.profiler.TraceAnnotation`` wrapper so Python-side
  phases show up as named spans inside a captured trace.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace for the enclosed block (view in TensorBoard)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span annotation inside an active trace."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Accumulates per-step durations; ``summary()`` gives mean/p50/p99 + rate."""

    def __init__(self, examples_per_step: Optional[int] = None):
        self.durations: List[float] = []
        self.examples_per_step = examples_per_step
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.durations.append(time.perf_counter() - self._t0)
        return False

    def summary(self) -> Dict[str, float]:
        if not self.durations:
            return {}
        d = np.asarray(self.durations)
        out = {
            "steps": len(d),
            "mean_s": float(d.mean()),
            "p50_s": float(np.percentile(d, 50)),
            "p99_s": float(np.percentile(d, 99)),
            "total_s": float(d.sum()),
        }
        if self.examples_per_step:
            out["examples_per_s"] = self.examples_per_step / out["mean_s"]
        return out

    def reset(self):
        self.durations.clear()


def device_memory_stats() -> Dict[str, Dict]:
    """Per-device memory stats where the backend exposes them."""
    import jax

    out = {}
    for dev in jax.local_devices():
        try:
            out[str(dev)] = dev.memory_stats() or {}
        except Exception:
            out[str(dev)] = {}
    return out

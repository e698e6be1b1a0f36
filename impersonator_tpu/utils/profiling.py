"""Profiling / tracing (first-class, unlike the reference's ad-hoc
wall-clock prints — SURVEY §5).

* :func:`trace` — context manager around ``jax.profiler`` writing a
  TensorBoard-compatible trace directory;
* :class:`StepTimer` — blocking per-phase timers with p50/p95 summaries
  for the train/inference loops;
* :func:`device_memory_stats` — live HBM usage snapshot.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """with profiling.trace('/tmp/trace'): step(...)"""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self):
        self.samples = defaultdict(list)

    @contextlib.contextmanager
    def phase(self, name: str, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            self.samples[name].append(time.perf_counter() - t0)

    def summary(self) -> dict:
        out = {}
        for name, xs in self.samples.items():
            arr = np.asarray(xs)
            out[name] = {
                "count": len(xs),
                "mean_s": float(arr.mean()),
                "p50_s": float(np.percentile(arr, 50)),
                "p95_s": float(np.percentile(arr, 95)),
            }
        return out


def device_memory_stats() -> dict:
    stats = {}
    for dev in jax.devices():
        try:
            ms = dev.memory_stats()
        except Exception:
            ms = None
        # some PJRT plugins (axon among them) return None or a non-dict
        # instead of raising — only record real mappings so callers can
        # iterate values() without re-checking
        stats[str(dev)] = dict(ms) if isinstance(ms, dict) else None
    return stats

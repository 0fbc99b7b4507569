"""Tracing / profiling hooks (SURVEY.md §5.1).

The reference only has manual latency prints (server.py:81, cal_RTF cuda
events); here:

- ``trace(path)``: context manager around ``jax.profiler`` — full XLA/TPU
  traces viewable in TensorBoard / Perfetto.
- ``LatencyStats``: rolling latency accounting (per-frame / per-chunk) with
  p50/p95, used by the serving layer.
- ``annotate``: named trace regions for host-side phases.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List

import numpy as np
import jax


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


class LatencyStats:
    def __init__(self, capacity: int = 1024):
        self.capacity = capacity
        self.samples: Dict[str, List[float]] = {}

    @contextlib.contextmanager
    def measure(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = (time.perf_counter() - t0) * 1e3
            buf = self.samples.setdefault(name, [])
            buf.append(dt)
            if len(buf) > self.capacity:
                del buf[: len(buf) - self.capacity]

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, buf in self.samples.items():
            a = np.asarray(buf)
            out[name] = {"n": len(a), "mean_ms": float(a.mean()),
                         "p50_ms": float(np.percentile(a, 50)),
                         "p95_ms": float(np.percentile(a, 95)),
                         "max_ms": float(a.max())}
        return out

"""Tracing / profiling utilities.

The reference's only profiling surface is a manual torch.profiler harness
(scripts/tests/attention.py, SURVEY.md §5). TPU-native equivalents:
- `trace(logdir)` context manager → xprof/TensorBoard traces
  (jax.profiler.start_trace/stop_trace)
- `StepTimer` → wall-clock step-time logging with device sync, the
  lightweight always-on observability the reference lacks
- `annotate(name)` → TraceAnnotation spans visible in xprof
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Dict, List, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Accumulates named step timings (blocks on device completion)."""

    def __init__(self):
        self.records: Dict[str, List[float]] = {}

    @contextlib.contextmanager
    def time(self, name: str):
        """`with timer.time('stage') as done: out = step(); done(out)` —
        register the stage's output so the timer can block on device
        completion; without it only dispatch latency is recorded (the old
        `result=` parameter could never receive a value produced inside
        the block, so it silently measured dispatch only)."""
        holder = []
        t0 = time.perf_counter()
        yield holder.append
        if holder:
            jax.block_until_ready(holder[0])
        self.records.setdefault(name, []).append(time.perf_counter() - t0)

    def measure(self, name: str, fn, *args, **kwargs):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        self.records.setdefault(name, []).append(time.perf_counter() - t0)
        return out

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, ts in self.records.items():
            out[name] = {
                "count": len(ts),
                "total_s": sum(ts),
                "mean_s": sum(ts) / len(ts),
                "min_s": min(ts),
                "max_s": max(ts),
            }
        return out

    def dump(self, path: Optional[str] = None) -> str:
        s = json.dumps(self.summary(), indent=2)
        if path:
            with open(path, "w") as f:
                f.write(s)
        return s

"""Profiling hooks (the reference has none — SURVEY.md §5 flags this as a
gap to close, not copy): jax.profiler trace capture + per-step timing.

Usage:
    with trace_if("/tmp/tb_traces", step, capture_steps=(10, 12)):
        state, metrics = step_fn(...)

or wrap an arbitrary callable with ``StepTimer`` for rolling-throughput
numbers that land in the tracker.
"""

from __future__ import annotations

import contextlib
import time
from collections import deque
from typing import Optional

import jax


@contextlib.contextmanager
def trace_if(trace_dir: Optional[str], step: int, capture_steps=(10,)):
    """Capture an XLA profiler trace for the given steps (TensorBoard format)."""
    if trace_dir and step in capture_steps:
        with jax.profiler.trace(trace_dir):
            yield
    else:
        yield


class StepTimer:
    """Rolling wall-clock stats for the training hot loop."""

    def __init__(self, window: int = 50):
        self._times: deque = deque(maxlen=window)
        self._last: Optional[float] = None

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self._times.append(now - self._last)
        self._last = now

    def stats(self, batch_size: int = 1) -> dict:
        if not self._times:
            return {}
        mean = sum(self._times) / len(self._times)
        return {
            "perf/step_time_s": mean,
            "perf/steps_per_sec": 1.0 / mean,
            "perf/samples_per_sec": batch_size / mean,
        }


def annotate(name: str):
    """Named profiler span (shows up in the trace timeline)."""
    return jax.profiler.TraceAnnotation(name)


def force_sync(*arrays) -> None:
    """Reliable execution barrier for timing code.

    On some attached tunnel runtimes ``block_until_ready`` returns BEFORE
    the device has executed the dispatched programs (measured in round 4:
    a 137-GFLOP matmul "completed" in 0.12 ms → an impossible 1174 TFLOPS
    on a 197-TFLOP chip, while a forced host fetch of the same chain gave
    a plausible 98.7 TFLOPS).  Fetching data to the host is the only
    observed true barrier, so this pulls ONE element of each array to the
    host — the gather depends on the full producing computation, forcing
    execution without a bulk transfer.  Pytrees are flattened.
    """
    import numpy as np

    for a in jax.tree.leaves(list(arrays)):
        if getattr(a, "ndim", 0) == 0 or getattr(a, "size", 1) <= 64:
            np.asarray(a)
        else:
            np.asarray(a.ravel()[:1])

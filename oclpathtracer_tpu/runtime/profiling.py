"""Profiling — wall-clock stopwatch and device traces.

Equivalent capabilities to the reference's three mechanisms (SURVEY.md §5.1):
  * StopwatchHost (Host/AdlStopwatchHost.inl:26-107)        → Stopwatch (perf_counter,
    split slots)
  * Launcher host-side launch timing (AdlKernelUtilsCL.cpp:470-499) → timed()
    (blocks on the result like the reference's forced waitForCompletion)
  * clGetEventProfilingInfo device ns (AdlCL.cpp:508-517)   → jax.profiler traces
    (trace() context manager below)
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Tuple

import jax


class Stopwatch:
    """Wall-clock timer with split recording (≡ StopwatchHost's 64 split slots)."""

    def __init__(self):
        self._t0 = 0.0
        self._splits: list[float] = []

    def start(self) -> "Stopwatch":
        self._t0 = time.perf_counter()
        self._splits = []
        return self

    def split(self) -> float:
        t = time.perf_counter() - self._t0
        self._splits.append(t)
        return t

    @property
    def splits(self) -> list[float]:
        return list(self._splits)

    def elapsed_ms(self) -> float:
        return (time.perf_counter() - self._t0) * 1e3


def timed(fn: Callable, *args, **kwargs) -> Tuple[Any, float]:
    """Run fn and block until its outputs are ready; returns (result, seconds).

    Mirrors the reference's PROFILE_RETURN_TIME launch path, which host-times each
    launch around a forced waitForCompletion (AdlKernelUtilsCL.cpp:470-486).
    """
    t0 = time.perf_counter()
    out = fn(*args, **kwargs)
    out = jax.block_until_ready(out)
    return out, time.perf_counter() - t0


@contextlib.contextmanager
def trace(log_dir: str):
    """Device-timeline trace (xprof) — per-op device timing like the reference's
    clGetEventProfilingInfo path, but for the whole program."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

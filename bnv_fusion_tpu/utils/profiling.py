"""Tracing / profiling: phase timers, device-memory stats, profiler capture.

The reference's observability is a wall-clock two-phase timer + fps printout
and a CUDA memory snapshot helper (reference src/utils/common.py:12-21,
src/run_e2e.py:196-202,289-290).  This module keeps that surface and adds the
TPU-native instruments: jax.profiler trace capture (view with TensorBoard or
xprof) and per-device HBM statistics.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional


class PhaseTimer:
    """Accumulating phase timer with fps reporting."""

    def __init__(self, names):
        self.times: Dict[str, float] = {n: 0.0 for n in names}
        self.counts: Dict[str, int] = {n: 0 for n in names}
        self._start: Dict[str, float] = {}

    def start(self, name: str) -> None:
        self._start[name] = time.time()

    def log(self, name: str) -> None:
        self.times[name] += time.time() - self._start.pop(name)
        self.counts[name] += 1

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        self.start(name)
        try:
            yield
        finally:
            self.log(name)

    def fps(self, name: str, steps: Optional[int] = None) -> float:
        t = self.times.get(name, 0.0)
        n = steps if steps is not None else self.counts.get(name, 0)
        return n / t if t > 0 else float("inf")

    def summary(self) -> str:
        return " | ".join(
            f"{n}: {self.times[n]:.2f}s ({self.fps(n):.2f}/s)"
            for n in self.times)


def device_memory_stats() -> Dict[str, Dict[str, float]]:
    """Per-device HBM usage in GB (the track_memory analog,
    reference src/run_e2e.py:196-202)."""
    import jax

    gb = 1024 ** 3
    out = {}
    for d in jax.local_devices():
        stats = d.memory_stats() or {}
        out[str(d)] = {
            "bytes_in_use_gb": stats.get("bytes_in_use", 0) / gb,
            "peak_bytes_in_use_gb": stats.get("peak_bytes_in_use", 0) / gb,
            "bytes_limit_gb": stats.get("bytes_limit", 0) / gb,
        }
    return out


@contextlib.contextmanager
def maybe_trace(log_dir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace capture when a log dir is given, else no-op."""
    if not log_dir:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region in profiler timelines (TraceAnnotation)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield

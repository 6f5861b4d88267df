"""Timing and throughput utilities.

Replaces the reference's vendored ``cuda_utils`` Timer
(``timer.cpuStart()/cpuStop()`` around the sprint loop, cuda_sim.cu:908,
970, 1027 — the submodule itself is missing from the reference checkout,
SURVEY §2 C12) and adds what a production service actually needs:
walker-steps/s accounting and optional jax profiler traces.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional


class Timer:
    """Reference-compatible start/stop walltime (milliseconds)."""

    def __init__(self):
        self._t0: Optional[float] = None

    def cpu_start(self) -> None:
        self._t0 = time.perf_counter()

    def cpu_stop(self) -> float:
        if self._t0 is None:
            raise RuntimeError("cpu_start() was not called")
        ms = (time.perf_counter() - self._t0) * 1e3
        self._t0 = None
        return ms

    def __enter__(self):
        self.cpu_start()
        return self

    def __exit__(self, *exc):
        self.elapsed_ms = (time.perf_counter() - self._t0) * 1e3
        self._t0 = None


def walker_steps_per_sec(num_water: int, steps: int, wall_s: float) -> float:
    """The primary throughput metric (BASELINE.md)."""
    return num_water * steps / wall_s if wall_s > 0 else 0.0


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]):
    """jax.profiler trace (TensorBoard-viewable) around a block; no-op when
    log_dir is None."""
    if log_dir is None:
        yield
        return
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

"""Profiling & observability.

The reference's observability is stdout prints of each block's config
(SURVEY.md §5).  Here: per-stage throughput counters, a stream-level
samples/s meter, and a jax.profiler trace context for TPU timeline capture.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass

import jax

__all__ = ["Meter", "trace", "timed_steps"]


@dataclass
class Meter:
    """Streaming throughput meter: feed it (samples, t) increments."""

    name: str = "stream"
    samples: int = 0
    seconds: float = 0.0
    _t0: float | None = None

    def start(self):
        self._t0 = time.perf_counter()

    def tick(self, n_samples: int):
        now = time.perf_counter()
        if self._t0 is not None:
            self.seconds += now - self._t0
        self._t0 = now
        self.samples += n_samples

    @property
    def msps(self) -> float:
        return self.samples / self.seconds / 1e6 if self.seconds else 0.0

    def report(self) -> str:
        return f"{self.name}: {self.samples} samples in {self.seconds:.3f}s = {self.msps:.2f} MSPS"


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace (TensorBoard-compatible) around a code
    region — TPU timeline, HLO, memory."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed_steps(step_fn, state, x, iters: int = 10):
    """Measure a jitted step's steady-state wall time (compile excluded).
    Returns (seconds_per_step, final_state)."""
    state, y = step_fn(state, x)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, y = step_fn(state, x)
    jax.block_until_ready(y)
    return (time.perf_counter() - t0) / iters, state

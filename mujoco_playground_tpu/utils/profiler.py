"""Profiling hooks: jax.profiler traces + steps/s counters.

The reference has no profiling beyond wall-clock pacing (SURVEY.md §5).
"""
from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace_context(log_dir: str = "/tmp/jax_trace"):
    """Capture a jax.profiler trace around a block (view with xprof/TensorBoard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling env-steps/s counter."""

    def __init__(self, steps_per_iter: int, ema: float = 0.9):
        self.steps_per_iter = steps_per_iter
        self.ema = ema
        self._rate: Optional[float] = None
        self._last: Optional[float] = None

    def tick(self) -> float:
        now = time.time()
        if self._last is not None:
            inst = self.steps_per_iter / (now - self._last)
            self._rate = (inst if self._rate is None
                          else self.ema * self._rate + (1 - self.ema) * inst)
        self._last = now
        return self._rate or 0.0

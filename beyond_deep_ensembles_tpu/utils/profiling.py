"""Profiling / tracing utilities.

The reference only wall-clocks with ``time.time()`` brackets and a
``time_fn`` decorator logged as telemetry (SURVEY.md §5, reference
script_utils.py:151-170). Here: the same lightweight timers plus real
``jax.profiler`` trace capture for TPU performance work — something the
reference never had.
"""
from __future__ import annotations

import contextlib
import functools
import time
from typing import Callable

import jax


def time_fn(fn: Callable) -> Callable:
    """Returns (result, elapsed_seconds) — reference script_utils.time_fn."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        t0 = time.perf_counter()
        result = fn(*args, **kwargs)
        result = jax.block_until_ready(result)
        return result, time.perf_counter() - t0

    return wrapped


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """Capture a jax profiler trace viewable in xprof/tensorboard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """EMA step timer for training-loop telemetry."""

    def __init__(self, alpha: float = 0.05):
        self.alpha = alpha
        self.ema = None
        self._last = None

    def tick(self):
        now = time.perf_counter()
        if self._last is not None:
            dt = now - self._last
            self.ema = dt if self.ema is None else (1 - self.alpha) * self.ema + self.alpha * dt
        self._last = now
        return self.ema

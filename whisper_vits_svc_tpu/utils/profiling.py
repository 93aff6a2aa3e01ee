"""Tracing / profiling hooks (SURVEY.md §5.1 — absent in the reference).

Thin wrappers over jax.profiler producing xprof-compatible traces, plus a
step timer that accounts for async dispatch via block_until_ready.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str | None):
    """xprof trace context; no-op when log_dir is None.

    View with: tensorboard --logdir <log_dir> (profile plugin) or xprof.
    """
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region visible in the trace viewer."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Wall-clock step timing with device sync; keeps a moving window."""

    def __init__(self, window: int = 50):
        self.window = window
        self.times: list[float] = []
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, *sync_on):
        for x in sync_on:
            jax.block_until_ready(x)
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        if len(self.times) > self.window:
            self.times.pop(0)
        return dt

    @property
    def mean(self) -> float:
        return sum(self.times) / max(len(self.times), 1)

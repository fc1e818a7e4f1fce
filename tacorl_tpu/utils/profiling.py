"""Profiling / tracing utilities — the superset of the reference's
``profiler: simple`` (SURVEY.md §5): jax.profiler traces viewable in
TensorBoard/Perfetto plus lightweight host-side step timing.
"""

from __future__ import annotations

import contextlib
import time
from pathlib import Path
from typing import Dict, Iterator, Optional

import jax

__all__ = ["trace", "StepTimer", "start_server"]


@contextlib.contextmanager
def trace(log_dir, steps_context: str = "train") -> Iterator[None]:
    """Capture a device trace: ``with trace(run_dir / 'profile'): ...``."""
    log_dir = str(log_dir)
    jax.profiler.start_trace(log_dir)
    try:
        with jax.profiler.TraceAnnotation(steps_context):
            yield
    finally:
        jax.profiler.stop_trace()


def start_server(port: int = 9999):
    """Live profiling server for ``tensorboard --logdir`` capture."""
    return jax.profiler.start_server(port)


class StepTimer:
    """Rolling steps/sec with compile-step exclusion."""

    def __init__(self, window: int = 50):
        self.window = window
        self._t0: Optional[float] = None
        self._count = 0
        self._rate = 0.0

    def tick(self) -> Optional[float]:
        now = time.perf_counter()
        if self._t0 is None:
            self._t0 = now
            return None
        self._count += 1
        if self._count >= self.window:
            self._rate = self._count / (now - self._t0)
            self._t0, self._count = now, 0
            return self._rate
        return None

    @property
    def steps_per_sec(self) -> float:
        return self._rate

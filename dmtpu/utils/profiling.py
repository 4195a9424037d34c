"""Profiling / tracing (aux subsystem; SURVEY.md §5).

The reference's only instrumentation is wall-clock prints + tqdm; here:
  - ``trace(logdir)``: jax.profiler trace context (view in TensorBoard /
    Perfetto) around any region (train steps, a sampling run).
  - ``StepTimer``: lightweight rolling step-time/throughput tracker for the
    train loop (host side, no device sync beyond what the loop already does).
"""
from __future__ import annotations

import contextlib
import time
from collections import deque
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self, window: int = 50):
        self.times: deque = deque(maxlen=window)
        self._last: Optional[float] = None

    def tick(self) -> Optional[float]:
        now = time.perf_counter()
        dt = None
        if self._last is not None:
            dt = now - self._last
            self.times.append(dt)
        self._last = now
        return dt

    @property
    def mean(self) -> float:
        return sum(self.times) / len(self.times) if self.times else 0.0

    def throughput(self, items_per_step: int) -> float:
        return items_per_step / self.mean if self.mean else 0.0

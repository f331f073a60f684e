"""Profiling helpers: jax.profiler traces and step timing.

The reference's only performance observability is a steps/sec scalar
(training/train_lib.py:212-214, 263-269 in
google-research/frame-interpolation). Here the train loop additionally
supports capturing a real device trace for a window of steps, viewable in
TensorBoard/Perfetto/XProf.
"""
from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace_if(logdir: Optional[str]) -> Iterator[None]:
  """jax.profiler.trace when `logdir` is set; no-op otherwise."""
  if not logdir:
    yield
    return
  with jax.profiler.trace(logdir):
    yield


class StepTimer:
  """Steps/sec over a sliding interval (SecondOrStepTimer parity)."""

  def __init__(self, interval: int = 100):
    self.interval = interval
    self._last_time = time.monotonic()
    self._last_step = 0

  def update(self, step: int) -> Optional[float]:
    """Returns steps/sec when `interval` steps elapsed, else None."""
    if step - self._last_step < self.interval:
      return None
    now = time.monotonic()
    rate = (step - self._last_step) / max(now - self._last_time, 1e-9)
    self._last_time = now
    self._last_step = step
    return rate

"""Profiling and step-timing utilities (SURVEY.md §5.1 — absent in the
reference; here: TensorBoard-compatible device traces + throughput timers).

- :func:`trace`: context manager around ``jax.profiler`` producing a trace
  viewable in TensorBoard's profile plugin or Perfetto.
- :class:`StepTimer`: wall-clock images/sec with correct async-dispatch
  handling (blocks only when a reading is taken, not every step).
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str, *, create_perfetto_link: bool = False):
    """Capture a device trace for the enclosed block.

    Usage::

        with profiling.trace(log_dir):
            for _ in range(10):
                state, metrics, _ = step(state, batch, sigma, key)
            jax.block_until_ready(metrics)
    """
    jax.profiler.start_trace(log_dir,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Smoothed images/sec meter for an async-dispatch training loop.

    ``tick(batch_size)`` each step is O(1); ``rate(sync=...)`` returns the
    images/sec since the previous reading, optionally forcing a device sync on
    ``sync`` (typically the latest metrics pytree) so the measurement covers
    actually-finished work rather than the dispatch queue.
    """

    def __init__(self):
        self._t = time.perf_counter()
        self._images = 0

    def tick(self, batch_size: int) -> None:
        self._images += int(batch_size)

    def rate(self, sync=None) -> Optional[float]:
        if sync is not None:
            jax.block_until_ready(sync)
        now = time.perf_counter()
        dt = now - self._t
        if dt <= 0 or self._images == 0:
            return None
        r = self._images / dt
        self._t = now
        self._images = 0
        return r

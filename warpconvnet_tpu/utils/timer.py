"""Device timing harness (reference ``utils/timer.py:41`` CUDATimer).

On TPU, timing = wall clock around ``jax.block_until_ready``; first call of a
jitted function is excluded by the caller via warmup iterations.
"""

from __future__ import annotations

import time
from typing import Callable, Sequence

import jax


class DeviceTimer:
    """Context-manager timer that synchronizes on given outputs."""

    def __init__(self):
        self.elapsed_ms = 0.0

    def __enter__(self):
        self._start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed_ms = (time.perf_counter() - self._start) * 1e3
        return False


def time_fn(fn: Callable, *args, warmup: int = 2, iters: int = 5) -> float:
    """Median wall-clock ms of ``fn(*args)`` with block_until_ready."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append((time.perf_counter() - t0) * 1e3)
    times.sort()
    return times[len(times) // 2]

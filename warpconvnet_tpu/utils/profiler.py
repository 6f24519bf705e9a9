"""Profiling/tracing helpers — the TPU analog of the reference's NVTX ranges
and CUDATimer (``csrc/include/cuhash/nvtx_range.cuh``, ``utils/timer.py:41``,
SURVEY section 5).

* :func:`annotate` — ``jax.profiler.TraceAnnotation`` + ``named_scope`` so a
  region shows up both on the host timeline and as an XLA op-name prefix in
  device traces.
* :func:`trace` — context manager around ``jax.profiler.start_trace`` /
  ``stop_trace`` writing a TensorBoard-loadable trace directory.
* :class:`WallTimer` — chained-dispatch wall timing for the tunneled-TPU
  setup where ``block_until_ready`` does not synchronize (fetch one scalar).
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import numpy as np
import jax


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Host + device trace annotation (NVTX-range analog)."""
    with jax.profiler.TraceAnnotation(name):
        with jax.named_scope(name):
            yield


@contextlib.contextmanager
def trace(log_dir: str, host_tracer_level: int = 2) -> Iterator[None]:
    """Capture a profiler trace into ``log_dir`` (TensorBoard format).

    On backends without device tracing (e.g. the tunneled axon chip) this
    still records host-side activity and annotations.
    """
    try:
        jax.profiler.start_trace(log_dir, create_perfetto_link=False)
        started = True
    except Exception:  # pragma: no cover - backend without profiler support
        started = False
    try:
        yield
    finally:
        if started:
            jax.profiler.stop_trace()


class WallTimer:
    """Wall-clock timer for jitted thunks: ``fn`` is dispatched ``iters``
    times and synchronized by fetching one scalar from the last output
    (CUDA-event-timer analog for the RPC-tunneled chip)."""

    def __init__(self, warmup: int = 1, iters: int = 10):
        self.warmup = warmup
        self.iters = iters

    def time_ms(self, fn, *args) -> float:
        out = None
        for _ in range(self.warmup):
            out = fn(*args)
        _ = np.asarray(jax.device_get(jax.tree.leaves(out)[0])).ravel()[:1]
        t0 = time.perf_counter()
        for _ in range(self.iters):
            out = fn(*args)
        _ = np.asarray(jax.device_get(jax.tree.leaves(out)[0])).ravel()[:1]
        return (time.perf_counter() - t0) / self.iters * 1e3

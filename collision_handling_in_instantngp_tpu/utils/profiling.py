"""Profiling helpers.

The reference imports torch's profiler but never uses it (functions.py:21);
its real "profiling" is the memory logger. The TPU rebuild gives profiling a
first-class surface: jax.profiler traces viewable in TensorBoard/Perfetto,
plus a tiny wall-clock step timer for quick throughput numbers."""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace") -> Iterator[None]:
    """Capture a device trace for the enclosed block:

        with profiling.trace("/tmp/trace"):
            state, metrics, _ = epoch_fn(state, batches)
            float(metrics.loss)   # force completion inside the trace
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock timer that understands async dispatch: call ``stop`` with a
    value to block on (a device->host transfer forces the dependent chain —
    block_until_ready alone does not drain some remote backends)."""

    def __init__(self) -> None:
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, sync_value=None) -> float:
        if sync_value is not None:
            float(jax.device_get(sync_value).reshape(-1)[0])
        assert self._t0 is not None
        dt = time.perf_counter() - self._t0
        self._t0 = None
        return dt

"""Profiling / throughput instrumentation.

The reference's only tracing is wall-clock prints (train.py:232-241);
here: jax.profiler trace capture around step ranges and a throughput
meter whose sync is tunnel-safe (a host scalar fetch, since
``block_until_ready`` can return early through remote PJRT transports).
"""
from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace") -> Iterator[None]:
    """Capture a profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def force_sync(x) -> float:
    """Host-fetch a scalar derived from x — a real device sync."""
    leaf = jax.tree.leaves(x)[0]
    return float(jnp.ravel(leaf)[0])


class ThroughputMeter:
    """images/sec over a window, synced by host fetches."""

    def __init__(self):
        self.reset()

    def reset(self) -> None:
        self._t0: Optional[float] = None
        self._images = 0

    def step(self, batch_size: int, sync_value=None) -> None:
        if sync_value is not None:
            force_sync(sync_value)
        if self._t0 is None:
            self._t0 = time.perf_counter()
            return
        self._images += batch_size

    @property
    def images_per_sec(self) -> float:
        if self._t0 is None or self._images == 0:
            return 0.0
        return self._images / (time.perf_counter() - self._t0)


_TRACE_OPEN = False


def start_trace_guarded(log_dir: str) -> None:
    """Start a jax.profiler trace, tracking open state so an exception
    anywhere up-stack can close it (stop_trace_guarded in a finally)."""
    global _TRACE_OPEN
    jax.profiler.start_trace(log_dir)
    _TRACE_OPEN = True


def stop_trace_guarded() -> bool:
    """Stop the trace iff one is open; safe to call unconditionally."""
    global _TRACE_OPEN
    if not _TRACE_OPEN:
        return False
    _TRACE_OPEN = False
    jax.profiler.stop_trace()
    return True

"""jax.profiler trace capture around step ranges (--profile DIR).

The reference's only tracing is wall-clock prints (train.py:232-241).
The guarded start/stop pair is the one true entry point — an unguarded
contextmanager variant existed here once but could leave a trace open
across the cli.train finally-handler; throughput measurement lives in
bench.py / tools/bench_train.py (chained-iteration harnesses, since
``block_until_ready`` can return early through remote PJRT transports).
"""
from __future__ import annotations

import jax

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

"""Profiling helpers (parity: mmdet/utils/profiling.py:10-40
profile_time, rebuilt on jax.profiler + wall clocks)."""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def profile_time(trace_name: str, name: str, enabled: bool = True,
                 stream=None, end_stream=None):
    """Wall-clock span printer; also emits a jax.profiler trace
    annotation so spans show up in xprof captures."""
    del stream, end_stream  # CUDA-stream args accepted for API parity
    if not enabled:
        yield
        return
    import jax
    with jax.profiler.TraceAnnotation(f"{trace_name}:{name}"):
        t0 = time.monotonic()
        try:
            yield
        finally:
            dt = time.monotonic() - t0
            print(f"{trace_name} {name} cpu_time {dt * 1000:.2f} ms")


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture an xprof/TensorBoard device trace for a code region."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

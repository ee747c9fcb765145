"""Profiling helpers (SURVEY.md §5.1: the torch.profiler / CUDA-event
replacement).

``trace(logdir)`` wraps jax.profiler.trace and produces an XPlane/Perfetto
trace viewable in XProf/TensorBoard; ``timed`` is the block_until_ready
host-timer bracket used throughout the benches.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any

import jax


@contextlib.contextmanager
def trace(logdir: str = "/tmp/crfp_trace"):
    """Capture a device trace: `with profile.trace('logs'): run()` then
    inspect with XProf / tensorboard --logdir."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def timed(fn, *args, iters: int = 10, warmup: int = 3, trials: int = 3) -> tuple[Any, float]:
    """Best-of-trials average seconds per call (tunnel-jitter robust)."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return out, best


def device_memory_stats() -> dict | None:
    """Peak/current HBM stats where the backend exposes them (the axon
    remote backend returns None)."""
    try:
        return jax.local_devices()[0].memory_stats()
    except Exception:
        return None

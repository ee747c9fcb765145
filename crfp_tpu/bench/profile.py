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
import jax.numpy as jnp


@contextlib.contextmanager
def trace(logdir: str = "/tmp/crfp_trace"):
    """Capture a device trace: `with profile.trace('logs'): run()` then
    inspect with XProf / tensorboard --logdir."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def force_sync(x) -> float:
    """TRUE device synchronization.

    On the axon remote backend ``jax.block_until_ready`` returns before
    execution finishes (measured: a 17.5 s computation "blocks" in 0.1 ms),
    silently turning benchmarks into enqueue-rate measurements. Fetching a
    scalar derived from the result is the only reliable barrier. Always use
    this (or fetch real outputs) when timing on this backend.
    """
    leaf = jax.tree.leaves(x)[0]
    # slice ON DEVICE first: fetch exactly one scalar, not the whole array
    return float(leaf.reshape(-1)[0])


def timed(fn, *args, iters: int = 3, warmup: int = 1, trials: int = 2) -> tuple[Any, float]:
    """Best-of-trials average seconds per call with TRUE synchronization."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    force_sync(out)
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        force_sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return out, best


def device_memory_stats() -> dict | None:
    """Peak/current HBM stats where the backend exposes them (the axon
    remote backend returns None)."""
    try:
        return jax.local_devices()[0].memory_stats()
    except Exception:
        return None

"""Cosine-annealing-with-restarts LR schedule (mmcv-style).

Replicates the reference trainer's per-iteration schedule
(/root/reference/trainer.py:120-128, 605-622): within restart period
``idx``, ``lr = min_lr + 0.5 * weight * (base - min_lr) * (cos(pi*alpha)+1)``
with ``alpha = min((it - nearest_restart) / period, 1)``. Defaults are the
training recipe of record: one 600k-iteration period, min_lr 1e-7.
"""

from __future__ import annotations

from collections.abc import Sequence

import jax.numpy as jnp
import numpy as np


def cosine_restart_schedule(
    base_lr: float,
    periods: Sequence[int] = (600_000,),
    restart_weights: Sequence[float] = (1.0,),
    min_lr: float = 1e-7,
):
    """Returns an optax-compatible ``schedule(count) -> lr``."""
    assert len(periods) == len(restart_weights)
    cumulative = np.cumsum(np.asarray(periods, np.int64))
    starts = np.concatenate([[0], cumulative[:-1]])
    periods_arr = np.asarray(periods, np.float64)
    weights_arr = np.asarray(restart_weights, np.float64)

    def schedule(count):
        it = jnp.asarray(count, jnp.float32)
        # index of the active restart period (clamped to the last one)
        idx = jnp.sum(it >= jnp.asarray(cumulative, jnp.float32))
        idx = jnp.minimum(idx, len(periods_arr) - 1).astype(jnp.int32)
        start = jnp.asarray(starts, jnp.float32)[idx]
        period = jnp.asarray(periods_arr, jnp.float32)[idx]
        weight = jnp.asarray(weights_arr, jnp.float32)[idx]
        alpha = jnp.minimum((it - start) / period, 1.0)
        cos_out = jnp.cos(jnp.pi * alpha) + 1.0
        return min_lr + 0.5 * weight * (base_lr - min_lr) * cos_out

    return schedule

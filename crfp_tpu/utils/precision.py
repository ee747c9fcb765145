"""Precision policy helpers.

Parity runs keep everything f32 with ``Precision.HIGHEST`` (the 0.05 dB
budget does not survive bf16 flow estimation, SURVEY.md §7.1). For
throughput-oriented inference, ``cast_pytree(params, jnp.bfloat16)`` plus
bf16 inputs flips every Conv/einsum in the model onto the native bf16
systolic array with f32 accumulation (see crfp_tpu/nn/layers.py) and
halves HBM traffic.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def cast_pytree(tree: Any, dtype) -> Any:
    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree.map(cast, tree)

"""Device-mesh helpers for data-parallel training/eval.

The reference's only distribution mechanism is single-process
``nn.DataParallel`` over up to 4 GPUs (/root/reference/main.py:37-38).
The TPU-native replacement: a 1-D 'data' mesh, batch inputs sharded over
it, parameters replicated, and XLA emitting the gradient all-reduce over
ICI. Multi-host extends the same mesh over DCN via
``jax.distributed.initialize`` (SURVEY.md §5.8).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_parallel_mesh(n_devices: int | None = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), ("data",))


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place a host batch with leading batch axis onto the mesh."""
    sharding = NamedSharding(mesh, P("data"))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)

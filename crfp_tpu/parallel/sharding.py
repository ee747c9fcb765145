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


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Multi-host bring-up (SURVEY.md §5.8): ``jax.distributed.initialize``.

    On TPU pods the arguments are auto-discovered from the environment
    (TPU metadata / ``JAX_COORDINATOR_ADDRESS``); pass them explicitly for
    CPU/GPU clusters. Returns True when a multi-process runtime was
    initialized, False when running single-process (the call is then a
    no-op, so driver code can call this unconditionally). After a
    successful init, ``global_mesh()`` spans every host's devices and the
    existing ``shard_batch``/``replicate`` helpers work unchanged — XLA
    routes the gradient all-reduce over ICI within a slice and DCN across
    slices.
    """
    import os

    explicit = coordinator_address is not None
    # NOTE: deliberately not keyed on TPU_WORKER_HOSTNAMES — the single-chip
    # axon tunnel sets it to 'localhost'
    auto = any(
        os.environ.get(k)
        for k in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS")
    )
    if not (explicit or auto):
        return False
    state = getattr(jax._src.distributed, "global_state", None)
    already_up = state is not None and state.client is not None
    if not already_up:
        # a genuine bring-up failure (bad coordinator address, port clash)
        # must propagate — only an actual double-initialize is benign
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        except RuntimeError as e:
            if "already initialized" not in str(e).lower():
                raise
    return jax.process_count() > 1


def global_mesh(axis: str = "data") -> Mesh:
    """1-D mesh over every device of every process (use after
    ``initialize_distributed`` on multi-host; identical to
    ``data_parallel_mesh`` single-host)."""
    return Mesh(np.asarray(jax.devices()), (axis,))

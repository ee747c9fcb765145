"""Spatial (per-frame) sharding primitives: halo exchange over ICI.

The reference has no sequence/spatial parallelism (SURVEY.md §2.3); its
spatial-scaling trick is single-chip ROI cropping. The TPU-native analog
for frames too large for one chip is to shard the height axis across the
mesh and exchange conv halos between neighbors with ``ppermute`` —
ring-style communication over ICI (SURVEY.md §5.7). These primitives are
exact: a ``sharded_conv3x3`` over an H-sharded frame equals the unsharded
conv bit-for-bit.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def halo_exchange(x: jax.Array, halo: int, axis_name: str) -> jax.Array:
    """Pad an H-sharded block (n, h_local, w, c) with ``halo`` rows from the
    neighboring shards (zeros at the global boundary).

    Returns (n, h_local + 2*halo, w, c).
    """
    idx = jax.lax.axis_index(axis_name)
    n_shards = jax.lax.axis_size(axis_name)

    top_rows = x[:, :halo]  # rows my TOP neighbor needs as its bottom halo
    bot_rows = x[:, -halo:]  # rows my BOTTOM neighbor needs as its top halo

    # send bottom rows downward (shard i -> i+1), top rows upward
    down = [(i, (i + 1) % n_shards) for i in range(n_shards)]
    up = [(i, (i - 1) % n_shards) for i in range(n_shards)]
    from_top = jax.lax.ppermute(bot_rows, axis_name, down)  # my top halo
    from_bot = jax.lax.ppermute(top_rows, axis_name, up)  # my bottom halo

    # zero the wrapped-around halos at the global boundary
    from_top = jnp.where(idx == 0, jnp.zeros_like(from_top), from_top)
    from_bot = jnp.where(idx == n_shards - 1, jnp.zeros_like(from_bot), from_bot)
    return jnp.concatenate([from_top, x, from_bot], axis=1)


def sharded_conv3x3(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array | None,
    mesh: Mesh,
    axis: str = "data",
) -> jax.Array:
    """'same' 3x3 conv over an H-sharded NHWC frame, exact via halo exchange.

    x: (N, H, W, C) logically; sharded as P(None, axis) over the mesh.
    kernel: (3, 3, C, O) replicated.
    """

    def local(xb, kb, bb):
        xb = halo_exchange(xb, 1, axis)
        out = jax.lax.conv_general_dilated(
            xb,
            kb,
            window_strides=(1, 1),
            padding=[(0, 0), (1, 1)],  # H handled by the halo; W 'same'
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=jax.lax.Precision.HIGHEST,
        )
        if bb is not None:
            out = out + bb
        return out

    spec_x = P(None, axis, None, None)
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(spec_x, P(), P()),
        out_specs=spec_x,
    )
    return fn(x, kernel, bias if bias is not None else jnp.zeros((kernel.shape[-1],), x.dtype))


def shard_frame_height(x: jax.Array, mesh: Mesh, axis: str = "data") -> jax.Array:
    """Place (N, H, W, C) with H sharded over the mesh axis."""
    return jax.device_put(x, NamedSharding(mesh, P(None, axis, None, None)))

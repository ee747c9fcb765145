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


class SpatialStreamingRunner:
    """Frame-by-frame inference with ONE frame sharded by height across
    the mesh — the full-model extension of the halo-conv primitive above.

    Every frame-shaped tensor (inputs, the recurrent state's feature
    planes, the output) carries a ``P(None, axis)`` height sharding and
    the whole step is compiled under GSPMD, which partitions the convs
    with halo exchanges and the up/down-samples with the matching
    collectives over ICI. The math is the unsharded step's — exactness is
    pinned by tests/test_spatial.py::test_spatial_streaming_matches_single
    on the 8-device virtual mesh.

    The reference has no spatial distribution at all; its answer to
    frames too large for one device is the lossy warp_size ROI crop
    (/root/reference/model/CRFP_runtime.py:8492). This runner keeps the
    full frame and scales it across the slice instead (SURVEY.md §5.7).

    Same call surface as :class:`crfp_tpu.models.streaming.StreamingRunner`
    (no ``fg`` gating — regional gating and spatial sharding compose
    poorly, and the point of sharding is NOT cropping).
    """

    def __init__(self, model, params, mesh: Mesh, axis: str = "data"):
        self.model = model
        self.mesh = mesh
        self.axis = axis
        repl = NamedSharding(mesh, P())
        self.params = jax.device_put(params, repl)
        self._state = None
        self._pre_lr = None

        def frame_sharding(x):
            # frame-shaped leaves (N, H, ..., C): shard the height axis;
            # anything smaller is replicated
            if hasattr(x, "ndim") and x.ndim >= 3:
                return NamedSharding(mesh, P(None, axis))
            return repl

        self._frame_sharding = frame_sharding

        def first(params, lr, fv, mk):
            def fwd(mdl):
                x_lr, x_hr = mdl.encode_frame(lr, fv, mk)
                return mdl.step0(lr, x_lr, x_hr, mk)

            return model.apply(params, method=fwd)

        def nxt(params, state, pre_lr, lr, fv, mk):
            def fwd(mdl):
                flow = mdl.compute_flow(lr, pre_lr)
                x_lr, x_hr = mdl.encode_frame(lr, fv, mk)
                return mdl.step(state, lr, x_lr, x_hr, mk, flow, None)

            return model.apply(params, method=fwd)

        fs = NamedSharding(mesh, P(None, axis))
        self._first = jax.jit(first, in_shardings=(repl, fs, fs, fs))
        # state shardings resolve per-leaf at the first next() call
        self._nxt_fn = nxt

    def clear_states(self) -> None:
        self._state = None
        self._pre_lr = None

    def __call__(self, lr: jax.Array, fv: jax.Array, mk: jax.Array) -> jax.Array:
        shard = lambda t: jax.tree.map(  # noqa: E731
            lambda x: jax.device_put(x, self._frame_sharding(x)), t)
        lr, fv, mk = shard(lr), shard(fv), shard(mk)
        if self._state is None:
            self._state, out = self._first(self.params, lr, fv, mk)
            self._state = shard(self._state)
            self._next = jax.jit(self._nxt_fn)
        else:
            self._state, out = self._next(
                self.params, self._state, self._pre_lr, lr, fv, mk)
            self._state = shard(self._state)
        self._pre_lr = lr
        return out

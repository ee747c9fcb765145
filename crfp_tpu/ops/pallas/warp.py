"""Pallas windowed flow-warp: the DCN interpolation-matrix kernel at k=1.

Backward warp by optical flow (the reference's ``flow_warp``,
/root/reference/model/CRFP.py:90-130) with displacements clamped to a
window: bilinear sampling at ``p + flow(p)`` is exactly the windowed
deformable conv (crfp_tpu/ops/pallas/dcn.py) with a single 1x1 tap, unit
mask and an identity weight, so this module is a thin wrapper over that
Mosaic kernel — one row-interpolation matmul plus one fused
column-reduce per tile instead of ~1 XLA gather slice per output pixel
(~10-30 ns each; the full-frame 720p state warp measured 21 ms as
gathers vs ~3 ms here, docs/PERF.md).

Flow magnitude in the trunk is unbounded, so this is an opt-in trade
(same spirit as the reference's own warp_size ROI): displacements beyond
``max_displacement`` clamp. The exact XLA gather formulation remains at
:func:`crfp_tpu.ops.warp.flow_warp` and is the default everywhere except
the windowed runtime configuration.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from crfp_tpu.ops.pallas.dcn import deform_conv2d_pallas_vjp
from crfp_tpu.ops.warp import flow_warp as flow_warp_xla  # noqa: F401 (re-export)


def flow_warp_windowed_pallas(
    x: jax.Array,
    flow: jax.Array,
    *,
    max_displacement: int = 32,
    interpret: bool = False,
) -> jax.Array:
    """Warp ``x`` (N,H,W,C) by ``flow`` (N,H,W,2; channels (dx, dy) like
    flow_warp), zeros padding, align_corners=True, displacements clamped
    to ``±max_displacement``."""
    n, h, w, c = x.shape
    off = jnp.stack([flow[..., 1], flow[..., 0]], axis=-1).reshape(n, h, w, 1, 1, 2)
    eye = jnp.eye(c, dtype=x.dtype).reshape(1, 1, c, c)
    # one tap -> per-cell compute is tiny; tall bands amortize the per-cell
    # costs (sweep on the v5e: band 64 8.8 ms vs band 16 13.9 ms at 720p).
    # The VJP wrapper keeps this differentiable (backward via the XLA
    # windowed formulation) for the training path.
    return deform_conv2d_pallas_vjp(
        x, off, None, eye, None,
        max_displacement=max_displacement, band=64, xtile=32,
        interpret=interpret,
    )


def flow_warp_maybe_windowed(
    x: jax.Array, flow: jax.Array, window: int | None
) -> jax.Array:
    """Model-side dispatch: exact gather warp when ``window`` is None; the
    Pallas windowed kernel on TPU; an exactly-equivalent clipped-flow
    gather warp elsewhere (clamping flow == clamping displacements)."""
    if window is None:
        return flow_warp_xla(x, flow)
    if jax.default_backend() == "tpu":
        return flow_warp_windowed_pallas(x, flow, max_displacement=window)
    return flow_warp_xla(x, jnp.clip(flow, -float(window), float(window)))


# legacy alias: the unbounded-flow path stays on XLA gathers
flow_warp_pallas = flow_warp_xla

__all__ = ["flow_warp_windowed_pallas", "flow_warp_maybe_windowed", "flow_warp_pallas"]

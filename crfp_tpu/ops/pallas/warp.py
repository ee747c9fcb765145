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
    anchor: bool = False,
    anchor_vjp: bool = False,
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
        anchor=anchor, anchor_vjp=anchor_vjp, interpret=interpret,
    )


def flow_warp_windowed_pallas_s2d(
    x_s2d: jax.Array,
    flow_s2d: jax.Array,
    *,
    r: int = 4,
    max_displacement: int = 32,
    anchor: bool = False,
    anchor_vjp: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """The windowed warp with every operand in space-to-depth(r) layout
    (unchanged full-resolution sampling semantics): x (N, H/r, W/r,
    C*r^2) c-major, flow (N, H/r, W/r, 2*r^2) = pixel_unshuffle of the
    (dx, dy) field, output s2d. Folding the relayouts into the kernel's
    prep/post transposes removes the pixel_shuffle/unshuffle copy pairs
    that bracketed the warp in the hr_s2d model (round-3 device trace)."""
    n, hs, ws, cs = x_s2d.shape
    r2 = r * r
    c = cs // r2
    dy = flow_s2d[..., r2:]
    dx = flow_s2d[..., :r2]
    off = jnp.stack([dy, dx], axis=-2)[:, :, :, None, None]  # (n,hs,ws,1,1,2,r2)
    eye = jnp.eye(c, dtype=x_s2d.dtype).reshape(1, 1, c, c)
    # in s2d layout the grid has H/r rows, so the band sweep lands lower
    # than the full-res path's 64: band 32 measures 1.45 ms vs 1.94 at
    # band 64 (720^2 ROI state, D=32; 1.04 vs 1.61 anchored — round-3
    # sweep, docs/PERF.md).
    return deform_conv2d_pallas_vjp(
        x_s2d, off, None, eye, None,
        max_displacement=max_displacement, band=32, xtile=32, s2d=r,
        anchor=anchor, anchor_vjp=anchor_vjp, interpret=interpret,
    )


def flow_warp_maybe_windowed(
    x: jax.Array, flow: jax.Array, window: int | None, *,
    anchor: bool = False,
    anchor_vjp: bool = False,
) -> jax.Array:
    """Model-side dispatch: exact gather warp when ``window`` is None; the
    Pallas windowed kernel on TPU; an exactly-equivalent clipped-flow
    gather warp elsewhere (clamping flow == clamping displacements)."""
    if window is None:
        return flow_warp_xla(x, flow)
    if jax.default_backend() == "tpu":
        return flow_warp_windowed_pallas(x, flow, max_displacement=window,
                                         anchor=anchor, anchor_vjp=anchor_vjp)
    return flow_warp_xla(x, jnp.clip(flow, -float(window), float(window)))


def flow_warp_maybe_windowed_s2d(
    x_s2d: jax.Array, flow_s2d: jax.Array, window: int | None, r: int = 4, *,
    anchor: bool = False,
    anchor_vjp: bool = False,
) -> jax.Array:
    """s2d-layout counterpart of :func:`flow_warp_maybe_windowed` (used by
    the hr_s2d model tail, which keeps its HR state in s2d(4) layout).
    Off-TPU it round-trips through the full-res layout — correctness-only
    paths (tests, CPU) pay the relayout, the TPU kernel does not."""
    from crfp_tpu.ops.shuffle import pixel_shuffle, pixel_unshuffle

    if window is not None and jax.default_backend() == "tpu":
        return flow_warp_windowed_pallas_s2d(
            x_s2d, flow_s2d, r=r, max_displacement=window, anchor=anchor,
            anchor_vjp=anchor_vjp)
    x = pixel_shuffle(x_s2d, r)
    flow = pixel_shuffle(flow_s2d, r)
    if window is None:
        return pixel_unshuffle(flow_warp_xla(x, flow), r)
    return pixel_unshuffle(
        flow_warp_xla(x, jnp.clip(flow, -float(window), float(window))), r)


# legacy alias: the unbounded-flow path stays on XLA gathers
flow_warp_pallas = flow_warp_xla

__all__ = [
    "flow_warp_windowed_pallas",
    "flow_warp_windowed_pallas_s2d",
    "flow_warp_maybe_windowed",
    "flow_warp_maybe_windowed_s2d",
    "flow_warp_pallas",
]

"""Backward warping by optical flow (torch ``grid_sample`` parity), NHWC.

Matches the reference ``flow_warp`` (/root/reference/model/CRFP.py:90-130):
sample position is ``grid + flow`` in pixel units; ``align_corners=True``
normalization means the un-normalized position IS the pixel coordinate.
``padding_mode`` is ``'zeros'`` in the trunk and ``'border'`` inside SPyNet
(/root/reference/model/CRFP.py:644).

Implemented as four flat gathers + bilinear blend. This XLA formulation is
also reused by the deformable-conv op. A gather-free windowed Pallas
kernel exists for the DCN (crfp_tpu/ops/pallas/dcn.py); the plain warp's
flow magnitude is unbounded, so it stays on the XLA gather path
(crfp_tpu/ops/pallas/warp.py documents the trade).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bilinear_sample(
    x: jax.Array,
    sx: jax.Array,
    sy: jax.Array,
    padding_mode: str = "zeros",
) -> jax.Array:
    """Sample ``x`` (N,H,W,C) at float pixel coords ``sx``/``sy`` (N,*spatial).

    Returns (N, *spatial, C). Equivalent to torch ``grid_sample`` with
    ``mode='bilinear'``, ``align_corners=True`` and the given padding mode
    after un-normalizing the torch grid back to pixel coordinates.
    """
    n, h, w, c = x.shape
    spatial = sx.shape[1:]
    sx = sx.reshape(n, -1).astype(jnp.float32)
    sy = sy.reshape(n, -1).astype(jnp.float32)

    if padding_mode == "border":
        sx = jnp.clip(sx, 0.0, w - 1)
        sy = jnp.clip(sy, 0.0, h - 1)
    elif padding_mode != "zeros":
        raise ValueError(f"unsupported padding_mode: {padding_mode}")

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = x0i + 1
    y1i = y0i + 1

    if padding_mode == "zeros":
        vx0 = (x0i >= 0) & (x0i <= w - 1)
        vx1 = (x1i >= 0) & (x1i <= w - 1)
        vy0 = (y0i >= 0) & (y0i <= h - 1)
        vy1 = (y1i >= 0) & (y1i <= h - 1)
    x0c = jnp.clip(x0i, 0, w - 1)
    x1c = jnp.clip(x1i, 0, w - 1)
    y0c = jnp.clip(y0i, 0, h - 1)
    y1c = jnp.clip(y1i, 0, h - 1)

    flat = x.reshape(n, h * w, c)

    def gather(yi, xi):
        idx = yi * w + xi
        return jnp.take_along_axis(flat, idx[:, :, None], axis=1)

    v00 = gather(y0c, x0c)
    v01 = gather(y0c, x1c)
    v10 = gather(y1c, x0c)
    v11 = gather(y1c, x1c)

    w00 = ((1.0 - fy) * (1.0 - fx))[:, :, None]
    w01 = ((1.0 - fy) * fx)[:, :, None]
    w10 = (fy * (1.0 - fx))[:, :, None]
    w11 = (fy * fx)[:, :, None]

    if padding_mode == "zeros":
        w00 = w00 * (vy0 & vx0)[:, :, None]
        w01 = w01 * (vy0 & vx1)[:, :, None]
        w10 = w10 * (vy1 & vx0)[:, :, None]
        w11 = w11 * (vy1 & vx1)[:, :, None]

    out = v00 * w00 + v01 * w01 + v10 * w10 + v11 * w11
    return out.reshape(n, *spatial, c).astype(x.dtype)


def bilinear_sample_patch(x: jax.Array, sx: jax.Array, sy: jax.Array) -> jax.Array:
    """bilinear_sample (zeros padding) via ONE (2,2,C)-slice gather per
    sample instead of four row gathers.

    XLA TPU gather cost is dominated by slice COUNT (~10-30 ns each,
    docs/PERF.md), so fetching the 2x2 corner patch in one slice is ~1.4x
    faster at deformable-conv shapes. The operand is zero-padded by 2 so
    partially-valid patches gather unclamped with static corner indices.
    """
    n, h, w, c = x.shape
    spatial = sx.shape[1:]
    sx = sx.reshape(n, -1).astype(jnp.float32)
    sy = sy.reshape(n, -1).astype(jnp.float32)
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = (sx - x0)[..., None]
    fy = (sy - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    P = 2
    xp = jnp.pad(x, ((0, 0), (P, P), (P, P), (0, 0)))
    hp, wp = h + 2 * P, w + 2 * P
    s_y = jnp.clip(y0i + P, 0, hp - 2)
    s_x = jnp.clip(x0i + P, 0, wp - 2)

    def g1(xb, syb, sxb):
        starts = jnp.stack([syb, sxb], axis=-1)
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3), collapsed_slice_dims=(), start_index_map=(0, 1)
        )
        return jax.lax.gather(
            xb, starts, dn, slice_sizes=(2, 2, c), mode=jax.lax.GatherScatterMode.CLIP
        )

    p = jax.vmap(g1)(xp, s_y, s_x)  # (n, N, 2, 2, c)

    def valid(dy, dx):
        return (
            ((y0i + dy) >= 0) & ((y0i + dy) < h) & ((x0i + dx) >= 0) & ((x0i + dx) < w)
        )[..., None]

    out = (
        p[:, :, 0, 0] * valid(0, 0) * (1 - fy) * (1 - fx)
        + p[:, :, 0, 1] * valid(0, 1) * (1 - fy) * fx
        + p[:, :, 1, 0] * valid(1, 0) * fy * (1 - fx)
        + p[:, :, 1, 1] * valid(1, 1) * fy * fx
    )
    return out.reshape(n, *spatial, c).astype(x.dtype)


def flow_warp(x: jax.Array, flow: jax.Array, padding_mode: str = "zeros") -> jax.Array:
    """Warp NHWC ``x`` by ``flow`` (N,H,W,2) with channels (dx, dy) in pixels."""
    n, h, w, _ = x.shape
    assert flow.shape[1:3] == (h, w), (x.shape, flow.shape)
    gy = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    gx = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    sx = gx + flow[..., 0]
    sy = gy + flow[..., 1]
    return bilinear_sample(x, sx, sy, padding_mode=padding_mode)

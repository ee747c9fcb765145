"""Modulated deformable convolution v2 (DCNv2) as a TPU-native op.

Replaces the reference's external CUDA extension (`dcn_v2.DCNv2`, imported
at /root/reference/model/CRFP.py:6 and driven by DCN_module at
/root/reference/model/CRFP.py:281-370). Semantics: for every output pixel,
k*k bilinear samples are gathered at ``p + p_k + offset_k`` per deformable
group, scaled by a sigmoid mask, then contracted with the conv weight.

TPU-first formulation: one (2,2,C)-slice gather per (group, tap) sample
(slice COUNT dominates XLA TPU gather cost — docs/PERF.md), accumulated
tap by tap into an MXU contraction so the k2-wide sampled tensor never
materializes. XLA autodiff of the gather yields the scatter-add backward,
so the op is trainable without a custom VJP (slowly — the gathers/scatters
bound both directions; see docs/PERF.md).

Offset convention (structured, not torch's packed channels):
``offset[..., 0] = dy``, ``offset[..., 1] = dx`` per (group, tap), taps in
(ky, kx) row-major order — matching the packed DCNv2 layout
``[g][tap][y,x]`` produced by the reference's offset head
(/root/reference/model/CRFP.py:337-349).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from crfp_tpu.ops.warp import bilinear_sample, bilinear_sample_patch


def deform_conv2d(
    x: jax.Array,
    offset: jax.Array,
    mask: jax.Array,
    weight: jax.Array,
    bias: jax.Array | None = None,
) -> jax.Array:
    """Modulated deformable conv, stride 1, 'same' padding, dilation 1.

    Args:
      x: (N, H, W, C) input features.
      offset: (N, H, W, G, K2, 2) sample offsets, last dim (dy, dx).
      mask: (N, H, W, G, K2) modulation scalars (already sigmoid-activated).
      weight: (kh, kw, C, O) conv kernel (HWIO, like a regular conv).
      bias: (O,) or None.

    Returns:
      (N, H, W, O) output features.
    """
    n, h, w, c = x.shape
    kh, kw, wc, o = weight.shape
    assert wc == c, (weight.shape, x.shape)
    k2 = kh * kw
    g = offset.shape[3]
    assert offset.shape == (n, h, w, g, k2, 2), offset.shape
    assert mask.shape == (n, h, w, g, k2), mask.shape
    assert c % g == 0, (c, g)
    cpg = c // g
    pad_y = (kh - 1) // 2
    pad_x = (kw - 1) // 2

    # Absolute sampling coordinates per (pixel, group, tap).
    gy = jnp.arange(h, dtype=jnp.float32).reshape(1, h, 1, 1, 1)
    gx = jnp.arange(w, dtype=jnp.float32).reshape(1, 1, w, 1, 1)
    ty = (jnp.arange(kh, dtype=jnp.float32) - pad_y).repeat(kw).reshape(1, 1, 1, 1, k2)
    tx = jnp.tile(jnp.arange(kw, dtype=jnp.float32) - pad_x, kh).reshape(1, 1, 1, 1, k2)
    sy = gy + ty + offset[..., 0]  # (n, h, w, g, k2)
    sx = gx + tx + offset[..., 1]

    # Group-sliced layout: batch over (n, g).
    xg = x.reshape(n, h, w, g, cpg).transpose(0, 3, 1, 2, 4).reshape(n * g, h, w, cpg)
    sy = sy.transpose(0, 3, 1, 2, 4).reshape(n * g, h, w, k2)
    sx = sx.transpose(0, 3, 1, 2, 4).reshape(n * g, h, w, k2)
    mk = mask.transpose(0, 3, 1, 2, 4).reshape(n * g, h, w, k2)

    # full-f32 MXU passes: bf16-rounded inputs (TPU default) lose ~2^-8
    # relative accuracy per term, which blows the 0.05 dB parity budget
    prec = None if x.dtype == jnp.bfloat16 else jax.lax.Precision.HIGHEST
    w2 = weight.reshape(k2, g, cpg, o)

    # accumulate tap by tap: the (n, h, w, g*k2*cpg) sampled tensor is
    # never materialized (at batch>1 XLA stops fusing the big gather and
    # that buffer would be ~k2x the feature map in HBM — 18.9 GB for a
    # batch-8 720p stage)
    out = jnp.zeros((n, h, w, o), jnp.float32)
    for k in range(k2):
        samp = bilinear_sample_patch(xg, sx[..., k], sy[..., k])
        samp = samp * mk[..., k][..., None]
        samp = samp.reshape(n, g, h, w, cpg)
        out = out + jnp.einsum(
            "nghwc,gco->nhwo",
            samp,
            w2[k].astype(samp.dtype),
            preferred_element_type=jnp.float32,
            precision=prec,
        )
    if bias is not None:
        out = out + bias
    return out.astype(x.dtype)


def deform_conv2d_shared_offset(
    x: jax.Array,
    offset: jax.Array,
    mask: jax.Array,
    weight: jax.Array,
    bias: jax.Array | None = None,
) -> jax.Array:
    """DCN fast path for repeat mode (one offset pair broadcast to all taps).

    When every tap shares one (dy, dx) — the reference's ``repeat=True``
    dcn_3 at full 8x resolution (/root/reference/model/CRFP.py:341-347) —
    all 3x3 taps sample positions ``q + t`` with a COMMON fractional part,
    so the 9 taps x 4 corners = 36 gathers collapse to the 4x4 integer
    patch around ``q`` (16 gathers). This is the gather-traffic-optimal
    formulation for the hottest (full-res) DCN stage.

    Args:
      x: (N, H, W, C); offset: (N, H, W, 2) shared (dy, dx) including flow;
      mask: (N, H, W, K2) per-tap modulation; weight: (kh, kw, C, O).
    """
    n, h, w, c = x.shape
    kh, kw, wc, o = weight.shape
    assert wc == c
    k2 = kh * kw
    assert offset.shape == (n, h, w, 2), offset.shape
    assert mask.shape == (n, h, w, k2), mask.shape
    pad_y, pad_x = (kh - 1) // 2, (kw - 1) // 2

    gy = jnp.arange(h, dtype=jnp.float32).reshape(1, h, 1)
    gx = jnp.arange(w, dtype=jnp.float32).reshape(1, 1, w)
    qy = gy + offset[..., 0]
    qx = gx + offset[..., 1]
    fy0 = jnp.floor(qy)
    fx0 = jnp.floor(qx)
    ry = (qy - fy0)[..., None]  # (n,h,w,1)
    rx = (qx - fx0)[..., None]
    y0 = fy0.astype(jnp.int32)
    x0 = fx0.astype(jnp.int32)

    # ONE (kh+1, kw+1, C) slice gather per pixel instead of (kh+1)*(kw+1)
    # row gathers: XLA TPU gather cost is per-slice (~tens of ns), so slice
    # count, not byte count, dominates (docs/PERF.md). The operand is
    # zero-padded so every PARTIALLY-valid patch gathers unclamped, making
    # the within-patch tap indices static; fully-out-of-range patches clamp
    # and are killed by the validity masks.
    ph, pw = kh + 1, kw + 1
    pady = pad_y + 2
    padx = pad_x + 2
    xp = jnp.pad(x, ((0, 0), (pady, pady), (padx, padx), (0, 0)))
    hp, wp = h + 2 * pady, w + 2 * padx
    sy0 = jnp.clip(y0 - pad_y + pady, 0, hp - ph)
    sx0 = jnp.clip(x0 - pad_x + padx, 0, wp - pw)

    def gather_one(xb, syb, sxb):
        starts = jnp.stack([syb.reshape(-1), sxb.reshape(-1)], axis=-1)
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3), collapsed_slice_dims=(), start_index_map=(0, 1)
        )
        return jax.lax.gather(
            xb, starts, dn, slice_sizes=(ph, pw, c),
            mode=jax.lax.GatherScatterMode.CLIP,
        )

    patches = jax.vmap(gather_one)(xp, sy0, sx0)  # (n, h*w, ph, pw, c)
    patches = patches.reshape(n, h, w, ph, pw, c)

    def fetch(dy, dx):
        yy = y0 + dy
        xx = x0 + dx
        valid = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
        v = patches[:, :, :, pad_y + dy, pad_x + dx, :]
        return v * valid[..., None]

    wy = (1.0 - ry, ry)
    wx = (1.0 - rx, rx)
    out = jnp.zeros((n, h, w, o), jnp.float32)
    for t in range(k2):
        ty, tx = t // kw, t % kw
        samp = jnp.zeros((n, h, w, c), jnp.float32)
        for dy in range(2):
            for dx in range(2):
                samp = samp + wy[dy] * wx[dx] * fetch(ty + dy - pad_y, tx + dx - pad_x)
        samp = samp * mask[..., t : t + 1]
        out = out + jnp.einsum(
            "nhwc,co->nhwo",
            samp,
            weight[ty, tx].astype(samp.dtype),
            preferred_element_type=jnp.float32,
            precision=None if x.dtype == jnp.bfloat16 else jax.lax.Precision.HIGHEST,
        )
    if bias is not None:
        out = out + bias
    return out.astype(x.dtype)

"""Gather-free deformable conv: two-stage interpolation matrices on the MXU.

The exact gather formulation (crfp_tpu/ops/dcn.py) is bound by XLA's
per-slice gather cost on TPU (docs/PERF.md). This formulation removes the
gathers entirely by clamping sample displacements to a window ``D`` and
factorizing the bilinear sample per output tile:

1. row interpolation: a 2-sparse (queries x H_win) matrix R contracts
   with the tile's source window on the MXU;
2. column interpolation: a 2-sparse (queries x W_win) matrix C reduces
   the stage-1 rows per query.

Semantics: identical to ``deform_conv2d`` whenever every |offset| <= D
(offsets beyond D are clamped — the same kind of bounded-support trade as
the reference's own warp_size ROI, /root/reference/model/CRFP_runtime.py).
Zero padding of the source window reproduces the 'zeros' boundary
semantics without validity masks.

Processed as a lax.map over output (row-band x column-tile) cells so only
one tile's intermediates are live at a time.

Tile-size choice matters: the one-hot matrices R/C are 2-sparse, so MXU
waste scales with the window extents (band + 2*halo, xtile + 2*halo).
Small tiles win despite the halo overhead — a true-sync sweep at the lv3
alignment shapes (180x320, 8 groups, D=8) on v5e measured 112.7 ms at
(band=16, xtile=160) vs 25-45 ms for every config with band<=16 and
xtile<=32 (f32 and bf16); the defaults encode the sweep's winner
(band=8, xtile=16: 25.5 ms bf16 / 40.6 ms f32, and the fastest
end-to-end v18 step of the configs tried).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def deform_conv2d_windowed(
    x: jax.Array,
    offset: jax.Array,
    mask: jax.Array,
    weight: jax.Array,
    bias: jax.Array | None = None,
    *,
    max_displacement: int = 16,
    band: int = 8,
    xtile: int = 16,
) -> jax.Array:
    """Same signature/layout as deform_conv2d plus the window config.

    x: (N, H, W, C); offset: (N, H, W, G, K2, 2) (dy, dx); mask
    (N, H, W, G, K2); weight (kh, kw, C, O).
    """
    n, h, w, c = x.shape
    kh, kw, wc, o = weight.shape
    assert wc == c
    k2 = kh * kw
    g = offset.shape[3]
    cpg = c // g
    pad_y, pad_x = (kh - 1) // 2, (kw - 1) // 2
    D = max_displacement
    # halo covers clamped displacement + tap reach + bilinear corner
    halo = D + max(pad_y, pad_x) + 2

    band = min(band, h)
    xtile = min(xtile, w)
    n_bands = -(-h // band)
    n_tiles = -(-w // xtile)
    h_pad = n_bands * band - h
    w_pad = n_tiles * xtile - w

    hw_win = band + 2 * halo
    ww_win = xtile + 2 * halo

    # zero padding implements the 'zeros' boundary semantics AND guarantees
    # every clamped sample position lands inside its tile window
    xp = jnp.pad(x, ((0, 0), (halo, halo + h_pad), (halo, halo + w_pad), (0, 0)))

    # clamp displacements, then absolute sample positions
    off = jnp.clip(offset, -float(D), float(D))
    gy = jnp.arange(h, dtype=jnp.float32).reshape(1, h, 1, 1, 1)
    gx = jnp.arange(w, dtype=jnp.float32).reshape(1, 1, w, 1, 1)
    ty = (jnp.arange(kh, dtype=jnp.float32) - pad_y).repeat(kw).reshape(1, 1, 1, 1, k2)
    tx = jnp.tile(jnp.arange(kw, dtype=jnp.float32) - pad_x, kh).reshape(1, 1, 1, 1, k2)
    sy = gy + ty + off[..., 0]  # (n, h, w, g, k2), in unpadded coords
    sx = gx + tx + off[..., 1]
    syp = jnp.pad(sy, ((0, 0), (0, h_pad), (0, w_pad), (0, 0), (0, 0)))
    sxp = jnp.pad(sx, ((0, 0), (0, h_pad), (0, w_pad), (0, 0), (0, 0)))
    mkp = jnp.pad(mask, ((0, 0), (0, h_pad), (0, w_pad), (0, 0), (0, 0)))

    prec = None if x.dtype == jnp.bfloat16 else jax.lax.Precision.HIGHEST
    w2 = weight.reshape(k2, g, cpg, o)  # (k2, g, cpg, o)

    q_per_px = g * k2
    nq = band * xtile * q_per_px

    hw_iota = jnp.arange(hw_win, dtype=jnp.float32)
    ww_iota = jnp.arange(ww_win, dtype=jnp.float32)

    def cell(args):
        bi, tj = args
        y0 = bi * band
        x0 = tj * xtile
        # window in padded coords starts at (y0, x0) (the halo shift cancels)
        win = jax.lax.dynamic_slice(
            xp, (0, y0, x0, 0), (n, hw_win, ww_win, c)
        )  # (n, hw, ww, c)
        syt = jax.lax.dynamic_slice(syp, (0, y0, x0, 0, 0), (n, band, xtile, g, k2))
        sxt = jax.lax.dynamic_slice(sxp, (0, y0, x0, 0, 0), (n, band, xtile, g, k2))
        mkt = jax.lax.dynamic_slice(mkp, (0, y0, x0, 0, 0), (n, band, xtile, g, k2))

        # local window coordinates (always within [0, win-2] by construction)
        ly = syt - (y0 - halo)
        lx = sxt - (x0 - halo)
        y0i = jnp.floor(ly)
        x0i = jnp.floor(lx)
        fy = (ly - y0i)[..., None]  # (n, band, xtile, g, k2, 1)
        fx = (lx - x0i)[..., None]

        # queries laid out (n, g, band*xtile*k2)
        def qshape(a):
            return a.transpose(0, 3, 1, 2, 4).reshape(n, g, band * xtile * k2)

        y0q = qshape(y0i)
        x0q = qshape(x0i)
        fyq = qshape(fy[..., 0])[..., None]
        fxq = qshape(fx[..., 0])[..., None]

        # R: (n, g, Q, hw_win) 2-sparse row-interpolation matrix
        R = ((hw_iota == y0q[..., None]) * (1.0 - fyq)
             + (hw_iota == (y0q[..., None] + 1.0)) * fyq)
        # C: (n, g, Q, ww_win)
        C = ((ww_iota == x0q[..., None]) * (1.0 - fxq)
             + (ww_iota == (x0q[..., None] + 1.0)) * fxq)

        wing = win.reshape(n, hw_win, ww_win, g, cpg).transpose(0, 3, 1, 2, 4)
        wing = wing.reshape(n, g, hw_win, ww_win * cpg)
        # stage 1: row interpolation on the MXU
        v = jnp.einsum("ngqh,nghd->ngqd", R.astype(x.dtype), wing,
                       precision=prec, preferred_element_type=jnp.float32)
        v = v.reshape(n, g, -1, ww_win, cpg)
        # stage 2: column interpolation (per-query reduce)
        samp = jnp.einsum("ngqw,ngqwc->ngqc", C.astype(v.dtype), v,
                          precision=prec, preferred_element_type=jnp.float32)
        # modulate and contract with the conv weight
        samp = samp.reshape(n, g, band * xtile, k2, cpg)
        mkq = mkt.transpose(0, 3, 1, 2, 4).reshape(n, g, band * xtile, k2)
        samp = samp * mkq[..., None]
        out = jnp.einsum("ngpkc,kgco->npo", samp, w2.astype(samp.dtype),
                         precision=prec, preferred_element_type=jnp.float32)
        return out.reshape(n, band, xtile, o)

    grid = jnp.stack(
        jnp.meshgrid(jnp.arange(n_bands), jnp.arange(n_tiles), indexing="ij"),
        axis=-1,
    ).reshape(-1, 2)
    # chunked map: vmap a handful of cells per map iteration so the device
    # runs few big ops instead of hundreds of tiny sequential ones, while
    # intermediates stay bounded to chunk x per-cell size
    n_cells = grid.shape[0]
    chunk = 8
    pad_cells = -n_cells % chunk
    if pad_cells:
        grid = jnp.concatenate([grid, jnp.zeros((pad_cells, 2), grid.dtype)], axis=0)
    gridc = grid.reshape(-1, chunk, 2)
    tiles = jax.lax.map(
        lambda gc: jax.vmap(cell)((gc[:, 0], gc[:, 1])), gridc
    )  # (chunks, chunk, n, band, xtile, o)
    tiles = tiles.reshape(-1, n, band, xtile, o)[:n_cells]
    tiles = tiles.reshape(n_bands, n_tiles, n, band, xtile, o)
    out = tiles.transpose(2, 0, 3, 1, 4, 5).reshape(n, n_bands * band, n_tiles * xtile, o)
    out = out[:, :h, :w]
    if bias is not None:
        out = out + bias
    return out.astype(x.dtype)

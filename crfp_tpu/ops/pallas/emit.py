"""Fused final-frame emission: depth-to-space + residual add, planar out.

The model tail (hr_s2d mode) produces the output frame in space-to-depth
layout (N, H/r, W/r, C*r^2) and the reference protocol's deliverable is
the full-resolution frame (the reference emits torch NCHW,
/root/reference/model/CRFP.py:899-906 + test harnesses). XLA lowers the
``pixel_shuffle`` + bilinear-base add as two materialized relayouts of the
12 MB 1080p frame at data-formatting rates (~1.6 ms of a ~20 ms step,
round-3 device trace: copy.2539 + reshape.381).

This kernel emits the frame directly in PLANAR (N, C, H, W) layout — W
dense on lanes, no small-channel tile padding — which is byte-identical
to the NHWC {2,1,3,0} layout XLA already assigns to the step output, so
the caller's ``transpose(0, 2, 3, 1)`` is a free relabeling.

The kernel input is the PLANAR transpose of the s2d frame, viewed as
(N, C, r^2, H/r, W/r): one explicit XLA transpose feeds it. (The first
version of this kernel took the NHWC s2d tensor flattened to
(H/r, W/r*C*r^2), but a Pallas operand takes the default layout, and that
standard-layout demand propagated THROUGH the elementwise tail into the
conv emitters — resblocks_3/conv_tttf/conv_last slowed ~3x, costing more
than the emission saved. The planar transpose is a real copy, but it is a
layout BOUNDARY: the convs upstream keep their preferred layouts.)

Per output row y = ys*r + py of plane c, the output lane o = xs*r + px
interleaves the r phase planes: with u = concat_px(plane[py*r+px][:,
32-lane tile j]) of shape (rows, 128), the interleave is one constant
128x128 0/1 matmul on the MXU (the same selection-matrix trick as the
windowed-DCN column stage). The 8x bilinear base residual is added in
f32 inside the kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@functools.lru_cache(maxsize=8)
def _interleave_matrix(r: int) -> np.ndarray:
    """(128, 128) 0/1: in lane px*(128/r) + xi -> out lane xi*r + px."""
    xs_per = 128 // r
    m = np.zeros((128, 128), np.float32)
    for px in range(r):
        for xi in range(xs_per):
            m[px * xs_per + xi, xi * r + px] = 1.0
    return m


def _emit_kernel(y_ref, m_ref, res_ref, out_ref, *, r, n_j, xs_per, bs,
                 w_out, has_res):
    """One grid step: s2d rows [bi*bs, +bs) -> output plane ci rows
    [bi*bs*r, +bs*r). y_ref block: (1, 1, r^2, bs, ws)."""
    m = m_ref[:]  # (128, 128)
    rows = []
    for py in range(r):
        tiles = []
        for j in range(n_j):
            u = jnp.concatenate(
                [y_ref[0, 0, py * r + px, :, pl.dslice(j * xs_per, xs_per)]
                 for px in range(r)], axis=1)  # (bs, 128)
            # the interleave matrix is 0/1 (each output = one u element):
            # exact as long as u itself is not rounded — pin HIGHEST for
            # f32 inputs (default MXU pass rounds operands to bf16,
            # ~4e-3 relative error measured on-chip)
            tiles.append(jax.lax.dot_general(
                u, m, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=(None if u.dtype == jnp.bfloat16
                           else jax.lax.Precision.HIGHEST)))
        rows.append(jnp.concatenate(tiles, axis=1))  # (bs, w_out) f32
    blk = jnp.stack(rows, axis=1).reshape(bs * r, w_out)
    if has_res:
        blk = blk + res_ref[0, 0].astype(jnp.float32)
    out_ref[0, 0] = blk.astype(out_ref.dtype)


def _band_geom(hs: int) -> tuple[int, int]:
    """(band rows, band count) for an hs-row s2d frame."""
    bs = min(48, -(-hs // 8) * 8)
    return bs, -(-hs // bs)


def emit_res_rows(hs: int, r: int = 4) -> int:
    """Row count the residual must be padded to (zero rows are free via
    ``upsample_planar(pad_to=...)``)."""
    bs, nb = _band_geom(hs)
    return nb * bs * r


def depth_to_space_add_chw(
    y_s2d: jax.Array,
    res_chw: jax.Array | None = None,
    *,
    r: int = 4,
    out_dtype=None,
    interpret: bool = False,
) -> jax.Array:
    """``pixel_shuffle(y_s2d, r) (+ res)`` emitted as (N, C, H, W) planar.

    y_s2d: (N, hs, ws, C*r^2) with c-major channels (= pixel_unshuffle of
    the logical frame); res_chw: (N, C, hs*r, ws*r) or None. Output is
    numerically ``pixel_shuffle(y_s2d, r) + res`` transposed to NCHW
    (f32 accumulate, cast to ``out_dtype`` / y's dtype).
    """
    n, hs, ws, cs = y_s2d.shape
    r2 = r * r
    assert cs % r2 == 0, (y_s2d.shape, r)
    assert 128 % r == 0, r
    c = cs // r2
    w_out = ws * r
    xs_per = 128 // r
    assert ws % xs_per == 0, ("s2d width must tile into 128-lane output "
                              "groups", ws, xs_per)
    n_j = ws // xs_per
    out_dtype = out_dtype or y_s2d.dtype
    # INPUT blocks must never be ragged (ragged blocks re-anchor, and the
    # compiled lowering wants 8/128-divisible block dims): pad the planar
    # feed's rows up to a whole number of bands — the pad fuses into the
    # transpose copy. Only the OUTPUT is ragged (masked writes).
    bs, nb = _band_geom(hs)
    pad_rows = nb * bs - hs
    m = jnp.asarray(_interleave_matrix(r), y_s2d.dtype)  # exact 0/1 in bf16

    # planar feed: one explicit relayout. CRITICAL ORDERING: the chain
    # must START with a reshape — XLA's space-to-batch conv pass (which
    # accelerates the whole HR conv tail ~5x at these (270,480,small-C)
    # shapes) stops cleanly at a reshape (that is how it coexists with
    # pixel_shuffle) but ROLLS BACK the entire chain when the consumer is
    # a transpose, costing far more than this kernel saves (measured,
    # docs/PERF.md round-3).
    yp = y_s2d.reshape(n, hs, ws, c, r2).transpose(0, 3, 4, 1, 2)
    if pad_rows:
        yp = jnp.pad(yp, ((0, 0), (0, 0), (0, 0), (0, pad_rows), (0, 0)))
    kern = functools.partial(
        _emit_kernel, r=r, n_j=n_j, xs_per=xs_per, bs=bs, w_out=w_out,
        has_res=res_chw is not None,
    )
    in_specs = [
        # block covers the whole r2 dim -> its block index is 0; the band
        # index bi selects along the ROWS dim (a bi-on-r2 mixup here is
        # invisible to single-band shapes — every original interpret test
        # had nb == 1 — and silently reads band 0 for every band when
        # compiled; caught by the on-chip multi-band probe, round 3)
        pl.BlockSpec((1, 1, r2, bs, ws), lambda ni, bi, ci: (ni, ci, 0, bi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),  # the 128x128 constant
    ]
    args = [yp, m]
    if res_chw is not None:
        # residual input blocks must not be ragged either: the caller pads
        # its rows to the band grid (upsample_planar(pad_to=...) emits the
        # pad rows as zero matrix rows, i.e. for free)
        assert res_chw.shape == (n, c, nb * bs * r, w_out), (
            res_chw.shape, (n, c, nb * bs * r, w_out))
        in_specs.append(
            pl.BlockSpec((1, 1, bs * r, w_out),
                         lambda ni, bi, ci: (ni, ci, bi, 0),
                         memory_space=pltpu.VMEM))
        args.append(res_chw)
    else:
        in_specs.append(
            pl.BlockSpec((1, 1), lambda ni, bi, ci: (0, 0),
                         memory_space=pltpu.SMEM))
        args.append(jnp.zeros((1, 1), jnp.float32))

    out = pl.pallas_call(
        kern,
        grid=(n, nb, c),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, bs * r, w_out),
                               lambda ni, bi, ci: (ni, ci, bi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, c, hs * r, w_out), out_dtype),
        interpret=interpret,
    )(*args)
    return out


def emit_frame_nhwc(y_s2d: jax.Array, r: int = 4) -> jax.Array:
    """Final-frame emission for ``ModelConfig.emit_s2d``: depth-to-space
    the model's s2d sum frame and return the logical NHWC frame.

    On TPU this is the Mosaic interleave kernel; its planar (N,C,H,W)
    output is byte-identical to the {2,1,3,0} layout XLA assigns the
    frame anyway, so the trailing transpose is a free relabeling. MUST be
    jitted as its OWN program: a pallas_call inside the step program
    makes XLA's space-to-batch pass roll back the HR conv chain
    (docs/PERF.md round-3 negative results) — as a separate per-frame
    program it replaces the step's 1.6 ms transpose+reshape relayout pair
    with one MXU interleave. Elsewhere: the plain XLA pixel_shuffle."""
    if jax.default_backend() == "tpu":
        return depth_to_space_add_chw(y_s2d, None, r=r).transpose(0, 2, 3, 1)
    from crfp_tpu.ops.shuffle import pixel_shuffle

    return pixel_shuffle(y_s2d, r)


def upsample_planar(x_nhwc: jax.Array, scale: int,
                    align_corners: bool = False,
                    pad_to: int | None = None) -> jax.Array:
    """Bilinear upsample emitted PLANAR (N, C, H*s, W*s): the same
    interpolation matrices as :func:`crfp_tpu.ops.resize.resize_bilinear`
    (torch ``F.interpolate`` parity) contracted in NCHW so every
    intermediate keeps W on dense lanes instead of a 3-channel minor dim.
    ``pad_to``: emit that many output rows, the extra ones zero (free —
    they are zero rows of the constant interpolation matrix)."""
    from crfp_tpu.ops.resize import _bilinear_matrix

    n, h, w, c = x_nhwc.shape
    oh, ow = h * scale, w * scale
    dtype = x_nhwc.dtype
    if dtype == jnp.bfloat16:
        prec, work = None, jnp.bfloat16
    else:
        prec, work = jax.lax.Precision.HIGHEST, jnp.float32
    xf = x_nhwc.astype(work).transpose(0, 3, 1, 2)  # (n, c, h, w) — tiny
    mh_np = _bilinear_matrix(h, oh, align_corners)
    if pad_to is not None and pad_to > oh:
        mh_np = np.pad(mh_np, ((0, pad_to - oh), (0, 0)))
    mh = jnp.asarray(mh_np).astype(work)
    mw = jnp.asarray(_bilinear_matrix(w, ow, align_corners)).astype(work)
    xf = jnp.einsum("Oh,nchw->ncOw", mh, xf, precision=prec,
                    preferred_element_type=jnp.float32).astype(work)
    xf = jnp.einsum("Ow,nchw->nchO", mw, xf, precision=prec,
                    preferred_element_type=jnp.float32)
    return xf.astype(dtype)


__all__ = ["depth_to_space_add_chw", "emit_frame_nhwc", "upsample_planar",
           "emit_res_rows"]

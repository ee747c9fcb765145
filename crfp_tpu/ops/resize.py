"""Separable bilinear resize with exact torch `F.interpolate` semantics.

The reference model resizes with ``nn.Upsample(mode='bilinear')`` both with
``align_corners=False`` (all image up/downsamples, e.g. the 8x base path,
/root/reference/model/CRFP.py:899-906) and ``align_corners=True`` (inside
SPyNet's coarse-to-fine flow upsampling, /root/reference/model/CRFP.py:635-639).
Torch does NOT antialias on downscale, so ``jax.image.resize`` (which does)
cannot be used for parity.

TPU-first design: a resize with static shapes is a pair of small dense
matrix multiplies (one per spatial axis) — each row of the weight matrix
has at most two non-zeros (the bilinear taps). Expressing the resize as
``W_h @ x @ W_w^T`` routes it onto the MXU and lets XLA fuse it with
surrounding elementwise work, instead of emitting gathers on the VPU.

All ops take NHWC tensors.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=128)
def _bilinear_matrix(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """(out_size, in_size) row-stochastic bilinear interpolation matrix."""
    assert in_size > 0 and out_size > 0, (in_size, out_size)
    if in_size == out_size:
        return np.eye(in_size, dtype=np.float32)
    if align_corners:
        if out_size == 1:
            src = np.zeros((1,), dtype=np.float64)
        else:
            src = np.arange(out_size, dtype=np.float64) * (in_size - 1) / (out_size - 1)
    else:
        scale = in_size / out_size
        src = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5
        # torch clamps source coordinates into the valid range (border replicate)
        src = np.clip(src, 0.0, in_size - 1)
    lo = np.floor(src).astype(np.int64)
    lo = np.clip(lo, 0, in_size - 1)
    hi = np.clip(lo + 1, 0, in_size - 1)
    frac = src - lo
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    rows = np.arange(out_size)
    np.add.at(mat, (rows, lo), 1.0 - frac)
    np.add.at(mat, (rows, hi), frac)
    return mat.astype(np.float32)


def resize_bilinear(x: jax.Array, out_hw: tuple[int, int], align_corners: bool = False) -> jax.Array:
    """Bilinear-resize NHWC ``x`` to spatial size ``out_hw``.

    Matches ``torch.nn.functional.interpolate(mode='bilinear')`` bit-for-bit
    in f32 (no antialiasing on downscale).
    """
    n, h, w, c = x.shape
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return x
    dtype = x.dtype
    if dtype == jnp.bfloat16:
        # fast path: bf16 operands, f32 accumulation on the MXU
        prec, work = None, jnp.bfloat16
    else:
        prec, work = jax.lax.Precision.HIGHEST, jnp.float32
    xf = x.astype(work)
    if h != oh:
        mh = jnp.asarray(_bilinear_matrix(h, oh, align_corners)).astype(work)
        # contract the H axis: (oh,h) x (n,h,w,c) -> (n,oh,w,c)
        xf = jnp.einsum("Oh,nhwc->nOwc", mh, xf, precision=prec,
                        preferred_element_type=jnp.float32)
    if w != ow:
        mw = jnp.asarray(_bilinear_matrix(w, ow, align_corners)).astype(work)
        xf = jnp.einsum("Ow,nhwc->nhOc", mw, xf, precision=prec,
                        preferred_element_type=jnp.float32)
    return xf.astype(dtype)


def upsample(x: jax.Array, scale: int | float, align_corners: bool = False) -> jax.Array:
    """Scale-factor resize mirroring ``nn.Upsample(scale_factor=...)``.

    Torch computes the output size as ``floor(in * scale)``.
    """
    n, h, w, c = x.shape
    oh = int(np.floor(h * scale))
    ow = int(np.floor(w * scale))
    return resize_bilinear(x, (oh, ow), align_corners=align_corners)


def upsample_s2d(x: jax.Array, scale: int | float, r: int = 4,
                 align_corners: bool = False) -> jax.Array:
    """``pixel_unshuffle(upsample(x, scale), r)`` without materializing the
    full-resolution frame: the interpolation matrices are viewed with their
    output rows split into (block, phase), so the contraction emits the
    space-to-depth layout (N, OH/r, OW/r, C*r^2) directly with the dense
    c-major channel order.

    Same nested h-then-w dots as :func:`resize_bilinear` per output
    element, so it matches the relayout formulation to float noise. The
    full-res path writes/reads a (OH, OW, C) frame at C-lane padding
    (C=2-3 pads ~42-64x on TPU) and then pays a second relayout copy;
    here every intermediate keeps >=C*r lanes and the s2d result feeds
    the HR tail directly (used by the hr_s2d models' bilinear base and
    the 8x flow upsample, crfp_tpu/models/runtime.py)."""
    n, h, w, c = x.shape
    oh = int(np.floor(h * scale))
    ow = int(np.floor(w * scale))
    assert oh % r == 0 and ow % r == 0, ((oh, ow), r)
    dtype = x.dtype
    if dtype == jnp.bfloat16:
        prec, work = None, jnp.bfloat16
    else:
        prec, work = jax.lax.Precision.HIGHEST, jnp.float32
    xf = x.astype(work)
    mh = jnp.asarray(_bilinear_matrix(h, oh, align_corners)).astype(work)
    mw = jnp.asarray(_bilinear_matrix(w, ow, align_corners)).astype(work)
    mh_s = mh.reshape(oh // r, r, h)  # (Y, py, h)
    mw_s = mw.reshape(ow // r, r, w)  # (X, px, w)
    # h first then w, mirroring resize_bilinear's contraction order
    t = jnp.einsum("Yph,nhwc->nYwcp", mh_s, xf, precision=prec,
                   preferred_element_type=jnp.float32).astype(work)
    o = jnp.einsum("Xqw,nYwcp->nYXcpq", mw_s, t, precision=prec,
                   preferred_element_type=jnp.float32)
    return o.reshape(n, oh // r, ow // r, c * r * r).astype(dtype)


def avg_pool_2x(x: jax.Array) -> jax.Array:
    """2x2/stride-2 average pool (torch ``F.avg_pool2d(k=2, s=2)``).

    Used by SPyNet's pyramid construction (/root/reference/model/CRFP.py:613-625).
    With even input sizes ``count_include_pad`` is irrelevant.
    """
    n, h, w, c = x.shape
    he, we = h - h % 2, w - w % 2
    x = x[:, :he, :we, :]
    x = x.reshape(n, he // 2, 2, we // 2, 2, c)
    return x.mean(axis=(2, 4))

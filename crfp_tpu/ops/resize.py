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

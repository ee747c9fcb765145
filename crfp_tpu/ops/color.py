"""Color conversions replicating the reference's exact coefficients.

- ``rgb2y``: in-model luma used by ``y_only`` mode
  (/root/reference/model/CRFP.py:12-26) and the trainer's rgb<->yuv pair
  (/root/reference/trainer.py:19-48).
- ``bgr2ycbcr_y``: the BT.601 "Y-channel metric" transform
  (/root/reference/utils.py:308-337). NOTE the reference feeds RGB tensors
  into a function written for BGR, so the effective luma is
  ``24.966*R + 128.553*G + 65.481*B + 16`` — replicated verbatim since the
  eval numbers depend on it (/root/reference/trainer.py:263-264).

All functions take NHWC arrays.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rgb2y(rgb: jax.Array) -> jax.Array:
    """(N, H, W, 3) -> (N, H, W, 1); Y = .299R + .587G + .114B."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    return (0.299 * r + 0.587 * g + 0.114 * b)[..., None]


def rgb2yuv(rgb: jax.Array) -> jax.Array:
    """(N, H, W, 3) RGB -> YUV with the trainer's coefficients."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    u = -0.147 * r - 0.289 * g + 0.436 * b
    v = 0.615 * r - 0.515 * g - 0.100 * b
    return jnp.stack([y, u, v], axis=-1)


def yuv2rgb(yuv: jax.Array) -> jax.Array:
    """(N, H, W, 3) YUV -> RGB inverse of :func:`rgb2yuv`."""
    y, u, v = yuv[..., 0], yuv[..., 1], yuv[..., 2]
    r = y + 1.14 * v
    g = y - 0.39 * u - 0.58 * v
    b = y + 2.03 * u
    return jnp.stack([r, g, b], axis=-1)


def bgr2ycbcr_y(img: jax.Array) -> jax.Array:
    """(N, H, W, 3) -> (N, H, W, 1) metric luma, reference coefficient order."""
    coeffs = jnp.asarray([24.966, 128.553, 65.481], dtype=img.dtype)
    y = jnp.tensordot(img, coeffs, axes=([-1], [0])) + 16.0
    return y[..., None]

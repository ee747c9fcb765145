"""Space-to-depth / depth-to-space with torch channel ordering, NHWC layout.

The reference implements ``pixel_unshuffle`` as a grouped conv with a
one-hot kernel (/root/reference/model/CRFP.py:28-42): output channel
``c*f*f + (y*f + x)`` picks input channel ``c`` at spatial tap ``(y, x)``
— i.e. exactly torch's ``F.pixel_unshuffle`` (c, dy, dx) ordering.
``F.pixel_shuffle`` is its inverse. We keep that channel ordering so
converted torch weights line up; the data layout here is NHWC.
"""

from __future__ import annotations

import jax


def pixel_shuffle(x: jax.Array, factor: int) -> jax.Array:
    """(N, H, W, C*f*f) -> (N, H*f, W*f, C); input channel = c*f*f + dy*f + dx."""
    n, h, w, cff = x.shape
    f = factor
    c = cff // (f * f)
    assert c * f * f == cff, (cff, f)
    x = x.reshape(n, h, w, c, f, f)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # n, h, fy, w, fx, c
    return x.reshape(n, h * f, w * f, c)


def pixel_unshuffle(x: jax.Array, factor: int) -> jax.Array:
    """(N, H*f, W*f, C) -> (N, H, W, C*f*f); output channel = c*f*f + dy*f + dx."""
    n, hf, wf, c = x.shape
    f = factor
    h, w = hf // f, wf // f
    assert h * f == hf and w * f == wf, (x.shape, f)
    x = x.reshape(n, h, f, w, f, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # n, h, w, c, fy, fx
    return x.reshape(n, h, w, c * f * f)

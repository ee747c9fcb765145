"""Masked PSNR / SSIM with the reference's exact semantics.

- masked PSNR: ``mse = ((a-b)^2 * mask).sum() / (mask.sum() * C)`` then
  ``-20*log10(sqrt(mse))`` (/root/reference/utils.py:166-185).
- masked SSIM: 11x11 Gaussian window sigma=1.5 applied per channel with
  zero 'same' padding, C1=0.01^2, C2=0.03^2 on [0,1] images, masked mean
  over ``mask.sum() * C`` (/root/reference/utils.py:187-240,
  /root/reference/pytorch_ssim/__init__.py).
- range auto-normalization heuristic of ``calc_psnr_and_ssim_cuda``
  (/root/reference/utils.py:242-254).

All inputs NHWC; mask is (N, H, W, 1) (broadcast over channels).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=8)
def _gaussian_window(window_size: int = 11, sigma: float = 1.5) -> np.ndarray:
    g = np.array(
        [math.exp(-((x - window_size // 2) ** 2) / (2.0 * sigma**2)) for x in range(window_size)],
        dtype=np.float64,
    )
    # the reference normalizes the 1-D kernel in f32 before the outer product
    g = (g / g.sum()).astype(np.float32)
    w2 = np.outer(g, g)
    return w2.astype(np.float32)


def masked_psnr(sr: jax.Array, hr: jax.Array, mask: jax.Array) -> jax.Array:
    """PSNR over the masked region of [0,1]-ranged NHWC images."""
    c = sr.shape[-1]
    mask = mask.astype(sr.dtype)
    mse = (((sr - hr) ** 2) * mask).sum() / (mask.sum() * c)
    zero_floor = -20.0 * jnp.log10(
        jnp.sqrt((1.0 / 255.0) ** 2 / np.prod(np.asarray(sr.shape, dtype=np.float64)))
    )
    return jnp.where(mse == 0, zero_floor, -20.0 * jnp.log10(jnp.sqrt(mse)))


def _same_conv_depthwise(x: jax.Array, window: jax.Array) -> jax.Array:
    """Per-channel 'same' conv with zero padding (torch F.conv2d groups=C)."""
    c = x.shape[-1]
    k = window.shape[0]
    kern = jnp.tile(window[:, :, None, None], (1, 1, 1, c))  # HWIO, feature_group_count=c
    return jax.lax.conv_general_dilated(
        x,
        kern,
        window_strides=(1, 1),
        padding=[(k // 2, k // 2), (k // 2, k // 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST,
    )


def masked_ssim(
    sr: jax.Array, hr: jax.Array, mask: jax.Array, use_pallas: bool | None = None
) -> jax.Array:
    """Masked mean of the SSIM map on [0,1]-ranged NHWC images.

    On TPU this dispatches to the fused Pallas kernel
    (crfp_tpu/ops/pallas/ssim.py): bit-identical and ~40x faster than the
    six-depthwise-conv XLA formulation at 1080p (docs/PERF.md). Pass
    ``use_pallas=False`` to force the XLA path (e.g. under jax.grad).
    """
    if use_pallas is None:
        # the kernel's row DMAs slice full image rows: Mosaic requires the
        # lane extent (width) to be a multiple of the 128 tile
        use_pallas = (
            jax.default_backend() == "tpu"
            and min(sr.shape[1:3]) >= 16
            and sr.shape[2] % 128 == 0
        )
    if use_pallas:
        from crfp_tpu.ops.pallas.ssim import masked_ssim_pallas

        return masked_ssim_pallas(sr, hr, mask)
    window = jnp.asarray(_gaussian_window())
    c = sr.shape[-1]
    mu1 = _same_conv_depthwise(sr, window)
    mu2 = _same_conv_depthwise(hr, window)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _same_conv_depthwise(sr * sr, window) - mu1_sq
    sigma2_sq = _same_conv_depthwise(hr * hr, window) - mu2_sq
    sigma12 = _same_conv_depthwise(sr * hr, window) - mu1_mu2
    c1, c2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    mask = mask.astype(sr.dtype)
    return (ssim_map * mask).sum() / (mask.sum() * c)


def psnr_and_ssim(
    sr: jax.Array, hr: jax.Array, mask: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Range-normalize like the reference, then masked PSNR + SSIM."""
    rng = hr.max() - hr.min()
    scale255 = rng > 2
    scale11 = (~scale255) & (rng > 1)
    sr = jnp.where(scale255, sr / 255.0, jnp.where(scale11, (sr + 1.0) / 2.0, sr))
    hr = jnp.where(scale255, hr / 255.0, jnp.where(scale11, (hr + 1.0) / 2.0, hr))
    return masked_psnr(sr, hr, mask), masked_ssim(sr, hr, mask)

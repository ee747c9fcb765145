"""Foveated patch PSNR/SSIM heat-maps (kernel 10, stride 5).

Replicates /root/reference/test_video.py:23-98 and
/root/reference/trainer.py:628-692: unfold SR and GT into k x k patches,
score each patch independently (PSNR from per-patch MSE; SSIM computed on
the patch as its own zero-padded image), reshape to a (Hr, Wr) heat-map,
then normalize psnr/100 and (ssim-0.7)/0.3.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from crfp_tpu.ops.metrics import _gaussian_window, _same_conv_depthwise


def _extract_patches(x: jax.Array, k: int, s: int) -> jax.Array:
    """(N,H,W,C) -> (N*Hr*Wr, k, k, C), torch-unfold patch order."""
    n, h, w, c = x.shape
    patches = jax.lax.conv_general_dilated_patches(
        x,
        filter_shape=(k, k),
        window_strides=(s, s),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # (N, Hr, Wr, C*k*k) with channel-major (c, ky, kx) order
    hr, wr = patches.shape[1:3]
    patches = patches.reshape(n * hr * wr, c, k, k)
    return patches.transpose(0, 2, 3, 1)


def batch_psnr(sr: jax.Array, hr: jax.Array) -> jax.Array:
    """Per-sample PSNR (batch_avg mode of utils.py:166-185). (B,H,W,C)->(B,)."""
    b = sr.shape[0]
    mse = ((sr - hr) ** 2).reshape(b, -1).mean(axis=1)
    chw = float(np.prod(sr.shape[1:]))
    floor = -20.0 * jnp.log10(jnp.sqrt((1.0 / 255.0) ** 2 / chw))
    return jnp.where(mse == 0, floor, -20.0 * jnp.log10(jnp.sqrt(mse)))


def batch_ssim(sr: jax.Array, hr: jax.Array) -> jax.Array:
    """Per-sample mean SSIM map (batch_avg mode of utils.py:197-236)."""
    window = jnp.asarray(_gaussian_window())
    mu1 = _same_conv_depthwise(sr, window)
    mu2 = _same_conv_depthwise(hr, window)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = _same_conv_depthwise(sr * sr, window) - mu1_sq
    s2 = _same_conv_depthwise(hr * hr, window) - mu2_sq
    s12 = _same_conv_depthwise(sr * hr, window) - mu1_mu2
    c1, c2 = 0.01**2, 0.03**2
    m = ((2 * mu1_mu2 + c1) * (2 * s12 + c2)) / ((mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))
    return m.reshape(m.shape[0], -1).mean(axis=1)


def foveated_metric(
    sr: jax.Array, hr: jax.Array, kernel_size: int = 10, stride: int = 5
):
    """sr/hr: (H, W, 3). Returns (psnr_map, ssim_map, (pmin,pmax), (smin,smax))."""
    h, w, _ = sr.shape
    hr_r = (h - kernel_size) // stride + 1
    wr_r = (w - kernel_size) // stride + 1
    sp = _extract_patches(sr[None], kernel_size, stride)
    hp = _extract_patches(hr[None], kernel_size, stride)
    psnr = batch_psnr(sp, hp).reshape(hr_r, wr_r)
    ssim = batch_ssim(sp, hp).reshape(hr_r, wr_r)
    pminmax = (psnr.min(), psnr.max())
    sminmax = (ssim.min(), ssim.max())
    psnr_map = psnr / 100.0
    ssim_map = (jnp.clip(ssim, 0, 1) - 0.7) / 0.3
    return psnr_map, ssim_map, pminmax, sminmax

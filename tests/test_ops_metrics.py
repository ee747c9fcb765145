"""masked PSNR/SSIM parity vs reference formulas rebuilt in torch."""

import math

import numpy as np
import torch
import torch.nn.functional as F

from crfp_tpu.ops.color import bgr2ycbcr_y
from crfp_tpu.ops.metrics import masked_psnr, masked_ssim, psnr_and_ssim


def _torch_masked_psnr(img1, img2, mask):
    # /root/reference/utils.py:166-185
    B, C, H, W = img1.size()
    mse = (((img1 - img2) ** 2) * mask).sum() / (mask.float().sum() * C)
    return (-20 * torch.log10(torch.sqrt(mse))).item()


def _torch_masked_ssim(img1, img2, mask):
    # /root/reference/utils.py:187-240
    window_size, sigma = 11, 1.5
    gauss = torch.Tensor(
        [math.exp(-((x - window_size // 2) ** 2) / float(2 * sigma**2)) for x in range(window_size)]
    )
    gauss = gauss / gauss.sum()
    _1d = gauss.unsqueeze(1)
    _2d = _1d.mm(_1d.t()).float().unsqueeze(0).unsqueeze(0)
    channel = img1.size(1)
    window = _2d.expand(channel, 1, window_size, window_size).contiguous()
    mu1 = F.conv2d(img1, window, padding=window_size // 2, groups=channel)
    mu2 = F.conv2d(img2, window, padding=window_size // 2, groups=channel)
    mu1_sq, mu2_sq, mu1_mu2 = mu1.pow(2), mu2.pow(2), mu1 * mu2
    sigma1_sq = F.conv2d(img1 * img1, window, padding=window_size // 2, groups=channel) - mu1_sq
    sigma2_sq = F.conv2d(img2 * img2, window, padding=window_size // 2, groups=channel) - mu2_sq
    sigma12 = F.conv2d(img1 * img2, window, padding=window_size // 2, groups=channel) - mu1_mu2
    C1, C2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu1_mu2 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2)
    )
    C = ssim_map.size(1)
    return ((ssim_map * mask).sum() / (mask.float().sum() * C)).item()


def test_masked_psnr_ssim_match_reference():
    rng = np.random.default_rng(0)
    sr = rng.uniform(0, 1, (1, 24, 32, 3)).astype(np.float32)
    hr = np.clip(sr + rng.normal(0, 0.05, sr.shape), 0, 1).astype(np.float32)
    mask = (rng.uniform(0, 1, (1, 24, 32, 1)) > 0.3).astype(np.float32)

    srt = torch.from_numpy(sr).permute(0, 3, 1, 2)
    hrt = torch.from_numpy(hr).permute(0, 3, 1, 2)
    mkt = torch.from_numpy(mask).permute(0, 3, 1, 2)

    np.testing.assert_allclose(
        float(masked_psnr(sr, hr, mask)), _torch_masked_psnr(srt, hrt, mkt), rtol=1e-4
    )
    np.testing.assert_allclose(
        float(masked_ssim(sr, hr, mask)), _torch_masked_ssim(srt, hrt, mkt), rtol=1e-4
    )


def test_range_autonormalization():
    rng = np.random.default_rng(1)
    sr = rng.uniform(0, 1, (1, 16, 16, 3)).astype(np.float32)
    hr = np.clip(sr + 0.02, 0, 1).astype(np.float32)
    mask = np.ones((1, 16, 16, 1), np.float32)
    p1, s1 = psnr_and_ssim(sr, hr, mask)
    p255, s255 = psnr_and_ssim(sr * 255, hr * 255, mask)
    np.testing.assert_allclose(float(p1), float(p255), rtol=1e-5)
    np.testing.assert_allclose(float(s1), float(s255), rtol=1e-5)


def test_y_transform_matches_reference():
    rng = np.random.default_rng(2)
    img = rng.uniform(0, 1, (1, 8, 8, 3)).astype(np.float32)
    got = np.asarray(bgr2ycbcr_y(img))[..., 0]
    imt = torch.from_numpy(img)
    want = (torch.matmul(imt, torch.tensor([24.966, 128.553, 65.481])) + 16.0).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4)

"""MATLAB-compatible numpy metrics vs the reference formulas in torch/numpy."""

import math

import numpy as np

from crfp_tpu.eval.matlab_metrics import calc_psnr, calc_psnr_and_ssim, calc_ssim


def _reference_psnr(img1, img2):
    # /root/reference/utils.py:80-91
    diff = (img1 - img2) / 255.0
    diff = diff.copy()
    diff[:, :, 0] *= 65.738 / 256.0
    diff[:, :, 1] *= 129.057 / 256.0
    diff[:, :, 2] *= 25.064 / 256.0
    diff = diff.sum(axis=2)
    mse = np.mean(diff**2)
    return -10 * math.log10(mse)


def test_calc_psnr_matches_reference():
    rng = np.random.default_rng(0)
    a = rng.uniform(0, 255, (32, 48, 3))
    b = np.clip(a + rng.normal(0, 8, a.shape), 0, 255)
    np.testing.assert_allclose(calc_psnr(a, b), _reference_psnr(a, b), rtol=1e-9)


def test_calc_ssim_against_cv2_reference():
    cv2 = __import__("cv2")
    rng = np.random.default_rng(1)
    a = rng.uniform(0, 255, (48, 64, 3))
    b = np.clip(a + rng.normal(0, 10, a.shape), 0, 255)

    # /root/reference/utils.py:94-141 (Y-channel path)
    y1 = np.dot(a, [65.738, 129.057, 25.064]) / 256.0 + 16.0
    y2 = np.dot(b, [65.738, 129.057, 25.064]) / 256.0 + 16.0
    C1, C2 = (0.01 * 255) ** 2, (0.03 * 255) ** 2
    kernel = cv2.getGaussianKernel(11, 1.5)
    window = np.outer(kernel, kernel.T)
    mu1 = cv2.filter2D(y1, -1, window)[5:-5, 5:-5]
    mu2 = cv2.filter2D(y2, -1, window)[5:-5, 5:-5]
    s1 = cv2.filter2D(y1**2, -1, window)[5:-5, 5:-5] - mu1**2
    s2 = cv2.filter2D(y2**2, -1, window)[5:-5, 5:-5] - mu2**2
    s12 = cv2.filter2D(y1 * y2, -1, window)[5:-5, 5:-5] - mu1 * mu2
    want = (((2 * mu1 * mu2 + C1) * (2 * s12 + C2)) /
            ((mu1**2 + mu2**2 + C1) * (s1 + s2 + C2))).mean()

    np.testing.assert_allclose(calc_ssim(a, b), want, rtol=1e-6)


def test_calc_psnr_and_ssim_wrapper():
    rng = np.random.default_rng(2)
    sr = rng.uniform(-1, 1, (1, 24, 24, 3)).astype(np.float32)
    hr = np.clip(sr + 0.05, -1, 1).astype(np.float32)
    p, s = calc_psnr_and_ssim(sr, hr)
    assert np.isfinite(p) and 0 <= s <= 1

"""resize/avg-pool parity vs torch F.interpolate / F.avg_pool2d."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from crfp_tpu.ops.resize import (
    avg_pool_2x,
    resize_bilinear,
    upsample,
    upsample_s2d,
)
from crfp_tpu.ops.shuffle import pixel_unshuffle


def _rand(n, h, w, c, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n, h, w, c)).astype(np.float32)


@pytest.mark.parametrize("align_corners", [False, True])
@pytest.mark.parametrize(
    "in_hw,out_hw",
    [((8, 12), (16, 24)), ((8, 12), (64, 96)), ((16, 24), (4, 6)), ((5, 7), (13, 11)), ((9, 9), (9, 9))],
)
def test_resize_bilinear_matches_torch(in_hw, out_hw, align_corners):
    x = _rand(2, *in_hw, 3)
    got = np.asarray(resize_bilinear(x, out_hw, align_corners=align_corners))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    want = F.interpolate(xt, size=out_hw, mode="bilinear", align_corners=align_corners)
    want = want.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("scale", [2, 4, 8, 0.25])
def test_upsample_scale_factor(scale):
    x = _rand(1, 8, 12, 4, seed=1)
    got = np.asarray(upsample(x, scale))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    want = F.interpolate(xt, scale_factor=scale, mode="bilinear", align_corners=False)
    want = want.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("scale,r,hw,c", [
    (8, 4, (9, 12), 3),    # the 8x bilinear base at LR-like odd sizes
    (8, 4, (15, 24), 2),   # the 8x flow upsample (2 channels)
    (2, 2, (10, 14), 4),   # lv3_s2d-style r=2
    (4, 4, (8, 8), 1),
])
def test_upsample_s2d_matches_relayout(scale, r, hw, c):
    x = _rand(1, *hw, c, seed=3)
    got = np.asarray(upsample_s2d(x, scale, r))
    want = np.asarray(pixel_unshuffle(upsample(x, scale), r))
    np.testing.assert_allclose(got, want, atol=1e-6, rtol=1e-6)


def test_avg_pool_2x():
    x = _rand(2, 10, 14, 3, seed=2)
    got = np.asarray(avg_pool_2x(x))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    want = F.avg_pool2d(xt, 2, 2, count_include_pad=False).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-6)

"""flow_warp vs torch grid_sample; pixel (un)shuffle vs torch."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from crfp_tpu.ops.shuffle import pixel_shuffle, pixel_unshuffle
from crfp_tpu.ops.warp import flow_warp


def _torch_flow_warp(x, flow, padding_mode):
    # replicates /root/reference/model/CRFP.py:90-130
    n, c, h, w = x.shape
    grid_y, grid_x = torch.meshgrid(torch.arange(0, h), torch.arange(0, w), indexing="ij")
    grid = torch.stack((grid_x, grid_y), 2).float()
    grid_flow = grid[None] + flow
    gx = 2.0 * grid_flow[..., 0] / max(w - 1, 1) - 1.0
    gy = 2.0 * grid_flow[..., 1] / max(h - 1, 1) - 1.0
    grid_flow = torch.stack((gx, gy), dim=3)
    return F.grid_sample(x, grid_flow, mode="bilinear", padding_mode=padding_mode, align_corners=True)


@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
def test_flow_warp_matches_grid_sample(padding_mode):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 9, 13, 4)).astype(np.float32)
    flow = (rng.standard_normal((2, 9, 13, 2)) * 3.0).astype(np.float32)
    got = np.asarray(flow_warp(x, flow, padding_mode=padding_mode))
    want = _torch_flow_warp(
        torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(flow), padding_mode
    )
    want = want.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_flow_warp_zero_flow_identity():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 6, 6, 2)).astype(np.float32)
    out = np.asarray(flow_warp(x, np.zeros((1, 6, 6, 2), np.float32)))
    np.testing.assert_allclose(out, x, atol=1e-6)


def test_pixel_shuffle_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 3, 5, 4 * 9)).astype(np.float32)
    got = np.asarray(pixel_shuffle(x, 3))
    want = F.pixel_shuffle(torch.from_numpy(x).permute(0, 3, 1, 2), 3).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=0)


def test_pixel_unshuffle_matches_reference_grouped_conv():
    # the reference's one-hot grouped-conv formulation, /root/reference/model/CRFP.py:28-42
    rng = np.random.default_rng(3)
    f, c = 4, 3
    x = rng.standard_normal((2, 8, 12, c)).astype(np.float32)
    got = np.asarray(pixel_unshuffle(x, f))

    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    kernel = torch.zeros(f * f * c, 1, f, f)
    for y in range(f):
        for xk in range(f):
            kernel[xk + y * f :: f * f, 0, y, xk] = 1
    want = F.conv2d(xt, kernel, stride=f, groups=c).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=0)


def test_shuffle_roundtrip():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((1, 8, 8, 5)).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(pixel_shuffle(pixel_unshuffle(x, 2), 2)), x)

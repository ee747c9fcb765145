"""Fused final-frame emission kernel vs pixel_shuffle + bilinear base."""

import jax.numpy as jnp
import numpy as np

from crfp_tpu.ops.pallas.emit import (
    depth_to_space_add_chw,
    emit_res_rows,
    upsample_planar,
)
from crfp_tpu.ops.resize import upsample
from crfp_tpu.ops.shuffle import pixel_shuffle


def test_d2s_add_matches_shuffle_plus_base():
    rng = np.random.default_rng(0)
    n, hs, ws, c, r = 1, 18, 32, 3, 4  # 72x128 output
    y = jnp.asarray(rng.standard_normal((n, hs, ws, c * r * r)), jnp.float32)
    res = jnp.asarray(rng.standard_normal((n, c, hs * r, ws * r)), jnp.float32)

    want = pixel_shuffle(y, r) + res.transpose(0, 2, 3, 1)
    res_p = jnp.pad(res, ((0, 0), (0, 0), (0, emit_res_rows(hs) - hs * r), (0, 0)))
    got = depth_to_space_add_chw(y, res_p, r=r, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got.transpose(0, 2, 3, 1)), np.asarray(want),
        atol=1e-5, rtol=1e-5)


def test_d2s_multi_band():
    # hs=96 -> band 48, TWO bands: regression for the index_map bug where
    # the band index landed on the r2 dim (every band read band 0's rows;
    # invisible to the single-band shapes all other tests use)
    rng = np.random.default_rng(7)
    n, hs, ws, c, r = 1, 96, 32, 3, 4
    y = jnp.asarray(rng.standard_normal((n, hs, ws, c * r * r)), jnp.float32)
    got = depth_to_space_add_chw(y, None, r=r, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got.transpose(0, 2, 3, 1)), np.asarray(pixel_shuffle(y, r)),
        atol=1e-5, rtol=1e-5)


def test_d2s_no_residual_and_partial_band():
    rng = np.random.default_rng(1)
    n, hs, ws, c, r = 1, 38, 32, 3, 4  # 38 rows: partial last band (bs=32)
    y = jnp.asarray(rng.standard_normal((n, hs, ws, c * r * r)), jnp.float32)
    want = pixel_shuffle(y, r)
    got = depth_to_space_add_chw(y, None, r=r, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got.transpose(0, 2, 3, 1)), np.asarray(want),
        atol=1e-5, rtol=1e-5)


def test_d2s_y_only_single_channel():
    rng = np.random.default_rng(2)
    n, hs, ws, c, r = 1, 16, 64, 1, 4
    y = jnp.asarray(rng.standard_normal((n, hs, ws, c * r * r)), jnp.float32)
    got = depth_to_space_add_chw(y, None, r=r, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got.transpose(0, 2, 3, 1)), np.asarray(pixel_shuffle(y, r)),
        atol=1e-5, rtol=1e-5)


def test_upsample_planar_matches_nhwc():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(0, 1, (1, 17, 30, 3)), jnp.float32)
    want = np.asarray(upsample(x, 8))
    got = np.asarray(upsample_planar(x, 8).transpose(0, 2, 3, 1))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_upsample_planar_pad_to_zero_rows():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.uniform(0, 1, (1, 10, 16, 3)), jnp.float32)
    got = upsample_planar(x, 4, pad_to=48)
    assert got.shape == (1, 3, 48, 64)
    np.testing.assert_allclose(np.asarray(got[:, :, 40:]), 0.0)
    np.testing.assert_allclose(
        np.asarray(got[:, :, :40].transpose(0, 2, 3, 1)),
        np.asarray(upsample(x, 4)), atol=1e-5, rtol=1e-5)

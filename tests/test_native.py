"""Native preprocessing library vs PIL/numpy oracles."""

import numpy as np
import PIL.Image
import pytest

from crfp_tpu import native

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="no C++ toolchain"
)


def test_bicubic_matches_pil():
    rng = np.random.default_rng(0)
    src = rng.integers(0, 256, (2, 64, 96, 3), np.uint8)
    for dh, dw in [(32, 48), (128, 192), (17, 31)]:
        got = native.resize_bicubic_u8(src, dh, dw)
        for f in range(2):
            want = np.array(
                PIL.Image.fromarray(src[f]).resize((dw, dh), PIL.Image.BICUBIC)
            )
            diff = np.abs(got[f].astype(int) - want.astype(int))
            # PIL uses 8-bit fixed-point tap weights; we use double — up to
            # ~1 LSB rounding skew on a minority of pixels
            assert diff.max() <= 1, (dh, dw, diff.max())
            assert (diff > 0).mean() < 0.2


def test_crop_normalize_flip():
    rng = np.random.default_rng(1)
    src = rng.integers(0, 256, (3, 20, 24, 3), np.uint8)
    got = native.crop_normalize_flip_f32(src, 2, 3, 10, 12, hflip=True, vflip=False)
    want = src[:, 2:12, 3:15].astype(np.float32) / 255.0
    want = want[:, :, ::-1]
    np.testing.assert_allclose(got, want, atol=1e-7)

    got2 = native.crop_normalize_flip_f32(src, 0, 0, 20, 24, vflip=True)
    want2 = (src.astype(np.float32) / 255.0)[:, ::-1]
    np.testing.assert_allclose(got2, want2, atol=1e-7)


def test_fill_fovea_matches_generator():
    from crfp_tpu.data.fovea import fovea_generator

    rng = np.random.default_rng(2)
    gt = rng.uniform(0, 1, (5, 64, 64, 3)).astype(np.float32)
    fv_ref, mk_ref, coords = fovea_generator(
        gt, method="Evenscan", fv_hw=(16, 16)
    )
    fv, mk = native.fill_fovea_f32(gt, coords.astype(np.int32), 16, 16)
    np.testing.assert_allclose(fv, fv_ref, atol=0)
    np.testing.assert_allclose(mk, mk_ref, atol=0)

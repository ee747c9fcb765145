"""Data fast paths: crop-then-resize exactness, raw-frame cache identity,
throughput sanity."""

import os
import time

import numpy as np
import PIL.Image
import pytest

from tests.test_data import _Args, _make_fake_reds


def test_crop_then_resize_matches_fullframe():
    from crfp_tpu.data.reds import _bicubic_upsample, _bicubic_x8_cropped

    rng = np.random.default_rng(0)
    lr_win = rng.integers(0, 256, (2, 24, 40, 3), np.uint8)
    scale, lr_size = 8, 8
    full = _bicubic_upsample(lr_win, 24 * scale, 40 * scale)
    for rnd_h, rnd_w in [(0, 0), (3, 7), (16, 32), (5, 0), (0, 29)]:
        want = full[:, rnd_h * scale : (rnd_h + lr_size) * scale,
                    rnd_w * scale : (rnd_w + lr_size) * scale]
        got = _bicubic_x8_cropped(lr_win, rnd_h, rnd_w, lr_size, scale)
        np.testing.assert_array_equal(got, want, err_msg=f"crop ({rnd_h},{rnd_w})")


def test_frame_cache_identity(tmp_path):
    _make_fake_reds(str(tmp_path), n_frames=4, gt_hw=(96, 128))
    from crfp_tpu.data import reds

    args = _Args()
    args.dataset_dir = os.path.join(str(tmp_path), "REDS_sharp")
    args.GT_size = 64

    ds_plain = reds.TrainSet(args, rng=np.random.default_rng(7))
    args2 = _Args()
    args2.dataset_dir = args.dataset_dir
    args2.GT_size = 64
    args2.frame_cache = str(tmp_path / "cache")
    ds_cached = reds.TrainSet(args2, rng=np.random.default_rng(7))

    for i in (0, 3):
        a = ds_plain[i]
        b = ds_cached[i]
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)
    # second read hits the memmap
    _ = ds_cached[0]
    assert any(f.endswith(".npy") for f in os.listdir(args2.frame_cache))

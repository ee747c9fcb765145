"""Vimeo-90K septuplet readers on a synthetic tree."""

import os

import numpy as np
import PIL.Image
import pytest


def _make_fake_vimeo(root, n_seqs=3, hw=(128, 192)):
    rng = np.random.default_rng(0)
    seqs = []
    for i in range(n_seqs):
        rel = f"{i:05d}/{1:04d}"
        d = os.path.join(root, "sequences", rel)
        os.makedirs(d, exist_ok=True)
        for f in range(7):
            img = rng.integers(0, 255, (*hw, 3), np.uint8)
            PIL.Image.fromarray(img).save(os.path.join(d, f"im{f+1}.png"))
        seqs.append(rel)
    with open(os.path.join(root, "sep_trainlist.txt"), "w") as f:
        f.write("\n".join(seqs[:2]) + "\n")
    with open(os.path.join(root, "sep_testlist.txt"), "w") as f:
        f.write(seqs[2] + "\n")
    with open(os.path.join(root, "slow_testset.txt"), "w") as f:
        f.write(seqs[2] + "\n")


class _Args:
    scale = 8
    GT_size = 64
    FV_size = 16
    N_frames = 7


def test_vimeo_sets(tmp_path):
    _make_fake_vimeo(str(tmp_path))
    args = _Args()
    args.dataset_dir = str(tmp_path)

    from crfp_tpu.data import vimeo

    tr = vimeo.TrainSet(args, rng=np.random.default_rng(0))
    assert len(tr) == 2
    s = tr[0]
    assert s["LR"].shape == (7, 8, 8, 3)
    assert s["HR"].shape == (7, 64, 64, 3)
    assert s["Ref_sp"].shape == (7, 64, 64, 1)
    np.testing.assert_allclose(s["Ref"], s["HR"] * s["Ref_sp"], atol=1e-6)

    ev = vimeo.EvalSet(args)
    e = ev[0]
    assert e["LR"].shape == (7, 16, 24, 3)
    assert e["HR"].shape == (7, 128, 192, 3)

    ts = vimeo.TestSet(args)
    t0 = ts[0]
    assert "FV_sp" in t0
    assert t0["FV_sp"].shape == (7, 2)


def test_gaussian_downsample_matches_torch_reference():
    # torch mirror of /root/reference/dataset/vimeo7.py:19-64
    import torch
    import torch.nn.functional as tF
    from scipy import ndimage

    from crfp_tpu.data.vimeo import gaussian_downsample

    scale = 4
    rng = np.random.default_rng(2)
    x = rng.uniform(0, 1, (2, 32, 40, 3)).astype(np.float32)

    kern = np.zeros((13, 13))
    kern[6, 6] = 1
    kern = ndimage.gaussian_filter(kern, 0.4 * scale)
    xt = torch.from_numpy(x).permute(3, 0, 1, 2)  # (C, T, H, W)
    C, T, H, W = xt.shape
    flat = xt.contiguous().view(-1, 1, H, W)
    pad = 6 + scale * 2
    flat = tF.pad(flat, [pad, pad, pad, pad], mode="reflect")
    gf = torch.from_numpy(kern).float().unsqueeze(0).unsqueeze(0)
    out = tF.conv2d(flat, gf, stride=scale)[:, :, 2:-2, 2:-2]
    want = out.view(C, T, out.size(2), out.size(3)).permute(1, 2, 3, 0).numpy()

    got = gaussian_downsample(x, scale=scale)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_gaussian_downsample_shapes():
    from crfp_tpu.data.vimeo import gaussian_downsample

    rng = np.random.default_rng(1)
    x = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    y = gaussian_downsample(x, scale=4)
    assert y.shape == (2, 16, 16, 3)
    assert np.isfinite(y).all()
    # downsampling a constant image stays constant (kernel normalization)
    c = np.full((1, 32, 32, 3), 0.5, np.float32)
    yc = gaussian_downsample(c, scale=2)
    np.testing.assert_allclose(yc, 0.5, atol=1e-4)

"""Eval subsystem: patch heat-maps vs torch unfold oracle, 4-zone masks,
clip evaluator smoke."""

import numpy as np
import torch
import torch.nn.functional as F

from crfp_tpu.eval.foveated import batch_psnr, batch_ssim, foveated_metric, _extract_patches
from crfp_tpu.eval.zones import StreamingZoneEval, zone_masks_step


def test_extract_patches_matches_torch_unfold():
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (1, 24, 32, 3)).astype(np.float32)
    got = np.asarray(_extract_patches(x, 10, 5))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    fold = F.unfold(xt, kernel_size=(10, 10), stride=5)  # (1, C*k*k, L)
    want = fold.permute(0, 2, 1).reshape(-1, 3, 10, 10).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=0)


def test_batch_psnr_ssim_match_reference_batchavg():
    rng = np.random.default_rng(1)
    a = rng.uniform(0, 1, (4, 10, 10, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.05, a.shape), 0, 1).astype(np.float32)

    # reference batch_avg psnr (utils.py:166-172)
    at = torch.from_numpy(a).permute(0, 3, 1, 2)
    bt = torch.from_numpy(b).permute(0, 3, 1, 2)
    B, C, H, W = at.shape
    mse = ((at - bt) ** 2).reshape(B, -1).mean(1)
    want_p = (-20 * torch.log10(torch.sqrt(mse))).numpy()
    np.testing.assert_allclose(np.asarray(batch_psnr(a, b)), want_p, rtol=1e-4)

    # reference batch_avg ssim via the vendored formula
    import math

    gauss = torch.Tensor(
        [math.exp(-((x - 5) ** 2) / (2 * 1.5**2)) for x in range(11)]
    )
    gauss = gauss / gauss.sum()
    w2 = gauss.unsqueeze(1).mm(gauss.unsqueeze(1).t()).unsqueeze(0).unsqueeze(0)
    window = w2.expand(C, 1, 11, 11).contiguous()

    def conv(x):
        return F.conv2d(x, window, padding=5, groups=C)

    mu1, mu2 = conv(at), conv(bt)
    s1 = conv(at * at) - mu1**2
    s2 = conv(bt * bt) - mu2**2
    s12 = conv(at * bt) - mu1 * mu2
    c1, c2 = 0.01**2, 0.03**2
    smap = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / ((mu1**2 + mu2**2 + c1) * (s1 + s2 + c2))
    want_s = smap.reshape(B, -1).mean(1).numpy()
    np.testing.assert_allclose(np.asarray(batch_ssim(a, b)), want_s, rtol=1e-4)


def test_foveated_metric_shapes():
    rng = np.random.default_rng(2)
    sr = rng.uniform(0, 1, (64, 96, 3)).astype(np.float32)
    hr = np.clip(sr + 0.01, 0, 1).astype(np.float32)
    pm, sm, (pmin, pmax), (smin, smax) = foveated_metric(sr, hr)
    assert pm.shape == ((64 - 10) // 5 + 1, (96 - 10) // 5 + 1)
    assert float(pmin) <= float(pmax)
    assert np.isfinite(np.asarray(pm)).all()


def test_zone_masks_match_reference_dilate():
    h, w, fv = 64, 96, 16
    z = zone_masks_step(h, w, (30.0, 50.0), fv)
    # torch mirror of the dilation loop (test_video.py:348-350)
    mk_fv = torch.from_numpy(z.fovea[None].transpose(0, 3, 1, 2))
    kernel = torch.ones(1, 1, 3, 3)
    out = mk_fv.clone()
    for _ in range(10):
        out = torch.clamp(F.conv2d(out, kernel, padding=1), 0, 1)
    mask = torch.from_numpy(z.mask[None].transpose(0, 3, 1, 2))
    want = torch.logical_and(torch.logical_not(mask.bool()), out.bool()).float()
    np.testing.assert_array_equal(
        z.outskirt.transpose(2, 0, 1)[None], want.numpy()
    )
    # mask clipped at borders
    z2 = zone_masks_step(h, w, (2.0, 2.0), fv)
    assert z2.fovea.sum() > 0


def test_streaming_zone_eval_accumulates():
    rng = np.random.default_rng(3)
    ev = StreamingZoneEval()
    for i in range(4):
        sr = rng.uniform(0, 1, (1, 32, 48, 3)).astype(np.float32)
        gt = np.clip(sr + 0.02, 0, 1).astype(np.float32)
        z = zone_masks_step(32, 48, (16 + i, 24 + i), 8)
        ev.update(sr, gt, z)
    s = ev.summary()
    assert len(ev.results["psnr_whole"]) == 4
    assert len(ev.results["psnr_past"]) == 3  # first frame has no past
    assert np.isfinite(s["psnr_whole"]) and np.isfinite(s["ssim_past"])


def test_onchip_zone_eval_matches_host_eval():
    # the single-dispatch on-device evaluator (rect-reconstructed masks,
    # batched 4-zone metrics) must agree with the scipy/host path on a
    # wandering gaze, including clipped-at-border and inactive frames
    from crfp_tpu.eval.zones import OnChipZoneEval

    rng = np.random.default_rng(11)
    h, w, fv = 64, 96, 16
    host = StreamingZoneEval()
    chip = OnChipZoneEval(fv)
    gazes = [(30.0, 50.0), (2.0, 2.0), (62.0, 94.0), (31.0, 49.0), (40.0, 10.0)]
    for i, g in enumerate(gazes):
        sr = rng.uniform(0, 1, (1, h, w, 3)).astype(np.float32)
        gt = np.clip(sr + 0.02, 0, 1).astype(np.float32)
        z = zone_masks_step(h, w, g, fv, active=(i != 1))
        host.update(sr, gt, z)
        chip.update(sr, gt, z)
    a, b = host.summary(), chip.summary()
    assert a.keys() == b.keys()
    for k in a:
        np.testing.assert_allclose(b[k], a[k], rtol=0, atol=2e-4, err_msg=k)

"""Mint GOLDEN.md: paired torch-vs-JAX end-to-end numbers for BASELINE
configs 1-2 on procedural data.

The container has no REDS data and no trained reference checkpoint, so
the golden pairs are minted the way BASELINE.md prescribes for this
situation: run the SAME protocol bit-for-bit through (a) a line-for-line
torch mirror of the reference pipeline (the mirrors from
tests/test_spynet.py and tests/test_full_parity.py) and (b) the
crfp_tpu stack, with SHARED random weights moved across by the real
converter — and score each side with ITS OWN masked-metric
implementation (torch: the literal /root/reference/utils.py:166-240
formulas; jax: crfp_tpu.ops.metrics). Agreement of the resulting
PSNR/SSIM numbers to <=0.05 dB / 1e-4 is the end-to-end budget from
BASELINE.md.

Run:  python tests/mint_golden.py   (writes the table to stdout;
      GOLDEN.md records the minted output)
Test: tests/test_golden.py asserts the same agreement at smaller shapes.
"""

from __future__ import annotations

import math
import sys

import numpy as np
import torch
import torch.nn.functional as F

sys.path.insert(0, "tests")
sys.path.insert(0, ".")


# ---------------- torch-side masked metrics (reference formulas) ----------


def torch_masked_psnr(sr, hr, mask):
    # /root/reference/utils.py:166-185: mse = (d^2 * mask).sum()/(mask.sum()*C)
    c = sr.shape[1]
    mse = ((sr - hr) ** 2 * mask).sum() / (mask.sum() * c)
    return float(-20.0 * torch.log10(torch.sqrt(mse)))


def _gauss_window(win=11, sigma=1.5):
    g = torch.tensor(
        [math.exp(-((x - win // 2) ** 2) / (2.0 * sigma**2)) for x in range(win)]
    )
    g = (g / g.sum()).float()
    return g[:, None] @ g[None, :]


def torch_masked_ssim(sr, hr, mask):
    # /root/reference/utils.py:197-240 (pytorch_ssim semantics, zero 'same'
    # padding, C1=1e-4, C2=9e-4, masked mean over the map)
    c = sr.shape[1]
    w = _gauss_window().expand(c, 1, 11, 11)
    mu1 = F.conv2d(sr, w, padding=5, groups=c)
    mu2 = F.conv2d(hr, w, padding=5, groups=c)
    mu1s, mu2s, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = F.conv2d(sr * sr, w, padding=5, groups=c) - mu1s
    s2 = F.conv2d(hr * hr, w, padding=5, groups=c) - mu2s
    s12 = F.conv2d(sr * hr, w, padding=5, groups=c) - mu12
    c1, c2 = 0.01**2, 0.03**2
    m = ((2 * mu12 + c1) * (2 * s12 + c2)) / ((mu1s + mu2s + c1) * (s1 + s2 + c2))
    return float((m * mask).sum() / (mask.sum() * c))


# ---------------- procedural clips ----------------


def translating_clip(t=6, h=16, w=24, s=8, shift=1, seed=0):
    from scipy import ndimage

    rng = np.random.default_rng(seed)
    base = rng.uniform(0, 1, (h * s, w * s + t * s * shift, 3)).astype(np.float32)
    k = np.ones((9, 9, 1)) / 81.0
    base = ndimage.convolve(base, k, mode="wrap").astype(np.float32)
    gts = np.stack([base[:, i * s * shift : i * s * shift + w * s] for i in range(t)])
    lrs = gts[:, ::s, ::s]
    return lrs, gts


def gaze_fovea(rng, t, hr_h, hr_w, fv=64, sigma=10.0):
    """The reference demo gaze model (/root/reference/test_video.py:309-310):
    gaussian jitter around center, box fovea of size fv."""
    mks = np.zeros((t, hr_h, hr_w, 1), np.float32)
    for i in range(t):
        cy = int(np.clip(sigma * rng.standard_normal() + hr_h / 2, fv / 2, hr_h - fv / 2))
        cx = int(np.clip(sigma * rng.standard_normal() + hr_w / 2, fv / 2, hr_w - fv / 2))
        mks[i, cy - fv // 2 : cy + fv // 2, cx - fv // 2 : cx + fv // 2] = 1.0
    return mks


# ---------------- config 1: SPyNet + warp propagation ----------------


def golden_config1(t=6, h=16, w=24, seed=0):
    from test_spynet import TorchSPyNet
    from test_full_parity import torch_flow_warp

    from crfp_tpu.eval.flow_warp_eval import flow_warp_propagation_eval
    from crfp_tpu.tools.convert_torch import convert_state_dict

    torch.manual_seed(seed)
    tm = TorchSPyNet()
    sd = {f"spynet.{k}": v for k, v in tm.state_dict().items()}
    params = {"params": convert_state_dict(sd)["params"]["spynet"]}

    lrs, gts = translating_clip(t=t, h=h, w=w, seed=seed)

    # torch pipeline
    tl = torch.from_numpy(lrs).permute(0, 3, 1, 2)
    tg = torch.from_numpy(gts).permute(0, 3, 1, 2)
    with torch.no_grad():
        flows = tm(tl[1:], tl[:-1])
        hr_flows = F.interpolate(flows, scale_factor=8, mode="bilinear",
                                 align_corners=False) * 8.0
        warped = torch_flow_warp(tg[:-1], hr_flows.permute(0, 2, 3, 1))
    t_psnr, t_ssim = [], []
    for i in range(t - 1):
        ones = torch.ones_like(warped[i : i + 1, :1])
        t_psnr.append(torch_masked_psnr(warped[i : i + 1], tg[i + 1 : i + 2], ones))
        t_ssim.append(torch_masked_ssim(warped[i : i + 1], tg[i + 1 : i + 2], ones))

    # jax pipeline (same weights through the converter)
    res = flow_warp_propagation_eval(lrs, gts, flow_net="spynet", params=params)
    return {"torch": {"psnr": t_psnr, "ssim": t_ssim},
            "jax": {"psnr": res["psnr"], "ssim": res["ssim"]}}


# ---------------- config 2: v18 foveated inference, sigma=10 ----------------


def golden_config2(t=5, h=16, w=24, mid=16, seed=0):
    from test_full_parity import TorchCRFP_DSV

    import jax.numpy as jnp

    from crfp_tpu.models import CRFP, ModelConfig
    from crfp_tpu.ops.metrics import masked_psnr, masked_ssim
    from crfp_tpu.tools.convert_torch import convert_state_dict

    torch.manual_seed(seed)
    tm = TorchCRFP_DSV(mid=mid)
    params = convert_state_dict(tm.state_dict())

    lrs, gts = translating_clip(t=t, h=h, w=w, seed=seed)
    rng = np.random.default_rng(seed)
    mks = gaze_fovea(rng, t, h * 8, w * 8, fv=64, sigma=10.0)
    fvs = gts * mks  # the reference feeds the masked GT crop as the fovea

    with torch.no_grad():
        sr_t = tm(
            torch.from_numpy(lrs[None]).permute(0, 1, 4, 2, 3),
            torch.from_numpy(fvs[None]).permute(0, 1, 4, 2, 3),
            torch.from_numpy(mks[None]).permute(0, 1, 4, 2, 3),
        )[0].permute(0, 2, 3, 1).numpy()

    model = CRFP(ModelConfig(variant="v18", mid_channels=mid))
    sr_j = np.asarray(model.apply(params, lrs[None], fvs[None], mks[None]))[0]

    def zones(sr, stack):
        ones = np.ones_like(sr[..., :1])
        rows = {}
        for zone, m in (("whole", ones), ("fovea", mks)):
            if stack == "torch":
                st = torch.from_numpy(sr).permute(0, 3, 1, 2)
                gt = torch.from_numpy(gts).permute(0, 3, 1, 2)
                mt = torch.from_numpy(np.broadcast_to(m, sr[..., :1].shape).copy()).permute(0, 3, 1, 2)
                rows[zone] = (torch_masked_psnr(st, gt, mt),
                              torch_masked_ssim(st, gt, mt))
            else:
                rows[zone] = (
                    float(masked_psnr(jnp.asarray(sr), jnp.asarray(gts), jnp.asarray(m))),
                    float(masked_ssim(jnp.asarray(sr), jnp.asarray(gts), jnp.asarray(m))),
                )
        return rows

    return {"torch": zones(sr_t, "torch"), "jax": zones(sr_j, "jax")}


def main():
    print("# GOLDEN — paired torch-mirror vs crfp_tpu numbers (procedural data)")
    print()
    print("Minted by tests/mint_golden.py (see its docstring). Budget:")
    print("PSNR pairs within 0.05 dB, SSIM within 1e-3.")
    print()
    c1 = golden_config1()
    print("## Config 1 — SPyNet flow + backward-warp recurrent eval")
    print()
    print("| frame | torch PSNR | jax PSNR | torch SSIM | jax SSIM |")
    print("|---|---|---|---|---|")
    for i, (tp, jp, ts, js) in enumerate(zip(
            c1["torch"]["psnr"], c1["jax"]["psnr"],
            c1["torch"]["ssim"], c1["jax"]["ssim"])):
        print(f"| {i+1} | {tp:.4f} | {jp:.4f} | {ts:.6f} | {js:.6f} |")
    dmax = max(abs(a - b) for a, b in zip(c1["torch"]["psnr"], c1["jax"]["psnr"]))
    print(f"\nmax |dPSNR| = {dmax:.4f} dB")
    print()
    c2 = golden_config2()
    print("## Config 2 — CRFP_DSV (v18) 8x foveated inference, sigma=10 gaze")
    print()
    print("| zone | torch PSNR | jax PSNR | torch SSIM | jax SSIM |")
    print("|---|---|---|---|---|")
    for zone in ("whole", "fovea"):
        tp, ts = c2["torch"][zone]
        jp, js = c2["jax"][zone]
        print(f"| {zone} | {tp:.4f} | {jp:.4f} | {ts:.6f} | {js:.6f} |")
    d2 = max(abs(c2["torch"][z][0] - c2["jax"][z][0]) for z in ("whole", "fovea"))
    print(f"\nmax |dPSNR| = {d2:.4f} dB")


if __name__ == "__main__":
    main()

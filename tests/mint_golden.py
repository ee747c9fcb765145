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


# ------- config 3: sigma-sweep 4-zone streaming eval (test_video.py) -------


def golden_config3(t=6, h=16, w=24, mid=16, seed=0, sigmas=(10.0, 50.0, 100.0)):
    """The reference demo protocol (/root/reference/test_video.py:149,
    309-379, 543-546): per-frame gaussian gaze, 4 metric zones (whole /
    fovea / outskirt / past = union of last 3 outskirts), sigma sweep.
    Zone masks are built once (crfp_tpu.eval.zones — itself oracle-tested
    against the reference recipe) and each stack scores with ITS OWN
    masked metrics."""
    from test_full_parity import TorchCRFP_DSV

    import jax.numpy as jnp

    from crfp_tpu.eval.zones import zone_masks_step
    from crfp_tpu.models import CRFP, ModelConfig
    from crfp_tpu.ops.metrics import masked_psnr, masked_ssim
    from crfp_tpu.tools.convert_torch import convert_state_dict

    torch.manual_seed(seed)
    tm = TorchCRFP_DSV(mid=mid)
    params = convert_state_dict(tm.state_dict())
    model = CRFP(ModelConfig(variant="v18", mid_channels=mid))

    lrs, gts = translating_clip(t=t, h=h, w=w, seed=seed)
    hh, ww = h * 8, w * 8
    fv = 64

    out = {}
    for sigma in sigmas:
        rng = np.random.default_rng(seed)
        zones_t = []
        mks = np.zeros((t, hh, ww, 1), np.float32)
        for i in range(t):
            gy = float(np.clip(sigma * rng.standard_normal() + hh / 2, fv / 2, hh - fv / 2))
            gx = float(np.clip(sigma * rng.standard_normal() + ww / 2, fv / 2, ww - fv / 2))
            zm = zone_masks_step(hh, ww, (gy, gx), fv)
            zones_t.append(zm)
            mks[i] = zm.mask
        fvs = gts * mks

        with torch.no_grad():
            sr_t = tm(
                torch.from_numpy(lrs[None]).permute(0, 1, 4, 2, 3),
                torch.from_numpy(fvs[None]).permute(0, 1, 4, 2, 3),
                torch.from_numpy(mks[None]).permute(0, 1, 4, 2, 3),
            )[0].permute(0, 2, 3, 1).numpy()
        sr_j = np.asarray(model.apply(params, lrs[None], fvs[None], mks[None]))[0]

        # per-frame zone masks -> stacked (t, H, W, 1); 'past' = union of
        # the previous 3 outskirts (test_video.py:371-379)
        zmask = {"whole": np.ones((t, hh, ww, 1), np.float32), "fovea": mks}
        zmask["outskirt"] = np.stack([z.outskirt for z in zones_t])
        past = np.zeros_like(mks)
        for i in range(t):
            for k in range(max(0, i - 3), i):
                past[i] = np.maximum(past[i], zones_t[k].outskirt)
        zmask["past"] = past

        rows = {}
        for zone, m in zmask.items():
            if float(m.sum()) == 0.0:
                continue
            st = torch.from_numpy(sr_t).permute(0, 3, 1, 2)
            gt_t = torch.from_numpy(gts).permute(0, 3, 1, 2)
            mt = torch.from_numpy(m).permute(0, 3, 1, 2)
            tp = torch_masked_psnr(st, gt_t, mt)
            ts = torch_masked_ssim(st, gt_t, mt)
            jp = float(masked_psnr(jnp.asarray(sr_j), jnp.asarray(gts), jnp.asarray(m)))
            js = float(masked_ssim(jnp.asarray(sr_j), jnp.asarray(gts), jnp.asarray(m)))
            rows[zone] = (tp, jp, ts, js)
        out[sigma] = rows
    return out


# ------- config 4: paired short-training golden (trainer recipe) -------


def golden_config4(steps=5, t=3, h=16, w=24, mid=16, seed=0):
    """Train the torch mirror and crfp_tpu from IDENTICAL weights on
    IDENTICAL batches for a few optimizer steps with the reference recipe
    (two-group Adam eps 1e-12, trunk 2e-4 / flow 2.5e-5, Charbonnier
    eps 1e-12 — /root/reference/trainer.py:131-149, loss/loss.py:116-124)
    and compare the loss trajectories."""
    from test_full_parity import TorchCRFP_DSV

    import jax
    import jax.numpy as jnp

    from crfp_tpu.models import CRFP, ModelConfig
    from crfp_tpu.tools.convert_torch import convert_state_dict
    from crfp_tpu.train import TrainConfig, make_train_step
    from crfp_tpu.train.loop import TrainState

    torch.manual_seed(seed)
    tm = TorchCRFP_DSV(mid=mid)
    params = convert_state_dict(tm.state_dict())

    batches = []
    for k in range(steps):
        lrs, gts = translating_clip(t=t, h=h, w=w, seed=seed + 10 * k)
        rng = np.random.default_rng(seed + k)
        mks = gaze_fovea(rng, t, h * 8, w * 8, fv=64, sigma=10.0)
        batches.append({"lr": lrs[None], "hr": gts[None],
                        "fv": (gts * mks)[None], "mk": mks[None]})

    # torch side
    flow_p = [p for n, p in tm.named_parameters() if "spynet" in n]
    trunk_p = [p for n, p in tm.named_parameters() if "spynet" not in n]
    opt = torch.optim.Adam(
        [{"params": trunk_p, "lr": 2e-4}, {"params": flow_p, "lr": 2.5e-5}],
        betas=(0.9, 0.999), eps=1e-12,
    )
    t_losses = []
    for b in batches:
        opt.zero_grad()
        sr = tm(
            torch.from_numpy(b["lr"]).permute(0, 1, 4, 2, 3),
            torch.from_numpy(b["fv"]).permute(0, 1, 4, 2, 3),
            torch.from_numpy(b["mk"]).permute(0, 1, 4, 2, 3),
        )
        hr = torch.from_numpy(b["hr"]).permute(0, 1, 4, 2, 3)
        loss = torch.sqrt((sr - hr) ** 2 + 1e-12).mean()
        loss.backward()
        opt.step()
        t_losses.append(float(loss))

    # jax side (flow group unfrozen to mirror the torch run)
    model = CRFP(ModelConfig(variant="v18", mid_channels=mid))
    tcfg = TrainConfig(flow_freeze_iters=0)
    from crfp_tpu.train.loop import make_optimizer

    tx = make_optimizer(tcfg)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=tx.init(params), tx=tx)
    step_fn = make_train_step(model, tcfg)
    j_losses = []
    for b in batches:
        jb = {k: jnp.asarray(v) for k, v in b.items()}
        state, metrics = step_fn(state, jb)
        j_losses.append(float(metrics["loss"]))
    return {"torch": t_losses, "jax": j_losses}


# ------- config 5: runtime (warp_size ROI) protocol pair -------


def golden_config5(t=5, h=24, w=40, mid=16, warp=(128, 128), fv=48, seed=0):
    """The reference latency-harness model (MRCF_simple_v18,
    /root/reference/test_runtime.py:142-186 protocol at reduced size):
    torch mirror vs CRFPRuntimeV18 under converted weights, scored per
    stack against GT plus cross-stack agreement."""
    from runtime_mirror import TorchRuntimeV18

    import jax.numpy as jnp

    from crfp_tpu.models.crfp import ModelConfig
    from crfp_tpu.models.runtime import CRFPRuntimeV18
    from crfp_tpu.ops.metrics import masked_psnr, masked_ssim
    from crfp_tpu.tools.convert_torch import convert_state_dict

    torch.manual_seed(seed)
    tm = TorchRuntimeV18(mid)
    params = convert_state_dict(tm.state_dict())

    lrs, gts = translating_clip(t=t, h=h, w=w, seed=seed)
    fvs = gts[:, :fv, :fv]  # top-left corner patch (runtime protocol)

    with torch.no_grad():
        sr_t = tm(
            torch.from_numpy(lrs[None]).permute(0, 1, 4, 2, 3),
            torch.from_numpy(fvs[None]).permute(0, 1, 4, 2, 3),
            warp,
        )[0].permute(0, 2, 3, 1).numpy()

    model = CRFPRuntimeV18(ModelConfig(variant="v18", mid_channels=mid),
                           warp_size=warp)
    outs = []
    state = None
    for i in range(t):
        lr_i = jnp.asarray(lrs[i : i + 1])
        fv_i = jnp.asarray(fvs[i : i + 1])
        x_lr, x_hr = model.apply(params, lr_i, fv_i, method=CRFPRuntimeV18.encode)
        if i == 0:
            state, out = model.apply(params, lr_i, x_lr, x_hr,
                                     method=CRFPRuntimeV18.step0)
        else:
            state, out = model.apply(params, state, lr_i,
                                     jnp.asarray(lrs[i - 1 : i]), x_lr, x_hr,
                                     method=CRFPRuntimeV18.step)
        outs.append(np.asarray(out)[0])
    sr_j = np.stack(outs)

    agree = float(-10.0 * np.log10(np.mean((sr_t - sr_j) ** 2) + 1e-20))
    ones = torch.ones_like(torch.from_numpy(sr_t[:, :, :, :1]).permute(0, 3, 1, 2))
    tp = torch_masked_psnr(torch.from_numpy(sr_t).permute(0, 3, 1, 2),
                           torch.from_numpy(gts).permute(0, 3, 1, 2), ones)
    ts = torch_masked_ssim(torch.from_numpy(sr_t).permute(0, 3, 1, 2),
                           torch.from_numpy(gts).permute(0, 3, 1, 2), ones)
    m = np.ones_like(sr_j[..., :1])
    jp = float(masked_psnr(jnp.asarray(sr_j), jnp.asarray(gts), jnp.asarray(m)))
    js = float(masked_ssim(jnp.asarray(sr_j), jnp.asarray(gts), jnp.asarray(m)))
    return {"agree_db": agree, "torch": (tp, ts), "jax": (jp, js)}


def main():
    # goldens are minted on CPU for bit-reproducibility (the axon
    # sitecustomize would otherwise route jax to the TPU)
    import argparse

    import jax

    jax.config.update("jax_platforms", "cpu")
    ap = argparse.ArgumentParser()
    # flagship width (reference main.py:34); 16 reproduces the r2/r3 mint
    ap.add_argument("--mid", type=int, default=32)
    mid = ap.parse_args().mid
    print(f"# GOLDEN — paired torch-mirror vs crfp_tpu numbers (procedural data, mid={mid})")
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
    c2 = golden_config2(mid=mid)
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
    print()
    c3 = golden_config3(mid=mid)
    print("## Config 3 — v18 streaming 4-zone eval, sigma sweep (test_video.py)")
    print()
    print("| sigma | zone | torch PSNR | jax PSNR | torch SSIM | jax SSIM |")
    print("|---|---|---|---|---|---|")
    d3 = 0.0
    for sigma, rows in c3.items():
        for zone, (tp, jp, ts, js) in rows.items():
            print(f"| {sigma:.0f} | {zone} | {tp:.4f} | {jp:.4f} | {ts:.6f} | {js:.6f} |")
            d3 = max(d3, abs(tp - jp))
    print(f"\nmax |dPSNR| = {d3:.4f} dB")
    print()
    c4 = golden_config4(mid=mid)
    print("## Config 4 — paired 5-step training run (reference recipe)")
    print()
    print("| step | torch loss | jax loss | rel diff |")
    print("|---|---|---|---|")
    for i, (tl, jl) in enumerate(zip(c4["torch"], c4["jax"])):
        print(f"| {i} | {tl:.6f} | {jl:.6f} | {abs(tl-jl)/tl:.2e} |")
    print()
    c5 = golden_config5(mid=mid)
    print("## Config 5 — runtime (warp_size ROI) protocol pair")
    print()
    print("| stack | PSNR vs GT | SSIM vs GT |")
    print("|---|---|---|")
    print(f"| torch mirror | {c5['torch'][0]:.4f} | {c5['torch'][1]:.6f} |")
    print(f"| crfp_tpu | {c5['jax'][0]:.4f} | {c5['jax'][1]:.6f} |")
    print(f"\ncross-stack output agreement: {c5['agree_db']:.1f} dB; "
          f"|dPSNR| = {abs(c5['torch'][0]-c5['jax'][0]):.4f} dB")


if __name__ == "__main__":
    main()

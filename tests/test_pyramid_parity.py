"""Full-forward parity for the gen-1 pyramid runtime models
(MRCF_x8 / MRCF_CRA_x8, /root/reference/model/CRFP_runtime.py:1556-3418)
against line-for-line torch mirrors with reference state-dict names."""

import sys

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

sys.path.insert(0, "tests")
from test_full_parity import (  # noqa: E402
    LTE_lr,
    PixelShufflePack,
    torch_dcnv2,
    torch_flow_warp,
)
from test_spynet import TorchSPyNet  # noqa: E402
from test_variant_parity import TorchLTE_hr3  # noqa: E402

torch.manual_seed(0)


def _up2(x):
    return F.interpolate(x, scale_factor=2, mode="bilinear", align_corners=False)


def _down2(x):
    return F.interpolate(x, scale_factor=0.5, mode="bilinear", align_corners=False)


class RtResBlocksN(nn.Module):
    """Runtime-file ResidualBlocksWithInputConv (CRFP_runtime.py:464-509):
    conv1 + DEAD conv2 (in//3, the latent stitching bug) + main=[lrelu,
    blocks]; blocks use ReLU inside (ResidualBlockNoBN)."""

    def __init__(self, cin, cout, n):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, 1, 1)
        self.conv2 = nn.Conv2d(max(cin // 3, 1), cout, 3, 1, 1)  # dead
        blocks = nn.Sequential()
        for i in range(n):
            b = nn.Module()
            b.conv1 = nn.Conv2d(cout, cout, 3, 1, 1)
            b.conv2 = nn.Conv2d(cout, cout, 3, 1, 1)
            blocks.add_module(str(i), b)
        self.main = nn.Sequential(nn.LeakyReLU(0.1), blocks)

    def forward(self, x):
        x = F.leaky_relu(self.conv1(x), 0.1)
        for b in self.main[1]:
            x = x + b.conv2(F.relu(b.conv1(x)))
        return x


class PyrLevel(nn.Module):
    """One level's dcn_pre/dcn_block/heads/DCN params with the reference's
    flat ``*_lv{k}`` names (emitted through state_dict_flat)."""

    def __init__(self, m, dg, lv):
        super().__init__()
        self.dg, self.lv = dg, lv
        self.pre = nn.Conv2d(m * 2 + 2, m, 3, 1, 1)
        self.b1 = nn.Conv2d(m, m, 3, 1, 1)
        self.b2 = nn.Conv2d(m, m, 3, 1, 1)
        self.off = nn.Conv2d(m, dg * 2 * 9, 3, 1, 1)
        self.msk = nn.Conv2d(m, dg * 9, 3, 1, 1)
        self.w = nn.Parameter(torch.randn(m, m, 3, 3) * 0.1)
        self.b = nn.Parameter(torch.randn(m) * 0.1)

    def forward(self, cur, state, warped, flow):
        feat = torch.cat([cur, warped, flow], dim=1)
        feat = self.pre(feat)
        feat = F.leaky_relu(feat, 0.1)
        feat = F.leaky_relu(self.b1(feat), 0.1)
        feat = F.leaky_relu(self.b2(feat), 0.1)
        off = 10.0 * torch.tanh(self.off(feat))
        fl = torch.cat((flow[:, 1:2], flow[:, 0:1]), dim=1)
        off = off + fl.repeat(1, off.size(1) // 2, 1, 1)
        mask = torch.sigmoid(self.msk(feat))
        return torch_dcnv2(state, off, mask, self.w, self.b, self.dg)

    def state_dict_flat(self):
        lv = self.lv
        return {
            f"dcn_pre_lv{lv}.weight": self.pre.weight, f"dcn_pre_lv{lv}.bias": self.pre.bias,
            f"dcn_block_lv{lv}.1.weight": self.b1.weight, f"dcn_block_lv{lv}.1.bias": self.b1.bias,
            f"dcn_block_lv{lv}.3.weight": self.b2.weight, f"dcn_block_lv{lv}.3.bias": self.b2.bias,
            f"dcn_offset_lv{lv}.weight": self.off.weight, f"dcn_offset_lv{lv}.bias": self.off.bias,
            f"dcn_mask_lv{lv}.weight": self.msk.weight, f"dcn_mask_lv{lv}.bias": self.msk.bias,
            f"dcn_lv{lv}.weight": self.w, f"dcn_lv{lv}.bias": self.b,
        }


class TorchPyramidX8(nn.Module):
    """Mirror of MRCF_x8 (cra=False, :1556-2335) / MRCF_CRA_x8 (cra=True,
    :2336-3418) minus the CUDA-event instrumentation."""

    def __init__(self, mid=16, dg_num=16, cra=False):
        super().__init__()
        self.m, self.cra = mid, cra
        dgs = (1, 1, 1, 1) if cra else (dg_num, dg_num, dg_num // 4, dg_num // 16)
        self.levels = nn.ModuleList([PyrLevel(mid, dgs[k], k) for k in range(4)])
        self.spynet = TorchSPyNet()
        self.encoder_lr = LTE_lr(mid, 3)
        self.encoder_hr = TorchLTE_hr3(mid)
        self.res = nn.ModuleList([
            RtResBlocksN(mid * 2, mid, b) for b in (3, 3, 1, 1)])
        self.ups = nn.ModuleList([PixelShufflePack(mid, mid, 2, 3) for _ in range(3)])
        if cra:
            self.conv_tttf_lv1 = nn.Conv2d(mid * 2, mid, 3, 1, 1)
            self.conv_tttf_lv2 = nn.Conv2d(mid * 2, mid, 3, 1, 1)
        self.conv_tttf_lv3 = nn.Conv2d(mid * 2, mid, 3, 1, 1)
        self.conv_hr_lv3 = nn.Conv2d(mid, mid, 3, 1, 1)
        self.conv_last_lv3 = nn.Conv2d(mid, 3, 3, 1, 1)

    def reference_state_dict(self):
        sd = {}
        for lvl in self.levels:
            sd.update(lvl.state_dict_flat())
        for k, v in self.state_dict().items():
            if k.startswith("levels."):
                continue
            if k.startswith("res."):
                # res.{k}.conv1.weight -> forward_resblocks_lv{k}.conv1...
                parts = k.split(".")
                sd[f"forward_resblocks_lv{parts[1]}." + ".".join(parts[2:])] = v
            elif k.startswith("ups."):
                parts = k.split(".")
                sd[f"upsample{parts[1]}." + ".".join(parts[2:])] = v
            else:
                sd[k] = v
        return sd

    def _inject(self, k, x, x_hr, mk):
        if self.cra:
            ph, pw = x_hr.shape[2:]
            tttf = getattr(self, f"conv_tttf_lv{k}")
            patched = tttf(torch.cat([x[:, :, :ph, :pw], x_hr], dim=1))
            x = x.clone()
            x[:, :, :ph, :pw] = patched
            return x
        if k != 3:
            return x
        blended = self.conv_tttf_lv3(torch.cat([x, x_hr], dim=1))
        return mk * blended + (1 - mk) * x

    def forward(self, lrs, fvs, mks=None):
        n, t, c, h, w = lrs.shape
        flows = self.spynet(
            lrs[:, 1:].reshape(-1, c, h, w), lrs[:, :-1].reshape(-1, c, h, w)
        ).view(n, t - 1, 2, h, w)

        flat = lrs.reshape(-1, c, h, w)
        lrs_lv3 = _up2(_up2(_up2(flat)))
        x_lr = self.encoder_lr(flat).view(n, t, self.m, h, w)
        if self.cra:
            ph, pw = fvs.shape[3:]
            enc_in = torch.cat([fvs.reshape(-1, c, ph, pw), lrs_lv3[:, :, :ph, :pw]], 1)
        else:
            fvb = fvs * mks + lrs_lv3.view(n, t, c, 8 * h, 8 * w) * (1 - mks)
            enc_in = torch.cat([fvb.reshape(-1, c, 8 * h, 8 * w), lrs_lv3], 1)
        hr1, hr2, hr3 = self.encoder_hr(enc_in)
        seq = lambda a: a.view((n, t) + a.shape[1:])  # noqa: E731
        x_hrs = (None, seq(hr1), seq(hr2), seq(hr3))
        if self.cra:
            mk_pyr = (None, None, None, None)
        else:
            mk3 = mks.reshape(-1, 1, 8 * h, 8 * w)
            mk2 = _down2(mk3)
            mk1 = _down2(mk2)
            mk_pyr = (None, seq(mk1), seq(mk2), seq(mk3))

        outs = []
        lv3 = None
        for i in range(t):
            cur = x_lr[:, i]
            hrs = tuple(None if x is None else x[:, i] for x in x_hrs)
            mksl = tuple(None if x is None else x[:, i] for x in mk_pyr)
            if i == 0:
                for k in range(4):
                    zeros = torch.zeros(n, self.m, h * 2**k, w * 2**k)
                    x = self.res[k](torch.cat([cur, zeros], dim=1))
                    if k >= 1:
                        x = self._inject(k, x, hrs[k], mksl[k])
                    if k < 3:
                        cur = F.leaky_relu(self.ups[k](x), 0.1)
                    else:
                        lv3 = x
            else:
                fl = [flows[:, i - 1]]
                for _ in range(3):
                    fl.append(_up2(fl[-1]))
                st3 = lv3
                st2 = _down2(st3)
                st1 = _down2(st2)
                st0 = _down2(st1)
                states = (st0, st1, st2, st3)
                warpeds = tuple(
                    torch_flow_warp(s, f.permute(0, 2, 3, 1))
                    for s, f in zip(states, fl))
                for k in range(4):
                    aligned = self.levels[k](cur, states[k], warpeds[k], fl[k])
                    x = self.res[k](torch.cat([cur, aligned], dim=1))
                    if k >= 1:
                        x = self._inject(k, x, hrs[k], mksl[k])
                    if k < 3:
                        cur = F.leaky_relu(self.ups[k](x), 0.1)
                    else:
                        lv3 = x
            out = F.leaky_relu(self.conv_hr_lv3(lv3), 0.1)
            out = self.conv_last_lv3(out)
            out = out + F.interpolate(lrs[:, i], scale_factor=8, mode="bilinear",
                                      align_corners=False)
            outs.append(out)
        return torch.stack(outs, dim=1)


class TorchPyramidX4(nn.Module):
    """Mirror of MRCF_x4 (cra=False, :820-1176) / MRCF_CRA_x4 (cra=True,
    :1177-1555): levels at 1x/1x/2x/4x, lv0 bare-lrelu, upsample1/2 after
    lv1/lv2, flow_lv1 = flow_lv0, lv0 state/warp alias lv1's, single-4x
    emission base; cra injects tttf mask blends at lv1/2/3."""

    def __init__(self, mid=16, dg_num=16, cra=False):
        super().__init__()
        self.m, self.cra = mid, cra
        dgs = (dg_num, dg_num, dg_num // 4, dg_num // 16)
        self.levels = nn.ModuleList([PyrLevel(mid, dgs[k], k) for k in range(4)])
        self.spynet = TorchSPyNet()
        self.encoder_lr = LTE_lr(mid, 3)
        self.encoder_hr = TorchLTE_hr3(mid)
        self.res = nn.ModuleList([
            RtResBlocksN(mid * 2, mid, b) for b in (3, 3, 1, 1)])
        self.upsample1 = PixelShufflePack(mid, mid, 2, 3)
        self.upsample2 = PixelShufflePack(mid, mid, 2, 3)
        if cra:
            self.conv_tttf_lv1 = nn.Conv2d(mid * 2, mid, 3, 1, 1)
            self.conv_tttf_lv2 = nn.Conv2d(mid * 2, mid, 3, 1, 1)
        self.conv_tttf_lv3 = nn.Conv2d(mid * 2, mid, 3, 1, 1)
        self.conv_hr_lv3 = nn.Conv2d(mid, mid, 3, 1, 1)
        self.conv_last_lv3 = nn.Conv2d(mid, 3, 3, 1, 1)

    def reference_state_dict(self):
        sd = {}
        for lvl in self.levels:
            sd.update(lvl.state_dict_flat())
        for k, v in self.state_dict().items():
            if k.startswith("levels."):
                continue
            if k.startswith("res."):
                parts = k.split(".")
                sd[f"forward_resblocks_lv{parts[1]}." + ".".join(parts[2:])] = v
            else:
                sd[k] = v
        return sd

    def _tail(self, k, x, x_hr, mk):
        if k >= 1 and (self.cra or k == 3):
            tttf = getattr(self, f"conv_tttf_lv{k}")
            blended = tttf(torch.cat([x, x_hr], dim=1))
            x = mk * blended + (1 - mk) * x
        if k == 0:
            return F.leaky_relu(x, 0.1)
        if k in (1, 2):
            return F.leaky_relu(getattr(self, f"upsample{k}")(x), 0.1)
        return x

    def forward(self, lrs, fvs, mks):
        n, t, c, h, w = lrs.shape
        flows = self.spynet(
            lrs[:, 1:].reshape(-1, c, h, w), lrs[:, :-1].reshape(-1, c, h, w)
        ).view(n, t - 1, 2, h, w)

        flat = lrs.reshape(-1, c, h, w)
        lrs_lv3 = _up2(_up2(flat))
        x_lr = self.encoder_lr(flat).view(n, t, self.m, h, w)
        fvb = fvs * mks + lrs_lv3.view(n, t, c, 4 * h, 4 * w) * (1 - mks)
        enc_in = torch.cat([fvb.reshape(-1, c, 4 * h, 4 * w), lrs_lv3], 1)
        hr1, hr2, hr3 = self.encoder_hr(enc_in)
        seq = lambda a: a.view((n, t) + a.shape[1:])  # noqa: E731
        x_hrs = (None, seq(hr1), seq(hr2), seq(hr3))
        mk3 = mks.reshape(-1, 1, 4 * h, 4 * w)
        mk2 = _down2(mk3)
        mk1 = _down2(mk2)
        mk_pyr = (None, seq(mk1), seq(mk2), seq(mk3))

        scales = (1, 1, 2, 4)
        outs = []
        lv3 = None
        for i in range(t):
            cur = x_lr[:, i]
            hrs = tuple(None if x is None else x[:, i] for x in x_hrs)
            mksl = tuple(None if x is None else x[:, i] for x in mk_pyr)
            if i == 0:
                for k in range(4):
                    zeros = torch.zeros(n, self.m, h * scales[k], w * scales[k])
                    x = self.res[k](torch.cat([cur, zeros], dim=1))
                    x = self._tail(k, x, hrs[k], mksl[k])
                    if k < 3:
                        cur = x
                    else:
                        lv3 = x
            else:
                f0 = flows[:, i - 1]
                fl = (f0, f0, _up2(f0), _up2(_up2(f0)))
                st3 = lv3
                st2 = _down2(st3)
                st1 = _down2(st2)
                states = (st1, st1, st2, st3)
                w0 = torch_flow_warp(states[0], fl[0].permute(0, 2, 3, 1))
                warpeds = (
                    w0, w0,
                    torch_flow_warp(st2, fl[2].permute(0, 2, 3, 1)),
                    torch_flow_warp(st3, fl[3].permute(0, 2, 3, 1)))
                for k in range(4):
                    aligned = self.levels[k](cur, states[k], warpeds[k], fl[k])
                    x = self.res[k](torch.cat([cur, aligned], dim=1))
                    x = self._tail(k, x, hrs[k], mksl[k])
                    if k < 3:
                        cur = x
                    else:
                        lv3 = x
            out = F.leaky_relu(self.conv_hr_lv3(lv3), 0.1)
            out = self.conv_last_lv3(out)
            out = out + F.interpolate(lrs[:, i], scale_factor=4, mode="bilinear",
                                      align_corners=False)
            outs.append(out)
        return torch.stack(outs, dim=1)


def _run_pair(cra: bool):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from crfp_tpu.models.pyramid import CRFPPyramidX8
    from crfp_tpu.tools.convert_torch import convert_state_dict

    m, t, h, w = 16, 3, 8, 8
    tm = TorchPyramidX8(mid=m, dg_num=16, cra=cra).eval()
    # shrink the random offset heads so sampling positions stay sane
    with torch.no_grad():
        for lvl in tm.levels:
            lvl.off.weight *= 0.05
            lvl.off.bias *= 0.05
    params = convert_state_dict(tm.reference_state_dict())

    rng = np.random.default_rng(3)
    lrs = rng.uniform(0, 1, (1, t, h, w, 3)).astype(np.float32)
    if cra:
        fvs = rng.uniform(0, 1, (1, t, 16, 16, 3)).astype(np.float32)
        mks = None
        args_t = (torch.from_numpy(lrs).permute(0, 1, 4, 2, 3),
                  torch.from_numpy(fvs).permute(0, 1, 4, 2, 3))
    else:
        fvs = rng.uniform(0, 1, (1, t, 8 * h, 8 * w, 3)).astype(np.float32)
        mks = np.zeros((1, t, 8 * h, 8 * w, 1), np.float32)
        mks[:, :, 8:40, 16:48] = 1.0
        args_t = (torch.from_numpy(lrs).permute(0, 1, 4, 2, 3),
                  torch.from_numpy(fvs).permute(0, 1, 4, 2, 3),
                  torch.from_numpy(mks).permute(0, 1, 4, 2, 3))

    with torch.no_grad():
        want = tm(*args_t).permute(0, 1, 3, 4, 2).numpy()

    model = CRFPPyramidX8(mid_channels=m, dg_num=16, cra=cra)
    if cra:
        got = np.asarray(model.apply(params, lrs, fvs))
    else:
        got = np.asarray(model.apply(params, lrs, fvs, mks))
    assert got.shape == want.shape == (1, t, 8 * h, 8 * w, 3)
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)


def test_pyramid_x8_full_forward_matches_torch():
    _run_pair(cra=False)


def test_pyramid_cra_x8_full_forward_matches_torch():
    _run_pair(cra=True)


def _run_pair_x4(cra: bool):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from crfp_tpu.models.pyramid import CRFPPyramidX4
    from crfp_tpu.tools.convert_torch import convert_state_dict

    m, t, h, w = 16, 3, 8, 8
    tm = TorchPyramidX4(mid=m, dg_num=16, cra=cra).eval()
    with torch.no_grad():
        for lvl in tm.levels:
            lvl.off.weight *= 0.05
            lvl.off.bias *= 0.05
    params = convert_state_dict(tm.reference_state_dict())

    rng = np.random.default_rng(7)
    lrs = rng.uniform(0, 1, (1, t, h, w, 3)).astype(np.float32)
    fvs = rng.uniform(0, 1, (1, t, 4 * h, 4 * w, 3)).astype(np.float32)
    mks = np.zeros((1, t, 4 * h, 4 * w, 1), np.float32)
    mks[:, :, 4:20, 8:24] = 1.0
    args_t = (torch.from_numpy(lrs).permute(0, 1, 4, 2, 3),
              torch.from_numpy(fvs).permute(0, 1, 4, 2, 3),
              torch.from_numpy(mks).permute(0, 1, 4, 2, 3))

    with torch.no_grad():
        want = tm(*args_t).permute(0, 1, 3, 4, 2).numpy()

    model = CRFPPyramidX4(mid_channels=m, dg_num=16, cra=cra)
    got = np.asarray(model.apply(params, lrs, fvs, mks))
    assert got.shape == want.shape == (1, t, 4 * h, 4 * w, 3)
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)


def test_pyramid_x4_full_forward_matches_torch():
    _run_pair_x4(cra=False)


def test_pyramid_cra_x4_full_forward_matches_torch():
    _run_pair_x4(cra=True)

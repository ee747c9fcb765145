"""Full-model parity gate: a torch mirror of the reference CRFP_DSV (v18)
forward — including a grid_sample-based DCNv2 oracle — must match our model
under converted weights. This is the strongest guarantee behind the
0.05 dB parity budget."""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

torch.manual_seed(0)


# ---------------- torch-side oracles ----------------


def torch_flow_warp(x, flow, padding_mode="zeros"):
    n, c, h, w = x.shape
    gy, gx = torch.meshgrid(torch.arange(h), torch.arange(w), indexing="ij")
    grid = torch.stack((gx, gy), 2).float()[None] + flow
    gxn = 2.0 * grid[..., 0] / max(w - 1, 1) - 1.0
    gyn = 2.0 * grid[..., 1] / max(h - 1, 1) - 1.0
    return F.grid_sample(
        x, torch.stack((gxn, gyn), dim=3), mode="bilinear",
        padding_mode=padding_mode, align_corners=True,
    )


def torch_dcnv2(x, offset, mask, weight, bias, dg):
    """Modulated deformable conv. offset (B, dg*2*k2, H, W) packed
    (g, tap, (y,x)); mask (B, dg*k2, H, W) packed (g, tap)."""
    b, c, h, w = x.shape
    o, _, kh, kw = weight.shape
    k2 = kh * kw
    cpg = c // dg
    off = offset.view(b, dg, k2, 2, h, w)
    mk = mask.view(b, dg, k2, h, w)
    ys, xs = torch.meshgrid(torch.arange(h), torch.arange(w), indexing="ij")
    cols = torch.zeros(b, dg, k2, cpg, h, w)
    for g in range(dg):
        xg = x[:, g * cpg : (g + 1) * cpg]
        for t in range(k2):
            ky, kx = t // kw, t % kw
            py = ys[None].float() + (ky - (kh - 1) // 2) + off[:, g, t, 0]
            px = xs[None].float() + (kx - (kw - 1) // 2) + off[:, g, t, 1]
            gxn = 2 * px / max(w - 1, 1) - 1
            gyn = 2 * py / max(h - 1, 1) - 1
            grid = torch.stack([gxn, gyn], dim=-1)
            samp = F.grid_sample(xg, grid, mode="bilinear", padding_mode="zeros",
                                 align_corners=True)
            cols[:, g, t] = samp * mk[:, g, t : t + 1]
    w2 = weight.view(o, dg, cpg, kh * kw)
    out = torch.einsum("bgkchw,ogck->bohw", cols, w2)
    return out + bias.view(1, -1, 1, 1)


def _pixel_unshuffle_ref(x, f):
    c = x.shape[1]
    kernel = torch.zeros(f * f * c, 1, f, f)
    for y in range(f):
        for xx in range(f):
            kernel[xx + y * f :: f * f, 0, y, xx] = 1
    return F.conv2d(x, kernel, stride=f, groups=c)


# ---------------- torch mirror modules (reference names) ----------------


class PixelShufflePack(nn.Module):
    def __init__(self, cin, cout, s, k):
        super().__init__()
        self.s = s
        self.upsample_conv = nn.Conv2d(cin, cout * s * s, k, padding=(k - 1) // 2)

    def forward(self, x):
        return F.pixel_shuffle(self.upsample_conv(x), self.s)


class PixelUnShufflePackV2(nn.Module):
    def __init__(self, cin, cout, s, k):
        super().__init__()
        self.s = s
        self.downsample_conv = nn.Conv2d(cin * s * s, cout, k, padding=(k - 1) // 2)

    def forward(self, x):
        return self.downsample_conv(_pixel_unshuffle_ref(x, self.s))


class ResBlocks(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        block = nn.Module()
        block.conv1 = nn.Conv2d(cout, cout, 3, 1, 1)
        block.conv2 = nn.Conv2d(cout, cout, 3, 1, 1)
        inner = nn.Sequential()
        inner.add_module("0", block)
        self.main = nn.Sequential(nn.Conv2d(cin, cout, 3, 1, 1), nn.LeakyReLU(0.1), inner)

    def forward(self, x):
        x = F.leaky_relu(self.main[0](x), 0.1)
        b = self.main[2][0]
        return x + b.conv2(F.relu(b.conv1(x)))


class DCNModule(nn.Module):
    # mirror of /root/reference/model/CRFP.py:281-370
    def __init__(self, mid, dg, dk, max_mag, repeat=False, pre_offset=False, interpolate="none"):
        super().__init__()
        self.dg, self.dk, self.max_mag = dg, dk, max_mag
        self.repeat, self.pre_offset_flag, self.interpolate = repeat, pre_offset, interpolate
        if pre_offset and interpolate == "pixelshuffle":
            self.upsample = PixelShufflePack(mid * 8, mid, 4, 3)
        if pre_offset:
            self.conv_fuse = nn.Conv2d(mid * 2, mid, 3, 1, 1)
        self.dcn_block = nn.Sequential(
            nn.Conv2d(mid * 2 + 2, mid, 3, 1, 1), nn.LeakyReLU(0.1),
            nn.Conv2d(mid, mid, 3, 1, 1), nn.LeakyReLU(0.1))
        if repeat:
            self.dcn_offset = nn.Conv2d(mid, dg * 2, 3, 1, 1)
            self.dcn_mask = nn.Conv2d(mid, dg, 3, 1, 1)
        else:
            self.dcn_offset = nn.Conv2d(mid, dg * 2 * dk * dk, 3, 1, 1)
            self.dcn_mask = nn.Conv2d(mid, dg * dk * dk, 3, 1, 1)
        self.dcn = nn.Module()
        self.dcn.weight = nn.Parameter(torch.randn(mid, mid, dk, dk) * 0.1)
        self.dcn.bias = nn.Parameter(torch.randn(mid) * 0.1)

    def forward(self, cur_x, pre_x, pre_x_aligned, flow, pre_offset=None):
        feat = torch.cat([cur_x, pre_x_aligned, flow], dim=1)
        feat = self.dcn_block(feat)
        if torch.is_tensor(pre_offset):
            if self.interpolate != "none":
                pre_offset = self.upsample(pre_offset) * 2.0
            feat = F.leaky_relu(self.conv_fuse(torch.cat([feat, pre_offset], dim=1)), 0.1)
        offset = self.max_mag * torch.tanh(self.dcn_offset(feat))
        mask = torch.sigmoid(self.dcn_mask(feat))
        if self.repeat:
            b, c, h, w = offset.size()
            offset = offset.view(b, 2, c // 2, h, w)
            offset = offset + flow.flip(1).unsqueeze(2).repeat(1, 1, c // 2, 1, 1)
            offset = offset.repeat(1, self.dk**2, 1, 1, 1).view(b, c * self.dk**2, h, w)
            mask = mask.repeat(1, self.dk**2, 1, 1)
        else:
            offset = offset + flow.flip(1).repeat(1, offset.size(1) // 2, 1, 1)
        out = torch_dcnv2(pre_x, offset, mask, self.dcn.weight, self.dcn.bias, self.dg)
        return out, feat


class LTE_lr(nn.Module):
    def __init__(self, mid, cin=3):
        super().__init__()
        self.slice1 = nn.Sequential(
            nn.Conv2d(cin, mid, 3, 1, 1), nn.LeakyReLU(0.1),
            nn.Conv2d(mid, mid, 3, 1, 1), nn.LeakyReLU(0.1))

    def forward(self, x):
        return self.slice1(x)


import sys

sys.path.insert(0, "tests")
from test_convert import TorchFNet  # noqa: E402


class TorchCRFP_DSV(nn.Module):
    """Line-for-line mirror of /root/reference/model/CRFP.py:1387-1686."""

    def __init__(self, mid=16):
        super().__init__()
        self.mid = mid
        self.last = mid // 8
        self.dg, self.dk, self.mag = 8, 3, 10
        self.split_ratio = 3
        self.spynet = TorchFNet()
        self.dcn_0 = DCNModule(mid, self.dg, self.dk, self.mag)
        self.dcn_1 = DCNModule(mid, self.dg, self.dk, self.mag, pre_offset=True)
        self.dcn_2 = DCNModule(mid, self.dg, self.dk, self.mag, pre_offset=True)
        self.dcn_3 = DCNModule(self.last, 1, self.dk, self.mag, repeat=True,
                               pre_offset=True, interpolate="pixelshuffle")
        self.encoder_lr = LTE_lr(mid, 3)
        self.encoder_hr = LTE_lr(self.last, 6)
        self.conv_tttf = nn.Conv2d(self.last * 2, self.last, 3, 1, 1)
        self.forward_resblocks_0 = ResBlocks(mid * 2, mid)
        self.forward_resblocks_1 = ResBlocks(mid * 2, mid)
        self.forward_resblocks_2 = ResBlocks(mid * 2, mid)
        self.forward_resblocks_3 = ResBlocks(self.last * 2, self.last)
        self.downsample = PixelUnShufflePackV2(self.last, mid, 4, 3)
        self.upsample = PixelShufflePack(mid, (mid * 3) // 4, 2, 3)
        self.upsample_post = PixelShufflePack((mid * 3) // 4, self.last, 4, 3)
        self.conv_last = nn.Conv2d(self.last, 3, 3, 1, 1)

    def forward(self, lrs, fvs, mks):
        n, t, c, h, w = lrs.size()
        up8 = lambda x: F.interpolate(x, scale_factor=8, mode="bilinear", align_corners=False)
        up2 = lambda x: F.interpolate(x, scale_factor=2, mode="bilinear", align_corners=False)

        lrs_1 = lrs[:, :-1].reshape(-1, c, h, w)
        lrs_2 = lrs[:, 1:].reshape(-1, c, h, w)
        flows = self.spynet(lrs_2, lrs_1).view(n, t - 1, 2, h, w)

        feat_prop_lv3 = lrs.new_zeros(n, self.mid, h * 2, w * 2)
        feat_prop_lv3_0 = lrs.new_zeros(n, self.last, h * 8, w * 8)
        sc = (self.mid * (4 - self.split_ratio)) // 4
        feat_lv0 = lrs.new_zeros(n, sc, h * 2, w * 2)
        feat_lv1 = lrs.new_zeros(n, sc, h * 2, w * 2)
        feat_lv2 = lrs.new_zeros(n, sc, h * 2, w * 2)

        lrs_lv0 = lrs.view(n * t, c, h, w)
        lrs_lv3 = up8(lrs_lv0)
        x_lr_lv0 = self.encoder_lr(lrs_lv0)
        mksf = mks.float()
        fvs = fvs * mksf + lrs_lv3.view(n, t, c, h * 8, w * 8) * (1 - mksf)
        x_hr_lv3 = self.encoder_hr(torch.cat((fvs.view(n * t, c, h * 8, w * 8), lrs_lv3), dim=1))
        x_lr_lv0 = x_lr_lv0.view(n, t, self.mid, h, w)
        x_hr_lv3 = x_hr_lv3.view(n, t, self.last, h * 8, w * 8)

        outs = []
        for i in range(t):
            lr_cur = lrs[:, i]
            mk_cur = mks[:, i]
            feat_prop_lv0 = self.upsample(x_lr_lv0[:, i])
            if i > 0:
                flow = flows[:, i - 1]
                flow_lv3 = up2(flow) * 2.0
                flow_lv0 = up8(flow) * 8.0
                feat_prop_lv3_0 = feat_prop_lv3
                feat_prop_lv3 = self.downsample(feat_prop_lv3)
                feat_prop_lv3_ = torch_flow_warp(feat_prop_lv3, flow_lv3.permute(0, 2, 3, 1))
                feat_prop_lv3_0_ = torch_flow_warp(feat_prop_lv3_0, flow_lv0.permute(0, 2, 3, 1))
                mixed = torch_flow_warp(torch.cat((feat_lv0, feat_lv1, feat_lv2), 1),
                                        flow_lv3.permute(0, 2, 3, 1))
                feat_lv0, feat_lv1, feat_lv2 = torch.chunk(mixed, 3, dim=1)

                feat_prop_lv0 = torch.cat((feat_prop_lv0, feat_lv0), dim=1)
                a, offset = self.dcn_0(feat_prop_lv0, feat_prop_lv3, feat_prop_lv3_, flow_lv3)
                x = self.forward_resblocks_0(torch.cat([feat_prop_lv0, a], dim=1))
                ch = torch.chunk(x, 4, dim=1)
                feat_lv0 = torch.cat(ch[self.split_ratio :], dim=1)
                x = torch.cat(ch[: self.split_ratio], dim=1)

                x = torch.cat((x, feat_lv1), dim=1)
                a, offset = self.dcn_1(x, feat_prop_lv3, feat_prop_lv3_, flow_lv3, offset)
                x = self.forward_resblocks_1(torch.cat([x, a], dim=1))
                ch = torch.chunk(x, 4, dim=1)
                feat_lv1 = torch.cat(ch[self.split_ratio :], dim=1)
                x = torch.cat(ch[: self.split_ratio], dim=1)

                x = torch.cat((x, feat_lv2), dim=1)
                a, offset = self.dcn_2(x, feat_prop_lv3, feat_prop_lv3_, flow_lv3, offset)
                x = self.forward_resblocks_2(torch.cat([x, a], dim=1))
                ch = torch.chunk(x, 4, dim=1)
                feat_lv2 = torch.cat(ch[self.split_ratio :], dim=1)
                x = torch.cat(ch[: self.split_ratio], dim=1)

                x = F.leaky_relu(self.upsample_post(x), 0.1)
                a, _ = self.dcn_3(x, feat_prop_lv3_0, feat_prop_lv3_0_, flow_lv0, offset)
                feat_prop_lv3 = self.forward_resblocks_3(torch.cat([x, a], dim=1))
            else:
                x = torch.cat([feat_prop_lv0, feat_prop_lv3, feat_lv0], dim=1)
                x = self.forward_resblocks_0(x)
                ch = torch.chunk(x, 4, dim=1)
                feat_lv0 = torch.cat(ch[self.split_ratio :], dim=1)
                x = torch.cat(ch[: self.split_ratio], dim=1)

                x = torch.cat([x, feat_prop_lv3, feat_lv1], dim=1)
                x = self.forward_resblocks_1(x)
                ch = torch.chunk(x, 4, dim=1)
                feat_lv1 = torch.cat(ch[self.split_ratio :], dim=1)
                x = torch.cat(ch[: self.split_ratio], dim=1)

                x = torch.cat([x, feat_prop_lv3, feat_lv2], dim=1)
                x = self.forward_resblocks_2(x)
                ch = torch.chunk(x, 4, dim=1)
                feat_lv2 = torch.cat(ch[self.split_ratio :], dim=1)
                x = torch.cat(ch[: self.split_ratio], dim=1)

                x = F.leaky_relu(self.upsample_post(x), 0.1)
                feat_prop_lv3 = self.forward_resblocks_3(torch.cat([x, feat_prop_lv3_0], dim=1))

            blended = self.conv_tttf(torch.cat([feat_prop_lv3, x_hr_lv3[:, i]], dim=1))
            feat_prop_lv3 = mk_cur.float() * blended + (1 - mk_cur.float()) * feat_prop_lv3
            feat_prop_lv3 = F.leaky_relu(feat_prop_lv3, 0.1)
            out = self.conv_last(feat_prop_lv3) + up8(lr_cur)
            outs.append(out)
        return torch.stack(outs, dim=1)


@pytest.mark.slow
def test_v18_full_forward_matches_torch_mirror():
    from crfp_tpu.models import CRFP, ModelConfig
    from crfp_tpu.tools.convert_torch import convert_state_dict

    tm = TorchCRFP_DSV(mid=16)
    params = convert_state_dict(tm.state_dict())

    rng = np.random.default_rng(0)
    b, t, h, w, s = 1, 3, 8, 8, 8
    lrs = rng.uniform(0, 1, (b, t, h, w, 3)).astype(np.float32)
    fvs = rng.uniform(0, 1, (b, t, h * s, w * s, 3)).astype(np.float32)
    mks = np.zeros((b, t, h * s, w * s, 1), np.float32)
    mks[:, :, 16:48, 16:48] = 1.0

    with torch.no_grad():
        want = tm(
            torch.from_numpy(lrs).permute(0, 1, 4, 2, 3),
            torch.from_numpy(fvs).permute(0, 1, 4, 2, 3),
            torch.from_numpy(mks).permute(0, 1, 4, 2, 3),
        )
    want = want.permute(0, 1, 3, 4, 2).numpy()

    model = CRFP(ModelConfig(variant="v18", mid_channels=16))
    got = np.asarray(model.apply(params, lrs, fvs, mks))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)

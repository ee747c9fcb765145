"""Full-forward parity for the no_dcn and v18_cra variants against torch
mirrors (reusing the v18 mirror building blocks)."""

import sys

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

sys.path.insert(0, "tests")
from test_convert import TorchFNet  # noqa: E402
from test_full_parity import (  # noqa: E402
    DCNModule,
    LTE_lr,
    PixelShufflePack,
    PixelUnShufflePackV2,
    ResBlocks,
    torch_flow_warp,
)

torch.manual_seed(0)


class PlainBlock(nn.Module):
    # /root/reference/model/CRFP.py:2029-2052 as named Sequential dcn_i
    def __init__(self, mid):
        super().__init__()
        self.seq = nn.Sequential(
            nn.Conv2d(mid * 2 + 2, mid, 3, 1, 1), nn.LeakyReLU(0.1),
            nn.Conv2d(mid, mid, 3, 1, 1), nn.LeakyReLU(0.1))

    def forward(self, x):
        return self.seq(x)

    def state_dict_flat(self, prefix):
        # reference names: dcn_i.{0,2}.{weight,bias}
        sd = {}
        sd[f"{prefix}.0.weight"] = self.seq[0].weight
        sd[f"{prefix}.0.bias"] = self.seq[0].bias
        sd[f"{prefix}.2.weight"] = self.seq[2].weight
        sd[f"{prefix}.2.bias"] = self.seq[2].bias
        return sd


class TorchNoDCN(nn.Module):
    """Mirror of CRFP_simple_noDCN with hr_dcn=False
    (/root/reference/model/CRFP.py:2000-2292, the working branch)."""

    def __init__(self, mid=16):
        super().__init__()
        self.mid = mid
        self.last = mid // 8
        self.spynet = TorchFNet()
        self.dcn_0 = PlainBlock(mid)
        self.dcn_1 = PlainBlock(mid)
        self.dcn_2 = PlainBlock(mid)
        self.dcn_3 = PlainBlock(mid)
        self.encoder_lr = LTE_lr(mid, 3)
        self.encoder_hr = LTE_lr(self.last, 6)
        self.conv_tttf = nn.Conv2d(self.last * 2, self.last, 3, 1, 1)
        self.forward_resblocks_0 = ResBlocks(mid * 2, mid)
        self.forward_resblocks_1 = ResBlocks(mid * 2, mid)
        self.forward_resblocks_2 = ResBlocks(mid * 2, mid)
        self.forward_resblocks_3 = ResBlocks(mid * 2, mid)
        self.downsample = PixelUnShufflePackV2(self.last, mid, 4, 3)
        self.upsample = PixelShufflePack(mid, mid, 2, 3)
        self.upsample_post = PixelShufflePack(mid, self.last, 4, 3)
        self.conv_last = nn.Conv2d(self.last, 3, 3, 1, 1)

    def reference_state_dict(self):
        sd = {}
        for k, v in self.state_dict().items():
            if k.startswith("dcn_"):
                continue
            sd[k] = v
        for i in range(4):
            sd.update(getattr(self, f"dcn_{i}").state_dict_flat(f"dcn_{i}"))
        return sd

    def forward(self, lrs, fvs, mks):
        n, t, c, h, w = lrs.size()
        up8 = lambda x: F.interpolate(x, scale_factor=8, mode="bilinear", align_corners=False)
        up2 = lambda x: F.interpolate(x, scale_factor=2, mode="bilinear", align_corners=False)
        flows = self.spynet(
            lrs[:, 1:].reshape(-1, c, h, w), lrs[:, :-1].reshape(-1, c, h, w)
        ).view(n, t - 1, 2, h, w)

        feat_prop_lv3 = lrs.new_zeros(n, self.mid, h * 2, w * 2)
        lrs_lv0 = lrs.view(n * t, c, h, w)
        lrs_lv3 = up8(lrs_lv0)
        x_lr = self.encoder_lr(lrs_lv0).view(n, t, self.mid, h, w)
        mksf = mks.float()
        fvs = fvs * mksf + lrs_lv3.view(n, t, c, h * 8, w * 8) * (1 - mksf)
        x_hr = self.encoder_hr(
            torch.cat((fvs.view(n * t, c, h * 8, w * 8), lrs_lv3), dim=1)
        ).view(n, t, self.last, h * 8, w * 8)

        outs = []
        for i in range(t):
            lv0 = self.upsample(x_lr[:, i])
            if i > 0:
                flow = flows[:, i - 1]
                flow_lv3 = up2(flow) * 2.0
                feat_prop_lv3 = self.downsample(feat_prop_lv3)
                warped = torch_flow_warp(feat_prop_lv3, flow_lv3.permute(0, 2, 3, 1))
                x = lv0
                for blk, rb in ((self.dcn_0, self.forward_resblocks_0),
                                (self.dcn_1, self.forward_resblocks_1),
                                (self.dcn_2, self.forward_resblocks_2)):
                    a = blk(torch.cat((x, warped, flow_lv3), dim=1))
                    x = rb(torch.cat([x, a], dim=1))
                a = self.dcn_3(torch.cat((x, warped, flow_lv3), dim=1))
                feat_prop_lv3 = self.forward_resblocks_3(torch.cat([x, a], dim=1))
            else:
                x = lv0
                for rb in (self.forward_resblocks_0, self.forward_resblocks_1,
                           self.forward_resblocks_2):
                    x = rb(torch.cat([x, feat_prop_lv3], dim=1))
                feat_prop_lv3 = self.forward_resblocks_3(
                    torch.cat([x, feat_prop_lv3], dim=1))
            feat_prop_lv3 = F.leaky_relu(self.upsample_post(feat_prop_lv3), 0.1)
            blended = self.conv_tttf(torch.cat([feat_prop_lv3, x_hr[:, i]], dim=1))
            feat_prop_lv3 = mks[:, i].float() * blended + (1 - mks[:, i].float()) * feat_prop_lv3
            feat_prop_lv3 = F.leaky_relu(feat_prop_lv3, 0.1)
            outs.append(self.conv_last(feat_prop_lv3) + up8(lrs[:, i]))
        return torch.stack(outs, dim=1)


def _pixel_unshuffle_ref(x, f):
    c = x.shape[1]
    kernel = torch.zeros(f * f * c, 1, f, f)
    for y in range(f):
        for xx in range(f):
            kernel[xx + y * f :: f * f, 0, y, xx] = 1
    return F.conv2d(x, kernel, stride=f, groups=c)


class TorchLTE_hr_ps(nn.Module):
    # /root/reference/model/LTE.py:119-166
    def __init__(self, mid):
        super().__init__()
        def two(cin, cout):
            return nn.Sequential(nn.Conv2d(cin, cout, 3, 1, 1), nn.LeakyReLU(0.1),
                                 nn.Conv2d(cout, cout, 3, 1, 1), nn.LeakyReLU(0.1))
        self.slice1 = two(6, mid)
        self.slice2 = two(mid * 16, mid * 4)
        self.slice3 = two(mid * 4, mid * 4)
        self.slice4 = two(mid * 4, mid * 4)
        self.conv_lv0 = nn.Conv2d(mid * 4, mid * 4, 3, 1, 1)
        self.conv_lv1 = nn.Conv2d(mid * 4, mid * 4, 3, 1, 1)
        self.conv_lv2 = nn.Conv2d(mid * 4, mid * 4, 3, 1, 1)
        self.conv_lv3 = nn.Conv2d(mid, mid, 3, 1, 1)

    def forward(self, x):
        lr = lambda v: F.leaky_relu(v, 0.1)
        x = self.slice1(x)
        lv3 = lr(self.conv_lv3(x))
        x = self.slice2(_pixel_unshuffle_ref(x, 4))
        lv2 = lr(self.conv_lv2(x))
        x = self.slice3(x)
        lv1 = lr(self.conv_lv1(x))
        x = self.slice4(x)
        lv0 = lr(self.conv_lv0(x))
        return lv0, lv1, lv2, lv3

    def fixed_slice2_keys(self, sd, prefix):
        return sd


class TorchCRA(nn.Module):
    """Mirror of CRFP_DSV_CRA (/root/reference/model/CRFP.py:2314-2665)."""

    def __init__(self, mid=16):
        super().__init__()
        self.mid = mid
        self.last = mid // 8
        self.split_ratio = 3
        self.spynet = TorchFNet()
        self.dcn_0 = DCNModule(mid, 8, 3, 10)
        self.dcn_1 = DCNModule(mid, 8, 3, 10, pre_offset=True)
        self.dcn_2 = DCNModule(mid, 8, 3, 10, pre_offset=True)
        self.dcn_3 = DCNModule(self.last, 1, 3, 10, repeat=True, pre_offset=True,
                               interpolate="pixelshuffle")
        self.encoder_lr = LTE_lr(mid, 3)
        self.encoder_hr = TorchLTE_hr_ps(self.last)
        self.conv_tttf = nn.Conv2d(self.last * 2, self.last, 3, 1, 1)
        self.conv_tttf_0 = nn.Conv2d(mid + self.last * 4, mid, 3, 1, 1)
        self.conv_tttf_1 = nn.Conv2d(mid + self.last * 4, mid, 3, 1, 1)
        self.conv_tttf_2 = nn.Conv2d(mid + self.last * 4, mid, 3, 1, 1)
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
        down4 = lambda x: F.interpolate(x, scale_factor=0.25, mode="bilinear", align_corners=False)
        flows = self.spynet(
            lrs[:, 1:].reshape(-1, c, h, w), lrs[:, :-1].reshape(-1, c, h, w)
        ).view(n, t - 1, 2, h, w)

        sr = self.split_ratio
        sc = (self.mid * (4 - sr)) // 4
        lv3_state = lrs.new_zeros(n, self.mid, h * 2, w * 2)
        hr_zero = lrs.new_zeros(n, self.last, h * 8, w * 8)
        f0 = lrs.new_zeros(n, sc, h * 2, w * 2)
        f1 = lrs.new_zeros(n, sc, h * 2, w * 2)
        f2 = lrs.new_zeros(n, sc, h * 2, w * 2)

        lrs_lv0 = lrs.view(n * t, c, h, w)
        lrs_lv3 = up8(lrs_lv0)
        x_lr = self.encoder_lr(lrs_lv0).view(n, t, self.mid, h, w)
        mksf = mks.float()
        fvs = fvs * mksf + lrs_lv3.view(n, t, c, h * 8, w * 8) * (1 - mksf)
        hv0, hv1, hv2, hv3 = self.encoder_hr(
            torch.cat((fvs.view(n * t, c, h * 8, w * 8), lrs_lv3), dim=1))
        hv0 = hv0.view(n, t, *hv0.shape[1:])
        hv1 = hv1.view(n, t, *hv1.shape[1:])
        hv2 = hv2.view(n, t, *hv2.shape[1:])
        hv3 = hv3.view(n, t, *hv3.shape[1:])

        feat_prop_lv3 = lv3_state
        outs = []
        for i in range(t):
            mk = mks[:, i].float()
            mk2 = down4(mk)
            lv0 = self.upsample(x_lr[:, i])
            if i > 0:
                flow = flows[:, i - 1]
                flow_lv3 = up2(flow) * 2.0
                flow_lv0 = up8(flow) * 8.0
                hr_prev = feat_prop_lv3
                lv3s = self.downsample(hr_prev)
                lv3w = torch_flow_warp(lv3s, flow_lv3.permute(0, 2, 3, 1))
                hrw = torch_flow_warp(hr_prev, flow_lv0.permute(0, 2, 3, 1))
                mixed = torch_flow_warp(torch.cat((f0, f1, f2), 1),
                                        flow_lv3.permute(0, 2, 3, 1))
                f0, f1, f2 = torch.chunk(mixed, 3, dim=1)

                x = torch.cat((lv0, f0), dim=1)
                a, off = self.dcn_0(x, lv3s, lv3w, flow_lv3)
                x = self.forward_resblocks_0(torch.cat([x, a], dim=1))
                b0 = self.conv_tttf_0(torch.cat([x, hv0[:, i]], dim=1))
                x = mk2 * b0 + (1 - mk2) * x
                ch = torch.chunk(x, 4, dim=1)
                f0 = torch.cat(ch[sr:], dim=1)
                x = torch.cat(ch[:sr], dim=1)

                x = torch.cat((x, f1), dim=1)
                a, off = self.dcn_1(x, lv3s, lv3w, flow_lv3, off)
                x = self.forward_resblocks_1(torch.cat([x, a], dim=1))
                b1 = self.conv_tttf_1(torch.cat([x, hv1[:, i]], dim=1))
                x = mk2 * b1 + (1 - mk2) * x
                ch = torch.chunk(x, 4, dim=1)
                f1 = torch.cat(ch[sr:], dim=1)
                x = torch.cat(ch[:sr], dim=1)

                x = torch.cat((x, f2), dim=1)
                a, off = self.dcn_2(x, lv3s, lv3w, flow_lv3, off)
                x = self.forward_resblocks_2(torch.cat([x, a], dim=1))
                b2 = self.conv_tttf_2(torch.cat([x, hv2[:, i]], dim=1))
                x = mk2 * b2 + (1 - mk2) * x
                ch = torch.chunk(x, 4, dim=1)
                f2 = torch.cat(ch[sr:], dim=1)
                x = torch.cat(ch[:sr], dim=1)

                x = F.leaky_relu(self.upsample_post(x), 0.1)
                a, _ = self.dcn_3(x, hr_prev, hrw, flow_lv0, off)
                feat_prop_lv3 = self.forward_resblocks_3(torch.cat([x, a], dim=1))
            else:
                x = torch.cat([lv0, lv3_state, f0], dim=1)
                x = self.forward_resblocks_0(x)
                b0 = self.conv_tttf_0(torch.cat([x, hv0[:, i]], dim=1))
                x = mk2 * b0 + (1 - mk2) * x
                ch = torch.chunk(x, 4, dim=1)
                f0 = torch.cat(ch[sr:], dim=1)
                x = torch.cat(ch[:sr], dim=1)

                x = torch.cat([x, lv3_state, f1], dim=1)
                x = self.forward_resblocks_1(x)
                b1 = self.conv_tttf_1(torch.cat([x, hv1[:, i]], dim=1))
                x = mk2 * b1 + (1 - mk2) * x
                ch = torch.chunk(x, 4, dim=1)
                f1 = torch.cat(ch[sr:], dim=1)
                x = torch.cat(ch[:sr], dim=1)

                x = torch.cat([x, lv3_state, f2], dim=1)
                x = self.forward_resblocks_2(x)
                b2 = self.conv_tttf_2(torch.cat([x, hv2[:, i]], dim=1))
                x = mk2 * b2 + (1 - mk2) * x
                ch = torch.chunk(x, 4, dim=1)
                f2 = torch.cat(ch[sr:], dim=1)
                x = torch.cat(ch[:sr], dim=1)

                x = F.leaky_relu(self.upsample_post(x), 0.1)
                feat_prop_lv3 = self.forward_resblocks_3(torch.cat([x, hr_zero], dim=1))

            blended = self.conv_tttf(torch.cat([feat_prop_lv3, hv3[:, i]], dim=1))
            feat_prop_lv3 = mk * blended + (1 - mk) * feat_prop_lv3
            feat_prop_lv3 = F.leaky_relu(feat_prop_lv3, 0.1)
            outs.append(self.conv_last(feat_prop_lv3) + up8(lrs[:, i]))
        return torch.stack(outs, dim=1)


@pytest.mark.slow
def test_v18_cra_matches_torch_mirror():
    from crfp_tpu.models import CRFP, ModelConfig
    from crfp_tpu.tools.convert_torch import convert_state_dict

    tm = TorchCRA(mid=16)
    params = convert_state_dict(tm.state_dict())
    lrs, fvs, mks = _inputs()
    with torch.no_grad():
        want = tm(
            torch.from_numpy(lrs).permute(0, 1, 4, 2, 3),
            torch.from_numpy(fvs).permute(0, 1, 4, 2, 3),
            torch.from_numpy(mks).permute(0, 1, 4, 2, 3),
        ).permute(0, 1, 3, 4, 2).numpy()

    model = CRFP(ModelConfig(variant="v18_cra", mid_channels=16))
    got = np.asarray(model.apply(params, lrs, fvs, mks))
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


def _inputs(b=1, t=3, h=8, w=8, s=8, seed=0):
    rng = np.random.default_rng(seed)
    lrs = rng.uniform(0, 1, (b, t, h, w, 3)).astype(np.float32)
    fvs = rng.uniform(0, 1, (b, t, h * s, w * s, 3)).astype(np.float32)
    mks = np.zeros((b, t, h * s, w * s, 1), np.float32)
    mks[:, :, 16:48, 16:48] = 1.0
    return lrs, fvs, mks


class TorchV13V15(nn.Module):
    """Mirror of CRFP_simple (v13) / CRFP (v15) with hr_dcn=True
    (/root/reference/model/CRFP.py:816-1099, 1101-1386)."""

    def __init__(self, mid=16, three_way=False):
        super().__init__()
        self.mid = mid
        self.last = mid // 8
        self.three_way = three_way
        reps = 3 if three_way else 2
        self.spynet = TorchFNet()
        self.dcn_0 = DCNModule(mid, 8, 3, 10)
        self.dcn_1 = DCNModule(mid, 8, 3, 10, pre_offset=True)
        self.dcn_2 = DCNModule(mid, 8, 3, 10, pre_offset=True)
        self.dcn_3 = DCNModule(self.last, 1, 3, 10, repeat=True, pre_offset=True,
                               interpolate="pixelshuffle")
        self.encoder_lr = LTE_lr(mid, 3)
        self.encoder_hr = LTE_lr(self.last, 6)
        self.conv_tttf = nn.Conv2d(self.last * 2, self.last, 3, 1, 1)
        self.forward_resblocks_0 = ResBlocks(mid * reps, mid)
        self.forward_resblocks_1 = ResBlocks(mid * reps, mid)
        self.forward_resblocks_2 = ResBlocks(mid * reps, mid)
        self.forward_resblocks_3 = ResBlocks(self.last * reps, self.last)
        self.downsample = PixelUnShufflePackV2(self.last, mid, 4, 3)
        self.upsample = PixelShufflePack(mid, mid, 2, 3)
        self.upsample_post = PixelShufflePack(mid, self.last, 4, 3)
        self.conv_last = nn.Conv2d(self.last, 3, 3, 1, 1)

    def forward(self, lrs, fvs, mks):
        n, t, c, h, w = lrs.size()
        up8 = lambda x: F.interpolate(x, scale_factor=8, mode="bilinear", align_corners=False)
        up2 = lambda x: F.interpolate(x, scale_factor=2, mode="bilinear", align_corners=False)
        flows = self.spynet(
            lrs[:, 1:].reshape(-1, c, h, w), lrs[:, :-1].reshape(-1, c, h, w)
        ).view(n, t - 1, 2, h, w)

        lv3_zero = lrs.new_zeros(n, self.mid, h * 2, w * 2)
        hr_zero = lrs.new_zeros(n, self.last, h * 8, w * 8)
        lrs_lv0 = lrs.view(n * t, c, h, w)
        lrs_lv3 = up8(lrs_lv0)
        x_lr = self.encoder_lr(lrs_lv0).view(n, t, self.mid, h, w)
        mksf = mks.float()
        fvs = fvs * mksf + lrs_lv3.view(n, t, c, h * 8, w * 8) * (1 - mksf)
        x_hr = self.encoder_hr(
            torch.cat((fvs.view(n * t, c, h * 8, w * 8), lrs_lv3), dim=1)
        ).view(n, t, self.last, h * 8, w * 8)

        state = None  # post-blend HR feature
        outs = []
        for i in range(t):
            mk = mks[:, i].float()
            lv0 = self.upsample(x_lr[:, i])
            extra = lambda ws: ([ws] if self.three_way else [])
            if i > 0:
                flow = flows[:, i - 1]
                flow_lv3 = up2(flow) * 2.0
                flow_lv0 = up8(flow) * 8.0
                # v13/v15 order: warp the HR state first, downsample the
                # warped result (CRFP.py:999-1002, 1283-1286)
                hrw = torch_flow_warp(state, flow_lv0.permute(0, 2, 3, 1))
                lv3w = self.downsample(hrw)
                lv3s = self.downsample(state)

                x = lv0
                off = None
                for dcn, rb in ((self.dcn_0, self.forward_resblocks_0),
                                (self.dcn_1, self.forward_resblocks_1),
                                (self.dcn_2, self.forward_resblocks_2)):
                    a, off = dcn(x, lv3s, lv3w, flow_lv3, off)
                    x = rb(torch.cat([x, a] + extra(lv3w), dim=1))
                x = F.leaky_relu(self.upsample_post(x), 0.1)
                a, _ = self.dcn_3(x, state, hrw, flow_lv0, off)
                y = self.forward_resblocks_3(torch.cat([x, a] + extra(hrw), dim=1))
            else:
                x = lv0
                for rb in (self.forward_resblocks_0, self.forward_resblocks_1,
                           self.forward_resblocks_2):
                    x = rb(torch.cat([x, lv3_zero] + extra(lv3_zero), dim=1))
                x = F.leaky_relu(self.upsample_post(x), 0.1)
                y = self.forward_resblocks_3(torch.cat([x, hr_zero] + extra(hr_zero), dim=1))

            blended = self.conv_tttf(torch.cat([y, x_hr[:, i]], dim=1))
            y = mk * blended + (1 - mk) * y
            y = F.leaky_relu(y, 0.1)
            state = y
            outs.append(self.conv_last(y) + up8(lrs[:, i]))
        return torch.stack(outs, dim=1)


class TorchLTE_hr3(nn.Module):
    # /root/reference/model/LTE.py:53-98 (islr=True path)
    def __init__(self, mid):
        super().__init__()
        def two(cin, cout):
            return nn.Sequential(nn.Conv2d(cin, cout, 3, 1, 1), nn.LeakyReLU(0.1),
                                 nn.Conv2d(cout, cout, 3, 1, 1), nn.LeakyReLU(0.1))
        self.slice1 = two(6, mid)
        self.slice2 = two(mid, mid)
        self.slice3 = two(mid, mid)
        self.conv_lv1 = nn.Conv2d(mid, mid, 3, 1, 1)
        self.conv_lv2 = nn.Conv2d(mid, mid, 3, 1, 1)
        self.conv_lv3 = nn.Conv2d(mid, mid, 3, 1, 1)

    def forward(self, x):
        lr = lambda v: F.leaky_relu(v, 0.1)
        x = self.slice1(x)
        lv3 = lr(self.conv_lv3(x))
        x = self.slice2(F.max_pool2d(x, 2, 2))
        lv2 = lr(self.conv_lv2(x))
        x = self.slice3(F.max_pool2d(x, 2, 2))
        lv1 = lr(self.conv_lv1(x))
        return lv1, lv2, lv3


class TorchBasicFVSR(nn.Module):
    """Mirror of MRCF_simple_v0 / BasicFVSR with hr_dcn=False — the
    reference's only working branch
    (/root/reference/model/CRFP_test.py:997-1154)."""

    def __init__(self, mid=16):
        super().__init__()
        self.mid = mid
        self.last = mid // 8
        self.spynet = TorchFNet()
        self.dcn_0 = DCNModule(mid, 8, 3, 10)
        self.dcn_1 = DCNModule(mid, 8, 3, 10, pre_offset=True)
        self.dcn_2 = DCNModule(mid, 8, 3, 10, pre_offset=True)
        self.dcn_3 = DCNModule(mid, 8, 3, 10, pre_offset=True)
        self.encoder_lr = LTE_lr(mid, 3)
        self.encoder_hr = TorchLTE_hr3(mid)
        self.conv_tttf = nn.Conv2d(mid * 2, mid, 3, 1, 1)
        self.forward_resblocks_0 = ResBlocks(mid * 2, mid)
        self.forward_resblocks_1 = ResBlocks(mid * 2, mid)
        self.forward_resblocks_2 = ResBlocks(mid * 2, mid)
        self.forward_resblocks_3 = ResBlocks(mid * 2, mid)
        self.downsample = PixelUnShufflePackV2(self.last, mid, 4, 3)
        self.upsample = PixelShufflePack(mid, mid, 2, 3)
        self.upsample_post = PixelShufflePack(mid, self.last, 4, 3)
        self.conv_last = nn.Conv2d(self.last, 3, 3, 1, 1)

    def forward(self, lrs, fvs, mks):
        n, t, c, h, w = lrs.size()
        up8 = lambda x: F.interpolate(x, scale_factor=8, mode="bilinear", align_corners=False)
        up2 = lambda x: F.interpolate(x, scale_factor=2, mode="bilinear", align_corners=False)
        down4 = lambda x: F.interpolate(x, scale_factor=0.25, mode="bilinear", align_corners=False)
        flows = self.spynet(
            lrs[:, 1:].reshape(-1, c, h, w), lrs[:, :-1].reshape(-1, c, h, w)
        ).view(n, t - 1, 2, h, w)

        lv3_zero = lrs.new_zeros(n, self.mid, h * 2, w * 2)
        lrs_lv0 = lrs.view(n * t, c, h, w)
        lrs_lv3 = up8(lrs_lv0)
        x_lr = self.encoder_lr(lrs_lv0).view(n, t, self.mid, h, w)
        mksf = mks.float()
        fvs = fvs * mksf + lrs_lv3.view(n, t, c, h * 8, w * 8) * (1 - mksf)
        x_hr, _, _ = self.encoder_hr(
            torch.cat((fvs.view(n * t, c, h * 8, w * 8), lrs_lv3), dim=1))
        x_hr = x_hr.view(n, t, self.mid, h * 2, w * 2)

        p0 = p1 = p2 = p3 = None
        outs = []
        for i in range(t):
            mk2 = down4(mks[:, i].float())
            lv0 = self.upsample(x_lr[:, i])
            blended = self.conv_tttf(torch.cat([lv0, x_hr[:, i]], dim=1))
            lv0 = mk2 * blended + (1 - mk2) * lv0
            if i > 0:
                flow_lv3 = up2(flows[:, i - 1]) * 2.0
                mixed = torch_flow_warp(torch.cat((p0, p1, p2, p3), 1),
                                        flow_lv3.permute(0, 2, 3, 1))
                p0w, p1w, p2w, p3w = torch.split(mixed, self.mid, dim=1)
                a, off = self.dcn_0(lv0, p0, p0w, flow_lv3)
                p0 = self.forward_resblocks_0(torch.cat([lv0, a], dim=1))
                a, off = self.dcn_1(p0, p1, p1w, flow_lv3, off)
                p1 = self.forward_resblocks_1(torch.cat([p0, a], dim=1))
                a, off = self.dcn_2(p1, p2, p2w, flow_lv3, off)
                p2 = self.forward_resblocks_2(torch.cat([p1, a], dim=1))
                a, _ = self.dcn_3(p2, p3, p3w, flow_lv3, off)
                p3 = self.forward_resblocks_3(torch.cat([p2, a], dim=1))
            else:
                p0 = self.forward_resblocks_0(torch.cat([lv0, lv3_zero], dim=1))
                p1 = self.forward_resblocks_1(torch.cat([p0, lv3_zero], dim=1))
                p2 = self.forward_resblocks_2(torch.cat([p1, lv3_zero], dim=1))
                p3 = self.forward_resblocks_3(torch.cat([p2, lv3_zero], dim=1))
            y = F.leaky_relu(self.upsample_post(p3), 0.1)
            outs.append(self.conv_last(y) + up8(lrs[:, i]))
        return torch.stack(outs, dim=1)


@pytest.mark.slow
def test_basic_fvsr_matches_torch_mirror():
    from crfp_tpu.models import CRFP, ModelConfig
    from crfp_tpu.tools.convert_torch import convert_state_dict

    tm = TorchBasicFVSR(mid=16)
    params = convert_state_dict(tm.state_dict())
    lrs, fvs, mks = _inputs()
    with torch.no_grad():
        want = tm(
            torch.from_numpy(lrs).permute(0, 1, 4, 2, 3),
            torch.from_numpy(fvs).permute(0, 1, 4, 2, 3),
            torch.from_numpy(mks).permute(0, 1, 4, 2, 3),
        ).permute(0, 1, 3, 4, 2).numpy()

    model = CRFP(ModelConfig(variant="basic_fvsr", mid_channels=16, hr_dcn=False))
    got = np.asarray(model.apply(params, lrs, fvs, mks))
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


@pytest.mark.slow
@pytest.mark.parametrize("variant,three_way", [("v13", False), ("v15", True)])
def test_v13_v15_match_torch_mirror(variant, three_way):
    from crfp_tpu.models import CRFP, ModelConfig
    from crfp_tpu.tools.convert_torch import convert_state_dict

    tm = TorchV13V15(mid=16, three_way=three_way)
    params = convert_state_dict(tm.state_dict())
    lrs, fvs, mks = _inputs()
    with torch.no_grad():
        want = tm(
            torch.from_numpy(lrs).permute(0, 1, 4, 2, 3),
            torch.from_numpy(fvs).permute(0, 1, 4, 2, 3),
            torch.from_numpy(mks).permute(0, 1, 4, 2, 3),
        ).permute(0, 1, 3, 4, 2).numpy()

    model = CRFP(ModelConfig(variant=variant, mid_channels=16))
    got = np.asarray(model.apply(params, lrs, fvs, mks))
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


@pytest.mark.slow
def test_no_dcn_matches_torch_mirror():
    from crfp_tpu.models import CRFP, ModelConfig
    from crfp_tpu.tools.convert_torch import convert_state_dict

    tm = TorchNoDCN(mid=16)
    params = convert_state_dict(tm.reference_state_dict())
    lrs, fvs, mks = _inputs()
    with torch.no_grad():
        want = tm(
            torch.from_numpy(lrs).permute(0, 1, 4, 2, 3),
            torch.from_numpy(fvs).permute(0, 1, 4, 2, 3),
            torch.from_numpy(mks).permute(0, 1, 4, 2, 3),
        ).permute(0, 1, 3, 4, 2).numpy()

    model = CRFP(ModelConfig(variant="no_dcn", mid_channels=16, hr_dcn=False))
    got = np.asarray(model.apply(params, lrs, fvs, mks))
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)

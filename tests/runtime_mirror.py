"""Torch mirror of the reference runtime benchmark model MRCF_simple_v18
(/root/reference/model/CRFP_runtime.py:8364-8664): warp_size ROI flow /
DCN cascade, per-level DSV carries at ROI/4, dropped keep-path (the
reference comments it out, :8562-8592), ROI-into-full-frame stitching
via ResidualBlocksWithInputConv_v2 (:511-556), in-place fovea corner
blend (:8638-8641). Used by tests/mint_golden.py config 5 and
tests/test_runtime_parity.py to gate crfp_tpu.models.runtime against a
line-for-line reference reimplementation under converted weights.
"""

from __future__ import annotations

import sys

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
    torch_flow_warp,
)


class ResidualBlockNoBN(nn.Module):
    def __init__(self, mid):
        super().__init__()
        self.conv1 = nn.Conv2d(mid, mid, 3, 1, 1)
        self.conv2 = nn.Conv2d(mid, mid, 3, 1, 1)

    def forward(self, x):
        return x + self.conv2(F.relu(self.conv1(x)))


class RuntimeResBlocks(nn.Module):
    """Reference runtime ResidualBlocksWithInputConv (CRFP_runtime.py:464):
    conv1 used; conv2 exists but is dead in the single-feat path."""

    def __init__(self, cin, cout):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, 1, 1)
        self.conv2 = nn.Conv2d(max(cin // 3, 1), cout, 3, 1, 1)
        self.main = nn.Sequential(nn.LeakyReLU(0.1), nn.Sequential(ResidualBlockNoBN(cout)))

    def forward(self, feat1):
        return self.main(self.conv1(feat1))


class RuntimeResBlocksV2(nn.Module):
    """Reference ResidualBlocksWithInputConv_v2 (CRFP_runtime.py:511-556)."""

    def __init__(self, cin, cout):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, 1, 1)
        self.conv2 = nn.Conv2d(cin // 2, cout, 3, 1, 1)
        self.main = nn.Sequential(nn.LeakyReLU(0.1), nn.Sequential(ResidualBlockNoBN(cout)))

    def forward(self, feat1, feat2=None):
        if torch.is_tensor(feat2) and feat2.shape[2:] != feat1.shape[2:]:
            n, c, h, w = feat1.size()
            feat = self.conv2(feat2)
            o1 = self.conv1(feat1)
            feat = feat.clone()
            feat[:, :, :h, :w] = o1
        else:
            feat = self.conv1(feat1)
        return self.main(feat)


class TorchRuntimeV18(nn.Module):
    def __init__(self, mid=16):
        super().__init__()
        self.mid = mid
        self.last = mid // 8
        self.split_ratio = 3
        keep = (mid * 3) // 4
        self.spynet = TorchFNet()
        self.dcn_0 = DCNModule(mid, 8, 3, 10)
        self.dcn_1 = DCNModule(mid, 8, 3, 10, pre_offset=True)
        self.dcn_2 = DCNModule(mid, 8, 3, 10, pre_offset=True)
        self.dcn_3 = DCNModule(self.last, 1, 3, 10, repeat=True, pre_offset=True,
                               interpolate="pixelshuffle")
        self.encoder_lr = LTE_lr(mid, 3)
        self.encoder_hr = LTE_lr(self.last, 6)
        self.conv_tttf = nn.Conv2d(self.last * 2, self.last, 3, 1, 1)
        self.forward_resblocks_0_ = RuntimeResBlocks(keep, mid)
        self.forward_resblocks_1_ = RuntimeResBlocks(keep, mid)
        self.forward_resblocks_2_ = RuntimeResBlocks(keep, mid)
        self.forward_resblocks_3_ = RuntimeResBlocks(self.last, self.last)
        self.forward_resblocks_0 = RuntimeResBlocksV2(mid * 2, mid)
        self.forward_resblocks_1 = RuntimeResBlocksV2(mid * 2, mid)
        self.forward_resblocks_2 = RuntimeResBlocksV2(mid * 2, mid)
        self.forward_resblocks_3 = RuntimeResBlocksV2(self.last * 2, self.last)
        self.downsample = PixelUnShufflePackV2(self.last, mid, 4, 3)
        self.upsample = PixelShufflePack(mid, keep, 2, 3)
        self.upsample_post = PixelShufflePack(keep, self.last, 4, 3)
        self.conv_last = nn.Conv2d(self.last, 3, 3, 1, 1)

    def forward(self, lrs, fvs, warp_size):
        wph, wpw = warp_size
        n, t, c, h, w = lrs.size()
        up2 = lambda x: F.interpolate(x, scale_factor=2, mode="bilinear", align_corners=False)
        up8 = lambda x: F.interpolate(x, scale_factor=8, mode="bilinear", align_corners=False)

        crop = lrs[:, :, :, : wph // 8, : wpw // 8]
        l1 = crop[:, :-1].reshape(-1, c, wph // 8, wpw // 8)
        l2 = crop[:, 1:].reshape(-1, c, wph // 8, wpw // 8)
        flows = self.spynet(l2, l1).view(n, t - 1, 2, wph // 8, wpw // 8)

        x_lr = self.encoder_lr(lrs.view(n * t, c, h, w)).view(n, t, self.mid, h, w)
        fvf = fvs.view(n * t, *fvs.shape[2:])
        x_hr = self.encoder_hr(torch.cat((fvf, fvf), dim=1)).view(
            n, t, self.last, fvs.shape[3], fvs.shape[4])

        sr = (self.mid * (4 - self.split_ratio)) // 4
        outs = []
        for i in range(t):
            lr_cur = lrs[:, i]
            x_hr_cur = x_hr[:, i]
            feat_prop_lv0 = self.upsample(x_lr[:, i])
            if i > 0:
                flow = flows[:, i - 1]
                flow_lv3 = up2(flow) * 2.0
                flow_lv0 = up8(flow) * 8.0
                lv3_0 = feat_prop_lv3  # HR ROI state
                lv3_0_ = torch_flow_warp(lv3_0, flow_lv0.permute(0, 2, 3, 1))
                lv3_w = self.downsample(lv3_0_)
                lv3_s = self.downsample(lv3_0)
                mixed = torch_flow_warp(torch.cat((f0, f1, f2), 1),
                                        flow_lv3.permute(0, 2, 3, 1))
                f0, f1, f2 = torch.chunk(mixed, 3, dim=1)

                roi_lv0 = feat_prop_lv0[:, :, : wph // 4, : wpw // 4]
                offset = None
                lvs = []
                for dcn, rb, f in ((self.dcn_0, self.forward_resblocks_0, f0),
                                   (self.dcn_1, self.forward_resblocks_1, f1),
                                   (self.dcn_2, self.forward_resblocks_2, f2)):
                    feat_temp = torch.cat((roi_lv0, f), dim=1)
                    a, offset = dcn(feat_temp, lv3_s, lv3_w, flow_lv3, offset)
                    x = rb(torch.cat([feat_temp, a], dim=1), feat_temp)
                    ch = torch.chunk(x, 4, dim=1)
                    lvs.append(torch.cat(ch[self.split_ratio :], dim=1))
                f0, f1, f2 = lvs

                full_lv3 = F.leaky_relu(self.upsample_post(feat_prop_lv0), 0.1)
                roi = full_lv3[:, :, :wph, :wpw]
                a, _ = self.dcn_3(roi, lv3_0, lv3_0_, flow_lv0, offset)
                feat_prop_lv3 = self.forward_resblocks_3(
                    torch.cat([roi, a], dim=1), full_lv3)
            else:
                x = feat_prop_lv0
                lvs = []
                for rb in (self.forward_resblocks_0_, self.forward_resblocks_1_,
                           self.forward_resblocks_2_):
                    full = rb(x)
                    ch = torch.chunk(full, 4, dim=1)
                    lvs.append(torch.cat(ch[self.split_ratio :], dim=1)
                               [:, :, : wph // 4, : wpw // 4])
                    x = torch.cat(ch[: self.split_ratio], dim=1)
                f0, f1, f2 = lvs
                x = F.leaky_relu(self.upsample_post(x), 0.1)
                feat_prop_lv3 = self.forward_resblocks_3_(x)

            fh, fw = x_hr_cur.shape[2:]
            blended = self.conv_tttf(
                torch.cat([feat_prop_lv3[:, :, :fh, :fw], x_hr_cur], dim=1))
            feat_prop_lv3 = feat_prop_lv3.clone()
            feat_prop_lv3[:, :, :fh, :fw] = blended
            feat_prop_lv3 = F.leaky_relu(feat_prop_lv3, 0.1)
            out = self.conv_last(feat_prop_lv3) + up8(lr_cur)
            feat_prop_lv3 = feat_prop_lv3[:, :, :wph, :wpw]
            outs.append(out)
        return torch.stack(outs, dim=1)

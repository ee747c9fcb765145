"""SPyNet end-to-end parity vs a torch mirror (pyramid, /32 padding,
border-mode warping, flow rescaling)."""

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from crfp_tpu.nn.flow import SPyNet
from crfp_tpu.tools.convert_torch import convert_state_dict

torch.manual_seed(0)


class TorchBasicModule(nn.Module):
    # /root/reference/model/CRFP.py:689-741 (conv block applies ReLU first,
    # CRFP.py:145-152)
    def __init__(self):
        super().__init__()
        chans = [(8, 32), (32, 64), (64, 32), (32, 16), (16, 2)]
        mods = []
        for cin, cout in chans:
            m = nn.Module()
            m.conv = nn.Conv2d(cin, cout, 7, 1, 3)
            mods.append(m)
        self.basic_module = nn.ModuleList(mods)

    def forward(self, x):
        for m in self.basic_module:
            x = m.conv(F.relu(x))
        return x


class TorchSPyNet(nn.Module):
    def __init__(self):
        super().__init__()
        self.basic_module = nn.ModuleList([TorchBasicModule() for _ in range(6)])
        self.register_buffer("mean", torch.Tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1))
        self.register_buffer("std", torch.Tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1))

    def _warp(self, x, flow):
        n, c, h, w = x.shape
        gy, gx = torch.meshgrid(torch.arange(h), torch.arange(w), indexing="ij")
        grid = torch.stack((gx, gy), 2).float()[None] + flow.permute(0, 2, 3, 1)
        gxn = 2.0 * grid[..., 0] / max(w - 1, 1) - 1.0
        gyn = 2.0 * grid[..., 1] / max(h - 1, 1) - 1.0
        return F.grid_sample(x, torch.stack((gxn, gyn), 3), mode="bilinear",
                             padding_mode="border", align_corners=True)

    def compute_flow(self, ref, supp):
        n, _, h, w = ref.size()
        ref = [(ref - self.mean) / self.std]
        supp = [(supp - self.mean) / self.std]
        for _ in range(5):
            ref.append(F.avg_pool2d(ref[-1], 2, 2, count_include_pad=False))
            supp.append(F.avg_pool2d(supp[-1], 2, 2, count_include_pad=False))
        ref, supp = ref[::-1], supp[::-1]
        flow = ref[0].new_zeros(n, 2, h // 32, w // 32)
        for level in range(len(ref)):
            if level == 0:
                flow_up = flow
            else:
                flow_up = F.interpolate(flow, scale_factor=2, mode="bilinear",
                                        align_corners=True) * 2.0
            warped = self._warp(supp[level], flow_up)
            flow = flow_up + self.basic_module[level](
                torch.cat([ref[level], warped, flow_up], 1)
            )
        return flow

    def forward(self, ref, supp):
        h, w = ref.shape[2:4]
        w_up = w if w % 32 == 0 else 32 * (w // 32 + 1)
        h_up = h if h % 32 == 0 else 32 * (h // 32 + 1)
        ref_r = F.interpolate(ref, size=(h_up, w_up), mode="bilinear", align_corners=False)
        supp_r = F.interpolate(supp, size=(h_up, w_up), mode="bilinear", align_corners=False)
        flow = F.interpolate(self.compute_flow(ref_r, supp_r), size=(h, w),
                             mode="bilinear", align_corners=False)
        flow[:, 0] *= float(w) / float(w_up)
        flow[:, 1] *= float(h) / float(h_up)
        return flow


def test_spynet_matches_torch_mirror():
    tm = TorchSPyNet()
    sd = {f"spynet.{k}": v for k, v in tm.state_dict().items()}
    params = {"params": convert_state_dict(sd)["params"]["spynet"]}

    rng = np.random.default_rng(0)
    # deliberately NOT /32-divisible to exercise the padding path
    ref = rng.uniform(0, 1, (1, 36, 52, 3)).astype(np.float32)
    supp = rng.uniform(0, 1, (1, 36, 52, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm(
            torch.from_numpy(ref).permute(0, 3, 1, 2),
            torch.from_numpy(supp).permute(0, 3, 1, 2),
        ).permute(0, 2, 3, 1).numpy()
    got = np.asarray(SPyNet().apply(params, ref, supp))
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)

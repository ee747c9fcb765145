"""PCD alignment numerical oracle: torch mirror of the intended EDVR
semantics (/root/reference/model/CRFP.py:372-431).

The reference's shipped PCD path concatenates the coarse offset feature
without resizing — a latent shape bug documented in crfp_tpu/nn/pcd.py —
so the mirror here implements the intended semantics our module ships:
x2 bilinear upsample + x2 scaling of the propagated offset feature
between pyramid levels. Everything else (strided pyramid convs, per-level
DCN with flow guidance, cascading refinement) mirrors the reference
line for line; the DCNv2 oracle is the grid_sample-based one from
tests/test_full_parity.py.
"""

import jax
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from crfp_tpu.nn.pcd import PCDAlign
from tests.test_full_parity import DCNModule

torch.manual_seed(1)


class TorchPCD(nn.Module):
    def __init__(self, nf, g, k, mag):
        super().__init__()
        self.fea_L2_conv1 = nn.Conv2d(nf, nf, 3, 2, 1)
        self.fea_L3_conv1 = nn.Conv2d(nf, nf, 3, 2, 1)
        self.L3_dcnpack = DCNModule(nf, g, k, mag)
        self.L2_dcnpack = DCNModule(nf, g, k, mag, pre_offset=True)
        self.L2_fea_conv = nn.Conv2d(nf * 2, nf, 3, 1, 1)
        self.L1_dcnpack = DCNModule(nf, g, k, mag, pre_offset=True)
        self.L1_fea_conv = nn.Conv2d(nf * 2, nf, 3, 1, 1)
        self.cas_dcnpack = DCNModule(nf, g, k, mag)

    def forward(self, cur, pre, ali, flow):
        lr = lambda x: F.leaky_relu(x, 0.1)
        up2 = lambda x: F.interpolate(x, scale_factor=2, mode="bilinear",
                                      align_corners=False)
        down2 = lambda x: F.interpolate(x, scale_factor=0.5, mode="bilinear",
                                        align_corners=False)
        stack = torch.cat([cur, pre, ali], dim=0)
        l2 = lr(self.fea_L2_conv1(stack))
        l3 = lr(self.fea_L3_conv1(l2))
        cur2, pre2, ali2 = l2.chunk(3, dim=0)
        cur3, pre3, ali3 = l3.chunk(3, dim=0)
        flow2 = down2(flow)
        flow3 = down2(flow2)

        l3_fea, l3_off = self.L3_dcnpack(cur3, pre3, ali3, flow3)
        l3_fea = up2(lr(l3_fea))
        l2_fea, l2_off = self.L2_dcnpack(cur2, pre2, ali2, flow2,
                                         up2(l3_off) * 2.0)
        l2_fea = up2(lr(self.L2_fea_conv(torch.cat([l2_fea, l3_fea], dim=1))))
        l1_fea, _ = self.L1_dcnpack(cur, pre, ali, flow, up2(l2_off) * 2.0)
        l1_fea = self.L1_fea_conv(torch.cat([l1_fea, l2_fea], dim=1))
        cas, _ = self.cas_dcnpack(cur, l1_fea, l1_fea, flow)
        return lr(cas)


def _k(w):  # OIHW conv weight -> HWIO
    return np.transpose(w.detach().numpy(), (2, 3, 1, 0))


def _conv(mod):
    return {"conv": {"kernel": _k(mod.weight), "bias": mod.bias.detach().numpy()}}


def _dcn_params(m: DCNModule):
    p = {
        "dcn_block_conv1": _conv(m.dcn_block[0]),
        "dcn_block_conv2": _conv(m.dcn_block[2]),
        "dcn_offset": _conv(m.dcn_offset),
        "dcn_mask": _conv(m.dcn_mask),
        "dcn_weight": _k(m.dcn.weight),
        "dcn_bias": m.dcn.bias.detach().numpy(),
    }
    if m.pre_offset_flag:
        p["conv_fuse"] = _conv(m.conv_fuse)
    return p


def test_pcd_matches_torch_mirror():
    nf, g, k, mag = 16, 2, 3, 10.0
    tm = TorchPCD(nf, g, k, mag)

    params = {"params": {
        "fea_L2_conv1": _conv(tm.fea_L2_conv1),
        "fea_L3_conv1": _conv(tm.fea_L3_conv1),
        "L3_dcnpack": _dcn_params(tm.L3_dcnpack),
        "L2_dcnpack": _dcn_params(tm.L2_dcnpack),
        "L2_fea_conv": _conv(tm.L2_fea_conv),
        "L1_dcnpack": _dcn_params(tm.L1_dcnpack),
        "L1_fea_conv": _conv(tm.L1_fea_conv),
        "cas_dcnpack": _dcn_params(tm.cas_dcnpack),
    }}

    rng = np.random.default_rng(0)
    n, h, w = 1, 24, 32
    cur = rng.standard_normal((n, h, w, nf)).astype(np.float32)
    pre = rng.standard_normal((n, h, w, nf)).astype(np.float32)
    ali = rng.standard_normal((n, h, w, nf)).astype(np.float32)
    flow = (rng.uniform(-3, 3, (n, h, w, 2))).astype(np.float32)

    def to_t(a):
        return torch.from_numpy(np.transpose(a, (0, 3, 1, 2)))

    with torch.no_grad():
        want = tm(to_t(cur), to_t(pre), to_t(ali), to_t(flow))
    want = np.transpose(want.numpy(), (0, 2, 3, 1))

    model = PCDAlign(nf=nf, groups=g, kernel=k, max_mag=mag)
    # shape-check the param tree against a fresh init before applying
    ref_tree = jax.tree.map(lambda a: a.shape,
                            model.init(jax.random.PRNGKey(0), cur, pre, ali, flow))
    got_tree = jax.tree.map(lambda a: np.asarray(a).shape, params)
    assert ref_tree == got_tree, (ref_tree, got_tree)

    got = np.asarray(model.apply(params, cur, pre, ali, flow))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)

"""BASELINE config 1: flow + backward-warp recurrent propagation eval.

The simplest end-to-end slice (BASELINE.md config 1): estimate optical
flow between consecutive LR frames (SPyNet or FNet), warp the previous
frame's 8x estimate forward by the upscaled flow, and score the warped
prediction against GT with the reference's masked PSNR/SSIM. This isolates
the flow-estimation + warping stack from the trunk; runs fine on CPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from crfp_tpu.nn.flow import FNet, SPyNet
from crfp_tpu.ops.metrics import masked_psnr, masked_ssim
from crfp_tpu.ops.resize import upsample
from crfp_tpu.ops.warp import flow_warp


def flow_warp_propagation_eval(
    lrs: np.ndarray,
    gts: np.ndarray,
    flow_net: str = "spynet",
    params=None,
    scale: int = 8,
    rng_key=None,
):
    """lrs (T,h,w,3), gts (T,8h,8w,3) in [0,1]. Returns per-frame metrics of
    warp-propagated frames (frames 1..T-1) plus the flow params used."""
    net = SPyNet() if flow_net == "spynet" else FNet()
    t, h, w, _ = lrs.shape
    lr_pairs_cur = jnp.asarray(lrs[1:])
    lr_pairs_prev = jnp.asarray(lrs[:-1])
    if params is None:
        params = net.init(rng_key or jax.random.PRNGKey(0), lr_pairs_cur[:1], lr_pairs_prev[:1])
    flows = jax.jit(net.apply)(params, lr_pairs_cur, lr_pairs_prev)  # (T-1,h,w,2)

    hr_flows = upsample(flows, scale) * float(scale)
    prev_hr = jnp.asarray(gts[:-1])
    warped = jax.jit(flow_warp)(prev_hr, hr_flows)

    metric = jax.jit(lambda a, b: (
        masked_psnr(a, b, jnp.ones_like(a[..., :1])),
        masked_ssim(a, b, jnp.ones_like(a[..., :1])),
    ))
    psnrs, ssims = [], []
    for i in range(t - 1):
        p, s = metric(warped[i : i + 1], jnp.asarray(gts[i + 1 : i + 2]))
        psnrs.append(float(p))
        ssims.append(float(s))
    return {"psnr": psnrs, "ssim": ssims, "params": params}

"""BASELINE config 1 slice: warp propagation must beat identity on a
translating scene (flow is learnable/estimable signal, warp is correct)."""

import numpy as np
import pytest

from crfp_tpu.eval.flow_warp_eval import flow_warp_propagation_eval
from crfp_tpu.ops.metrics import masked_psnr


def _translating_clip(t=3, h=16, w=24, s=8, shift=1, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(0, 1, (h * s, w * s + t * s * shift, 3)).astype(np.float32)
    # smooth the noise so bilinear warping can represent the motion well
    k = np.ones((9, 9, 1)) / 81.0
    from scipy import ndimage

    base = ndimage.convolve(base, k, mode="wrap").astype(np.float32)
    gts = np.stack([base[:, i * s * shift : i * s * shift + w * s] for i in range(t)])
    lrs = gts[:, ::s, ::s]
    return lrs, gts


@pytest.mark.parametrize("flow_net", ["spynet"])
def test_known_translation_oracle_flow(flow_net):
    # with ORACLE flow (constant translation), warp propagation must be
    # near-perfect; this validates the warp/upsample/metric plumbing
    import jax.numpy as jnp

    from crfp_tpu.ops.resize import upsample
    from crfp_tpu.ops.warp import flow_warp

    lrs, gts = _translating_clip(shift=1)
    s = 8
    flow = jnp.zeros((1, *lrs.shape[1:3], 2), jnp.float32).at[..., 0].set(1.0)
    hr_flow = upsample(flow, s) * s
    warped = flow_warp(jnp.asarray(gts[:1]), hr_flow)
    inner = np.asarray(warped)[:, :, : -s]  # border column is zero-padded
    want = gts[1:2][:, :, : -s]
    p = float(masked_psnr(inner, want, np.ones_like(inner[..., :1])))
    assert p > 35, p


def test_flow_warp_propagation_eval_runs():
    lrs, gts = _translating_clip()
    res = flow_warp_propagation_eval(lrs, gts, flow_net="spynet")
    assert len(res["psnr"]) == 2
    assert all(np.isfinite(res["psnr"]))
    assert all(0 <= v <= 1.0001 for v in res["ssim"])

"""Bit-equivalence tests for the s2d(2) lv3-trunk building blocks.

The lv3 trunk (1/4-res, C=32-72) pads 2-4x in TPU HBM tiles; running it
in space-to-depth(2) layout (C*4 on 1/4 the pixels) is the round-3 perf
lever (docs/PERF.md "Remaining levers" item 1). Every piece must be
numerically exact vs its native-grid counterpart with the SAME
parameters: ConvOutS2D (fused stride-2 out-shuffled conv),
PixelShufflePack's in_s2d path, ResidualBlocks at r=2, and the
non-repeat s2d DCNAlign (kernel operands in s2d(2)).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crfp_tpu.nn.layers import (
    Conv,
    ConvOutS2D,
    PixelShufflePack,
    ResidualBlocksWithInputConv,
)
from crfp_tpu.ops.shuffle import pixel_shuffle, pixel_unshuffle


def _rand(key, shape):
    return jax.random.uniform(key, shape, jnp.float32, -1.0, 1.0)


def test_conv_out_s2d_matches_conv_then_unshuffle():
    k0, k1 = jax.random.split(jax.random.PRNGKey(0))
    x = _rand(k0, (2, 16, 24, 12))
    native = Conv(5, name="downsample_conv")
    fused = ConvOutS2D(5, r=2, name="downsample_conv")
    params = native.init(k1, x)
    ref = pixel_unshuffle(native.apply(params, x), 2)
    got = fused.apply(params, x)
    assert got.shape == ref.shape == (2, 8, 12, 20)
    np.testing.assert_allclose(got, ref, atol=2e-6)


def test_pixelshufflepack_in_s2d_matches_native():
    k0, k1 = jax.random.split(jax.random.PRNGKey(1))
    x = _rand(k0, (2, 16, 24, 8))
    mod = PixelShufflePack(4, 4, 3)
    params = mod.init(k1, x)
    ref = mod.apply(params, x, keep_depth=True)  # (2,16,24,64): s2d(4) layout
    got = mod.apply(params, pixel_unshuffle(x, 2), keep_depth=True, in_s2d=2)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=3e-5)
    # and the full-res (keep_depth=False) path agrees too
    ref_full = mod.apply(params, x)
    got_full = mod.apply(params, pixel_unshuffle(x, 2), in_s2d=2)
    np.testing.assert_allclose(got_full, ref_full, atol=3e-5)


def test_resblocks_s2d_r2_matches_native():
    k0, k1 = jax.random.split(jax.random.PRNGKey(2))
    x = _rand(k0, (1, 16, 24, 10))
    native = ResidualBlocksWithInputConv(12, 1)
    s2d = ResidualBlocksWithInputConv(12, 1, s2d=True, s2d_r=2)
    params = native.init(k1, x)
    ref = native.apply(params, x)
    got = pixel_shuffle(s2d.apply(params, pixel_unshuffle(x, 2)), 2)
    np.testing.assert_allclose(got, ref, atol=3e-5)


@pytest.mark.parametrize("window", [4, 8])
def test_dcn_align_nonrepeat_s2d_matches_native(window):
    from crfp_tpu.nn.align import DCNAlign

    m, g = 16, 8
    k0, k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(3), 5)
    cur = _rand(k0, (1, 12, 16, m))
    pre = _rand(k1, (1, 12, 16, m))
    prew = _rand(k2, (1, 12, 16, m))
    flow = _rand(k3, (1, 12, 16, 2)) * 3.0

    native = DCNAlign(m, g, window=window)
    s2d = DCNAlign(m, g, window=window, s2d=True, s2d_r=2)
    params = native.init(k4, cur, pre, prew, flow)
    ref_a, ref_f = native.apply(params, cur, pre, prew, flow)
    u = lambda a: pixel_unshuffle(a, 2)  # noqa: E731
    got_a, got_f = s2d.apply(params, u(cur), u(pre), u(prew), u(flow))
    np.testing.assert_allclose(pixel_shuffle(got_a, 2), ref_a, atol=5e-5)
    np.testing.assert_allclose(pixel_shuffle(got_f, 2), ref_f, atol=5e-5)


@pytest.mark.parametrize("variant", ["v18", "v13", "v15"])
def test_lv3_s2d_model_equivalence(variant):
    # the full trunk with lv3_s2d must match the native-grid model under
    # the SAME parameters (batch forward incl. step0 + recurrent steps)
    from crfp_tpu.models import CRFP, ModelConfig, StreamingRunner

    rng = np.random.default_rng(7)
    b, t, h, w, s = 1, 3, 8, 12, 8
    lrs = jnp.asarray(rng.uniform(0, 1, (b, t, h, w, 3)), jnp.float32)
    fvs = jnp.asarray(rng.uniform(0, 1, (b, t, h * s, w * s, 3)), jnp.float32)
    mks = np.zeros((b, t, h * s, w * s, 1), np.float32)
    mks[:, :, 16:48, 16:48] = 1.0
    mks = jnp.asarray(mks)

    kw = dict(variant=variant, mid_channels=16, hr_s2d=True,
              dcn_window=8, dcn_window_hr=32)
    m0 = CRFP(ModelConfig(**kw))
    params = m0.init(jax.random.PRNGKey(0), lrs, fvs, mks)
    want = np.asarray(m0.apply(params, lrs, fvs, mks))

    m1 = CRFP(ModelConfig(**kw, lv3_s2d=True))
    p1_shape = jax.tree.map(lambda a: a.shape,
                            jax.eval_shape(lambda k: m1.init(k, lrs, fvs, mks),
                                           jax.random.PRNGKey(0)))
    assert p1_shape == jax.tree.map(lambda a: a.shape, params)
    got = np.asarray(m1.apply(params, lrs, fvs, mks))
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)

    if variant == "v18":
        # streaming with the s2d(2) lv-state pytree
        runner = StreamingRunner(m1, params)
        outs = [np.asarray(runner(lrs[:, i], fvs[:, i], mks[:, i]))
                for i in range(t)]
        np.testing.assert_allclose(np.stack(outs, 1), want, atol=1e-4,
                                   rtol=1e-4)


def test_dcn_align_nonrepeat_s2d_pre_offset():
    from crfp_tpu.nn.align import DCNAlign

    m, g = 16, 8
    keys = jax.random.split(jax.random.PRNGKey(4), 6)
    cur = _rand(keys[0], (1, 12, 16, m))
    pre = _rand(keys[1], (1, 12, 16, m))
    prew = _rand(keys[2], (1, 12, 16, m))
    flow = _rand(keys[3], (1, 12, 16, 2)) * 3.0
    pof = _rand(keys[4], (1, 12, 16, m))

    native = DCNAlign(m, g, window=8, pre_offset=True)
    s2d = DCNAlign(m, g, window=8, pre_offset=True, s2d=True, s2d_r=2)
    params = native.init(keys[5], cur, pre, prew, flow, pof)
    ref_a, _ = native.apply(params, cur, pre, prew, flow, pof)
    u = lambda a: pixel_unshuffle(a, 2)  # noqa: E731
    got_a, _ = s2d.apply(params, u(cur), u(pre), u(prew), u(flow), u(pof))
    np.testing.assert_allclose(pixel_shuffle(got_a, 2), ref_a, atol=5e-5)

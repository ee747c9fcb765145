"""Windowed (gather-free) DCN vs the exact gather formulation."""

import jax.numpy as jnp
import numpy as np
import pytest

from crfp_tpu.ops.dcn import deform_conv2d
from crfp_tpu.ops.dcn_windowed import deform_conv2d_windowed


@pytest.mark.parametrize("g,c,o", [(2, 8, 8), (1, 4, 4)])
def test_windowed_matches_gather_within_clamp(g, c, o):
    rng = np.random.default_rng(0)
    n, h, w = 1, 20, 28
    x = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)
    off = jnp.asarray(rng.uniform(-5, 5, (n, h, w, g, 9, 2)), jnp.float32)
    mk = jnp.asarray(rng.uniform(0, 1, (n, h, w, g, 9)), jnp.float32)
    wt = jnp.asarray(rng.standard_normal((3, 3, c, o)) * 0.2, jnp.float32)
    b = jnp.asarray(rng.standard_normal((o,)), jnp.float32)

    want = np.asarray(deform_conv2d(x, off, mk, wt, b))
    got = np.asarray(
        deform_conv2d_windowed(x, off, mk, wt, b, max_displacement=8, band=8, xtile=16)
    )
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_windowed_clamps_beyond_window():
    rng = np.random.default_rng(1)
    n, h, w, c = 1, 16, 16, 4
    x = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)
    off_far = jnp.full((n, h, w, 1, 9, 2), 50.0, jnp.float32)
    mk = jnp.ones((n, h, w, 1, 9), jnp.float32)
    wt = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.2, jnp.float32)
    # equals the exact path evaluated with offsets clamped to +-D
    want = np.asarray(deform_conv2d(x, jnp.clip(off_far, -4, 4), mk, wt, None))
    got = np.asarray(
        deform_conv2d_windowed(x, off_far, mk, wt, None, max_displacement=4, band=8, xtile=8)
    )
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)
    assert np.isfinite(got).all()


def test_windowed_bf16_tracks_f32():
    rng = np.random.default_rng(2)
    n, h, w, c = 1, 16, 24, 8
    x = rng.standard_normal((n, h, w, c)).astype(np.float32)
    off = rng.uniform(-3, 3, (n, h, w, 2, 9, 2)).astype(np.float32)
    mk = rng.uniform(0, 1, (n, h, w, 2, 9)).astype(np.float32)
    wt = (rng.standard_normal((3, 3, c, c)) * 0.2).astype(np.float32)

    f32 = np.asarray(deform_conv2d_windowed(
        jnp.asarray(x), jnp.asarray(off), jnp.asarray(mk), jnp.asarray(wt),
        None, max_displacement=4))
    bf = np.asarray(deform_conv2d_windowed(
        jnp.asarray(x, jnp.bfloat16), jnp.asarray(off, jnp.bfloat16),
        jnp.asarray(mk, jnp.bfloat16), jnp.asarray(wt, jnp.bfloat16),
        None, max_displacement=4), np.float32)
    # bf16 quantizes inputs/offsets (~1e-2 relative); outputs must track f32
    assert np.abs(bf - f32).max() < 0.15
    assert np.abs(bf - f32).mean() < 0.02


def test_dcn_window_config_reaches_both_models():
    # regression guard: cfg.dcn_window silently not reaching a model's
    # alignment stages produces IDENTICAL outputs (the fused path then
    # runs the exact op), which equivalence tests cannot catch. The
    # windowed op's lax.map lowers to `scan`; the exact batch forward has
    # exactly one scan (time) and the exact runtime step none, so extra
    # scans in the jaxpr prove the wiring.
    import jax
    from crfp_tpu.models.crfp import CRFP, ModelConfig
    from crfp_tpu.models.runtime import CRFPRuntimeV18

    h, w = 16, 24
    rng = np.random.default_rng(0)
    lr = jnp.asarray(rng.uniform(0, 1, (1, h, w, 3)), jnp.float32)
    fv = jnp.asarray(rng.uniform(0, 1, (1, h * 8, w * 8, 3)), jnp.float32)
    mk = jnp.zeros((1, h * 8, w * 8, 1), jnp.float32)

    for win, expect in ((None, False), (8, True)):
        cfg = ModelConfig(variant="v18", mid_channels=16, dcn_window=win)
        model = CRFP(cfg)
        params = jax.eval_shape(
            lambda k: model.init(k, lr[:, None], fv[:, None], mk[:, None]),
            jax.random.PRNGKey(0),
        )
        # jaxpr of the full batch forward (step0 + scanned steps)
        jaxpr = str(
            jax.make_jaxpr(
                lambda p: model.apply(
                    jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), p),
                    lr[:, None].repeat(2, 1), fv[:, None].repeat(2, 1),
                    mk[:, None].repeat(2, 1),
                )
            )(params)
        )
        assert (jaxpr.count("scan[") > 1) == expect, (win, expect, jaxpr.count("scan["))

        rt = CRFPRuntimeV18(cfg, warp_size=(64, 64))
        fvr = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)), jnp.float32)

        def run(mdl):
            x_lr, x_hr = mdl.encode(lr, fvr)
            state, _ = mdl.step0(lr, x_lr, x_hr)
            _, out = mdl.step(state, lr, lr, x_lr, x_hr)
            return out

        rparams = jax.eval_shape(lambda k: rt.init(k, method=run), jax.random.PRNGKey(0))
        jaxpr = str(
            jax.make_jaxpr(
                lambda p: rt.apply(
                    jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), p), method=run
                )
            )(rparams)
        )
        assert ("scan[" in jaxpr) == expect, ("runtime", win, expect)

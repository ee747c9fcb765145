"""Regional-computation runtime model: shapes, ROI state, full-frame output."""

import jax
import jax.numpy as jnp
import numpy as np

from crfp_tpu.models.crfp import ModelConfig
from crfp_tpu.models.runtime import CRFPRuntimeV18, ResidualBlocksWithInputConvV2


def test_v2_resblock_stitches_roi_into_full_frame():
    rb = ResidualBlocksWithInputConvV2(4, 1)
    rng = np.random.default_rng(0)
    roi = jnp.asarray(rng.standard_normal((1, 8, 8, 8)), jnp.float32)
    full = jnp.asarray(rng.standard_normal((1, 16, 16, 4)), jnp.float32)
    params = rb.init(jax.random.PRNGKey(0), roi, full)
    out = rb.apply(params, roi, full)
    assert out.shape == (1, 16, 16, 4)
    # ROI-only path matches in the ROI interior (the stitched path's
    # residual convs see full-frame neighbors within 2px of the boundary)
    out_roi = rb.apply(params, roi, None)
    np.testing.assert_allclose(
        np.asarray(out[:, :6, :6]), np.asarray(out_roi[:, :6, :6]), atol=2e-5
    )
    # outside the ROI the output comes from the full-frame conv path
    assert float(jnp.abs(out[:, 10:, 10:]).sum()) > 0


def test_runtime_step_shapes_and_state():
    cfg = ModelConfig(variant="v18", mid_channels=16)
    h, w, s = 16, 24, 8
    wp = (64, 64)
    model = CRFPRuntimeV18(cfg, warp_size=wp)
    rng = np.random.default_rng(1)
    lr = jnp.asarray(rng.uniform(0, 1, (1, h, w, 3)), jnp.float32)
    fv = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)), jnp.float32)

    def run(mdl):
        x_lr, x_hr = mdl.encode(lr, fv)
        state, out0 = mdl.step0(lr, x_lr, x_hr)
        state, out1 = mdl.step(state, lr, lr, x_lr, x_hr)
        return state, out0, out1

    params = model.init(jax.random.PRNGKey(0), method=run)
    state, out0, out1 = model.apply(params, method=run)
    assert out0.shape == (1, h * s, w * s, 3)
    assert out1.shape == (1, h * s, w * s, 3)
    # recurrent state lives at the static ROI size, not the full frame
    assert state["hr"].shape == (1, wp[0], wp[1], cfg.last_channels)
    for f in state["lv"]:
        assert f.shape == (1, wp[0] // 4, wp[1] // 4, cfg.state_channels)
    assert np.isfinite(np.asarray(out1)).all()


def test_runtime_windowed_dcn_matches_exact_for_small_flows():
    # with zero-init offset heads the displacements equal the (small) FNet
    # flow, so a generous window must reproduce the exact path
    h, w = 16, 24
    rng = np.random.default_rng(2)
    lr = jnp.asarray(rng.uniform(0, 1, (1, h, w, 3)), jnp.float32)
    fv = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)), jnp.float32)

    def run(mdl):
        x_lr, x_hr = mdl.encode(lr, fv)
        state, _ = mdl.step0(lr, x_lr, x_hr)
        _, out = mdl.step(state, lr, lr, x_lr, x_hr)
        return out

    outs = []
    for win in (None, 16):
        cfg = ModelConfig(variant="v18", mid_channels=16, dcn_window=win)
        model = CRFPRuntimeV18(cfg, warp_size=(64, 64))
        params = model.init(jax.random.PRNGKey(0), method=run)
        outs.append(np.asarray(model.apply(params, method=run)))
    np.testing.assert_allclose(outs[0], outs[1], atol=2e-5)


def test_runtime_simple_v13_v15_step_shapes_and_state():
    # the v13/v15 latency counterparts (MRCF_simple_v13/v15,
    # /root/reference/model/CRFP_runtime.py:7446, 8053): HR-only state,
    # per-level DCN over the ORIGINAL upsampled ROI, stitched resblocks
    import pytest

    from crfp_tpu.models.runtime import CRFPRuntimeSimple

    h, w, s = 16, 24, 8
    wp = (64, 64)
    rng = np.random.default_rng(2)
    lr = jnp.asarray(rng.uniform(0, 1, (1, h, w, 3)), jnp.float32)
    lr2 = jnp.asarray(rng.uniform(0, 1, (1, h, w, 3)), jnp.float32)
    fv = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)), jnp.float32)

    for variant, expect_state_ch in (("v13", 2), ("v15", 2)):
        cfg = ModelConfig(variant=variant, mid_channels=16)
        model = CRFPRuntimeSimple(cfg, warp_size=wp)

        def run(mdl):
            x_lr, x_hr = mdl.encode(lr, fv)
            state, out0 = mdl.step0(lr, x_lr, x_hr)
            state, out1 = mdl.step(state, lr2, lr, x_lr, x_hr)
            return state, (out0, out1)

        params = model.init(jax.random.PRNGKey(0), method=run)
        state, (out0, out1) = model.apply(params, method=run)
        assert out0.shape == (1, h * s, w * s, 3)
        assert out1.shape == (1, h * s, w * s, 3)
        assert state["hr"].shape == (1, wp[0], wp[1], cfg.last_channels)
        assert "lv" not in state  # no DSV channel-split state in v13/v15
        assert np.isfinite(np.asarray(out1)).all()
        # the recurrent state must actually influence the next frame
        state2, out1b = model.apply(
            params, {"hr": jnp.zeros_like(state["hr"])}, lr2, lr,
            *model.apply(params, lr2, fv, method=CRFPRuntimeSimple.encode),
            method=CRFPRuntimeSimple.step,
        )
        assert float(jnp.abs(out1b - out1).max()) > 1e-6


def test_runtime_hr_s2d_equivalence():
    # hr_s2d runtime must match the plain runtime bit-for-bit with the
    # SAME parameters (fovea 32 = 8 s2d blocks; warp 64 = 16 blocks)
    from crfp_tpu.models.runtime import CRFPRuntimeV18

    h, w = 16, 24
    wp = (64, 64)
    rng = np.random.default_rng(3)
    lr = jnp.asarray(rng.uniform(0, 1, (1, h, w, 3)), jnp.float32)
    lr2 = jnp.asarray(rng.uniform(0, 1, (1, h, w, 3)), jnp.float32)
    fv = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)), jnp.float32)

    def run(mdl):
        x_lr, x_hr = mdl.encode(lr, fv)
        state, out0 = mdl.step0(lr, x_lr, x_hr)
        state, out1 = mdl.step(state, lr2, lr, x_lr, x_hr)
        return out0, out1

    m0 = CRFPRuntimeV18(ModelConfig(variant="v18", mid_channels=16), warp_size=wp)
    params = m0.init(jax.random.PRNGKey(0), method=run)
    want0, want1 = m0.apply(params, method=run)

    m1 = CRFPRuntimeV18(
        ModelConfig(variant="v18", mid_channels=16, hr_s2d=True), warp_size=wp
    )
    got0, got1 = m1.apply(params, method=run)
    np.testing.assert_allclose(np.asarray(got0), np.asarray(want0), atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got1), np.asarray(want1), atol=2e-5, rtol=1e-4)


def test_runtime_lv3_s2d_equivalence():
    # the s2d(2) 1/4-res trunk of the ROI runtime must match the plain
    # runtime under the SAME parameters (windowed DCN in both so the
    # clamped sampling math is identical)
    from crfp_tpu.models.runtime import CRFPRuntimeV18

    h, w = 16, 24
    wp = (64, 64)
    rng = np.random.default_rng(5)
    lr = jnp.asarray(rng.uniform(0, 1, (1, h, w, 3)), jnp.float32)
    lr2 = jnp.asarray(rng.uniform(0, 1, (1, h, w, 3)), jnp.float32)
    fv = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)), jnp.float32)

    def run(mdl):
        x_lr, x_hr = mdl.encode(lr, fv)
        state, out0 = mdl.step0(lr, x_lr, x_hr)
        state, out1 = mdl.step(state, lr2, lr, x_lr, x_hr)
        state, out2 = mdl.step(state, lr, lr2, x_lr, x_hr)
        return out0, out1, out2

    kw = dict(variant="v18", mid_channels=16, hr_s2d=True,
              dcn_window=8, dcn_window_hr=32)
    m0 = CRFPRuntimeV18(ModelConfig(**kw), warp_size=wp)
    params = m0.init(jax.random.PRNGKey(0), method=run)
    wants = m0.apply(params, method=run)

    m1 = CRFPRuntimeV18(ModelConfig(**kw, lv3_s2d=True), warp_size=wp)
    p1_shape = jax.tree.map(lambda a: a.shape,
                            jax.eval_shape(lambda: m1.init(jax.random.PRNGKey(0),
                                                           method=run)))
    assert p1_shape == jax.tree.map(lambda a: a.shape, params)
    gots = m1.apply(params, method=run)
    for got, want in zip(gots, wants):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=5e-5, rtol=1e-4)


def test_runtime_emit_s2d_equivalence():
    # emit_s2d returns the s2d-layout frame; finishing it with
    # emit_frame_nhwc (pixel_shuffle off-TPU) must reproduce the native
    # hr_s2d model's frames exactly under the same parameters
    from crfp_tpu.models.runtime import CRFPRuntimeV18
    from crfp_tpu.ops.pallas.emit import emit_frame_nhwc

    h, w = 16, 24
    wp = (64, 64)
    rng = np.random.default_rng(9)
    lr = jnp.asarray(rng.uniform(0, 1, (1, h, w, 3)), jnp.float32)
    lr2 = jnp.asarray(rng.uniform(0, 1, (1, h, w, 3)), jnp.float32)
    fv = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)), jnp.float32)

    def run(mdl):
        x_lr, x_hr = mdl.encode(lr, fv)
        state, out0 = mdl.step0(lr, x_lr, x_hr)
        state, out1 = mdl.step(state, lr2, lr, x_lr, x_hr)
        return out0, out1

    kw = dict(variant="v18", mid_channels=16, hr_s2d=True,
              dcn_window=8, dcn_window_hr=32)
    m0 = CRFPRuntimeV18(ModelConfig(**kw), warp_size=wp)
    params = m0.init(jax.random.PRNGKey(0), method=run)
    wants = m0.apply(params, method=run)

    m1 = CRFPRuntimeV18(ModelConfig(**kw, emit_s2d=True), warp_size=wp)
    gots = m1.apply(params, method=run)
    for got, want in zip(gots, wants):
        np.testing.assert_allclose(
            np.asarray(emit_frame_nhwc(got)), np.asarray(want),
            atol=1e-6, rtol=1e-6)


def test_runtime_params_from_batch_covers_runtime_tree():
    """The batch->runtime adapter must produce exactly the runtime trunk's
    parameter tree (key for key, shape for shape), so a train_procedural
    checkpoint drives test_runtime.py unmodified (VERDICT r4 task 2)."""
    import flax
    import jax
    import jax.numpy as jnp

    from crfp_tpu.models.crfp import CRFP
    from crfp_tpu.models.runtime import runtime_params_from_batch

    cfg = ModelConfig(variant="v18", mid_channels=16)
    batch = CRFP(cfg)
    lr = jnp.zeros((1, 2, 16, 32, 3))
    fv = jnp.zeros((1, 2, 128, 256, 3))
    mk = jnp.zeros((1, 2, 128, 256, 1))
    bp = jax.eval_shape(batch.init, jax.random.PRNGKey(0), lr, fv, mk)

    model = CRFPRuntimeV18(cfg, warp_size=(64, 64))
    lr1 = jnp.zeros((1, 16, 32, 3))
    fv1 = jnp.zeros((1, 96, 96, 3))

    def full(mdl):
        x_lr, x_hr = mdl.encode(lr1, fv1)
        state, _ = mdl.step0(lr1, x_lr, x_hr)
        mdl.step(state, lr1, lr1, x_lr, x_hr)

    rp = jax.eval_shape(lambda k: model.init(k, method=full), jax.random.PRNGKey(0))
    want = {
        k: v.shape for k, v in flax.traverse_util.flatten_dict(rp, sep="/").items()
    }

    init_zero = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), rp)
    adapted, n_unmapped = runtime_params_from_batch(bp, init_zero)
    got = {
        k: v.shape
        for k, v in flax.traverse_util.flatten_dict(adapted, sep="/").items()
    }
    assert got == want
    # the only runtime leaves a batch checkpoint cannot supply: the four
    # cold-start input-conv kernels (smaller input arity; frame-0 only)
    # and stage 3's full-frame conv2 kernel (the full_lv3 background path
    # has a different arity than the 3-way ROI concat) — the reference's
    # non-strict merge leaves the same things untrained
    flat = flax.traverse_util.flatten_dict(adapted, sep="/")
    unmapped = sorted(
        k for k, v in flat.items()
        if not isinstance(v, jax.ShapeDtypeStruct) and np.all(np.asarray(v) == 0)
    )
    assert n_unmapped == 5, (n_unmapped, unmapped)
    assert unmapped == [
        "params/forward_resblocks_0_/input_conv/conv/kernel",
        "params/forward_resblocks_1_/input_conv/conv/kernel",
        "params/forward_resblocks_2_/input_conv/conv/kernel",
        "params/forward_resblocks_3/conv2/conv/kernel",
        "params/forward_resblocks_3_/input_conv/conv/kernel",
    ], unmapped

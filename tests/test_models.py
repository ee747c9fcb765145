"""Model trunk: shapes, batch-vs-streaming equivalence, gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crfp_tpu.models import CRFP, ModelConfig, StreamingRunner


def _inputs(b=1, t=3, h=8, w=8, s=8, seed=0):
    rng = np.random.default_rng(seed)
    lrs = rng.uniform(0, 1, (b, t, h, w, 3)).astype(np.float32)
    fvs = rng.uniform(0, 1, (b, t, h * s, w * s, 3)).astype(np.float32)
    mks = np.zeros((b, t, h * s, w * s, 1), np.float32)
    mks[:, :, 8:40, 8:40] = 1.0
    return jnp.asarray(lrs), jnp.asarray(fvs), jnp.asarray(mks)


@pytest.mark.parametrize(
    "variant", ["v13", "v15", "v18", "v18_cra", "no_dcn", "basic_fvsr"]
)
def test_forward_shapes(variant):
    hr_dcn = variant not in ("no_dcn", "basic_fvsr")
    cfg = ModelConfig(variant=variant, mid_channels=16, hr_dcn=hr_dcn)
    model = CRFP(cfg)
    lrs, fvs, mks = _inputs()
    params = model.init(jax.random.PRNGKey(0), lrs, fvs, mks)
    out = model.apply(params, lrs, fvs, mks)
    assert out.shape == (1, 3, 64, 64, 3)
    assert np.all(np.isfinite(np.asarray(out)))


# forward-math correctness of every variant is covered by the torch
# mirrors in test_variant_parity; streaming-vs-batch here exercises the
# state-threading wiring, for which three representative state layouts
# (single-state, DSV split, 4-parallel-state) suffice
@pytest.mark.parametrize("variant", ["v13", "v18", "basic_fvsr"])
def test_streaming_matches_batch(variant):
    hr_dcn = variant not in ("no_dcn", "basic_fvsr")
    cfg = ModelConfig(variant=variant, mid_channels=16, hr_dcn=hr_dcn)
    model = CRFP(cfg)
    lrs, fvs, mks = _inputs(t=3)
    params = model.init(jax.random.PRNGKey(1), lrs, fvs, mks)
    batch_out = np.asarray(model.apply(params, lrs, fvs, mks))

    runner = StreamingRunner(model, params, donate=False)
    outs = []
    for i in range(lrs.shape[1]):
        outs.append(np.asarray(runner(lrs[:, i], fvs[:, i], mks[:, i])))
    stream_out = np.stack(outs, axis=1)
    np.testing.assert_allclose(stream_out, batch_out, atol=2e-5, rtol=1e-5)


def test_clear_states_resets():
    cfg = ModelConfig(variant="v18", mid_channels=16)
    model = CRFP(cfg)
    lrs, fvs, mks = _inputs(t=2, seed=3)
    params = model.init(jax.random.PRNGKey(2), lrs, fvs, mks)
    runner = StreamingRunner(model, params, donate=False)
    a = np.asarray(runner(lrs[:, 0], fvs[:, 0], mks[:, 0]))
    runner(lrs[:, 1], fvs[:, 1], mks[:, 1])
    runner.clear_states()
    b = np.asarray(runner(lrs[:, 0], fvs[:, 0], mks[:, 0]))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_y_only_output_channels():
    cfg = ModelConfig(variant="v18", mid_channels=16, y_only=True)
    model = CRFP(cfg)
    lrs, fvs, mks = _inputs(t=2)
    params = model.init(jax.random.PRNGKey(0), lrs, fvs, mks)
    out = model.apply(params, lrs, fvs, mks)
    assert out.shape[-1] == 1


def test_gradients_flow_end_to_end():
    cfg = ModelConfig(variant="v18", mid_channels=16, remat=True)
    model = CRFP(cfg)
    lrs, fvs, mks = _inputs(t=3)
    params = model.init(jax.random.PRNGKey(0), lrs, fvs, mks)

    def loss_fn(p):
        out = model.apply(p, lrs, fvs, mks)
        return jnp.mean(jnp.sqrt((out - fvs) ** 2 + 1e-12))

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    leaves = jax.tree.leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    # the deformable alignment path must receive gradient
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    dcn_grads = [np.abs(np.asarray(v)).sum() for k, v in flat if "dcn_0" in str(k)]
    assert sum(dcn_grads) > 0


def test_hr_s2d_bit_equivalence_v18():
    # the space-to-depth HR tail (ModelConfig.hr_s2d) must be bit-exact
    # under the SAME parameters, batch and streaming
    import jax
    import jax.numpy as jnp

    from crfp_tpu.models import CRFP, ModelConfig, StreamingRunner

    rng = np.random.default_rng(0)
    b, t, h, w, s = 1, 3, 8, 12, 8
    lrs = jnp.asarray(rng.uniform(0, 1, (b, t, h, w, 3)), jnp.float32)
    fvs = jnp.asarray(rng.uniform(0, 1, (b, t, h * s, w * s, 3)), jnp.float32)
    mks = np.zeros((b, t, h * s, w * s, 1), np.float32)
    mks[:, :, 16:48, 16:48] = 1.0
    mks = jnp.asarray(mks)

    m0 = CRFP(ModelConfig(variant="v18", mid_channels=16))
    params = m0.init(jax.random.PRNGKey(0), lrs, fvs, mks)
    want = np.asarray(m0.apply(params, lrs, fvs, mks))

    m1 = CRFP(ModelConfig(variant="v18", mid_channels=16, hr_s2d=True))
    p1_shape = jax.tree.map(lambda a: a.shape,
                            jax.eval_shape(lambda k: m1.init(k, lrs, fvs, mks),
                                           jax.random.PRNGKey(0)))
    assert p1_shape == jax.tree.map(lambda a: a.shape, params)
    got = np.asarray(m1.apply(params, lrs, fvs, mks))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)

    # streaming with the s2d state pytree
    runner = StreamingRunner(m1, params)
    outs = [np.asarray(runner(lrs[:, i], fvs[:, i], mks[:, i])) for i in range(t)]
    np.testing.assert_allclose(np.stack(outs, 1), want, atol=5e-5, rtol=1e-4)

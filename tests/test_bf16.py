"""bf16 inference fast path: finite outputs, bounded divergence from f32."""

import jax
import jax.numpy as jnp
import numpy as np

from crfp_tpu.models import CRFP, ModelConfig
from crfp_tpu.utils.precision import cast_pytree


def test_bf16_forward_close_to_f32():
    cfg = ModelConfig(variant="v18", mid_channels=16)
    model = CRFP(cfg)
    rng = np.random.default_rng(0)
    lrs = jnp.asarray(rng.uniform(0, 1, (1, 2, 8, 8, 3)), jnp.float32)
    fvs = jnp.asarray(rng.uniform(0, 1, (1, 2, 64, 64, 3)), jnp.float32)
    mks = jnp.ones((1, 2, 64, 64, 1), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), lrs, fvs, mks)

    o32 = np.asarray(model.apply(params, lrs, fvs, mks))
    p16 = cast_pytree(params, jnp.bfloat16)
    o16 = np.asarray(
        model.apply(p16, lrs.astype(jnp.bfloat16), fvs.astype(jnp.bfloat16),
                    mks.astype(jnp.bfloat16)),
        np.float32,
    )
    assert np.isfinite(o16).all()
    mse = float(((o32 - o16) ** 2).mean())
    psnr = -10 * np.log10(mse)
    # bf16 divergence stays far below visual threshold (~40 dB)
    assert psnr > 40, psnr


def test_cast_pytree_leaves_ints_alone():
    tree = {"a": jnp.ones((2,), jnp.float32), "b": jnp.ones((2,), jnp.int32)}
    out = cast_pytree(tree, jnp.bfloat16)
    assert out["a"].dtype == jnp.bfloat16
    assert out["b"].dtype == jnp.int32

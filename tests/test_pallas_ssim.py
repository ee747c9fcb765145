"""Pallas fused-SSIM kernel vs the XLA formulation (interpret mode on CPU;
the same comparison runs compiled on the TPU in docs/PERF.md)."""

import jax.numpy as jnp
import numpy as np
import pytest

from crfp_tpu.ops.metrics import masked_ssim
from crfp_tpu.ops.pallas.ssim import masked_ssim_pallas, ssim_map_pallas


@pytest.mark.parametrize("shape", [(1, 40, 48, 3), (2, 33, 130, 1), (1, 128, 256, 3)])
def test_pallas_ssim_matches_xla(shape):
    rng = np.random.default_rng(0)
    sr = jnp.asarray(rng.uniform(0, 1, shape), jnp.float32)
    hr = jnp.clip(sr + 0.05 * jnp.asarray(rng.standard_normal(shape), jnp.float32), 0, 1)
    mask = jnp.asarray(rng.uniform(0, 1, (*shape[:3], 1)) > 0.3, jnp.float32)
    a = float(masked_ssim(sr, hr, mask, use_pallas=False))
    b = float(masked_ssim_pallas(sr, hr, mask, interpret=True))
    np.testing.assert_allclose(a, b, rtol=1e-5)


def test_pallas_ssim_map_identity():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0, 1, (1, 32, 64, 3)), jnp.float32)
    m = np.asarray(ssim_map_pallas(x, x, interpret=True))
    assert m.shape == (1, 32, 64, 3)
    np.testing.assert_allclose(m, np.ones_like(m), atol=1e-4)

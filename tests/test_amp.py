"""Mixed-precision training (TrainConfig.amp): bf16 compute, f32 masters.

The reference trains pure f32 (torch default); amp is the TPU-native
throughput mode. These tests pin the contract: master params / Adam
moments / loss stay f32, the loss tracks the f32 step closely, and
learning still descends, including through the windowed-DCN path.
"""

import jax
import jax.numpy as jnp
import numpy as np

from crfp_tpu.models import CRFP, ModelConfig
from crfp_tpu.train import TrainConfig, create_train_state, make_train_step
from tests.test_train import _tiny_batch


def _run_steps(cfg_model, amp, n=3, seed=0, b=2):
    model = CRFP(cfg_model)
    batch = _tiny_batch(b=b, seed=seed)
    cfg = TrainConfig(flow_freeze_iters=1, amp=amp)
    state = create_train_state(model, jax.random.PRNGKey(0), batch, cfg)
    step_fn = make_train_step(model, cfg)
    losses = []
    for _ in range(n):
        state, m = step_fn(state, batch)
        losses.append(float(m["loss"]))
    return state, losses


def test_amp_step_matches_f32_and_descends():
    cfg_model = ModelConfig(variant="v18", mid_channels=16)
    state_a, losses_a = _run_steps(cfg_model, amp=True)
    state_f, losses_f = _run_steps(cfg_model, amp=False)

    assert all(np.isfinite(losses_a)), losses_a
    # same init, same batch: the first loss must agree to bf16 rounding
    np.testing.assert_allclose(losses_a[0], losses_f[0], rtol=2e-2)
    # and optimizing the same batch must still descend
    assert losses_a[-1] < losses_a[0], losses_a

    # masters stay f32: every param and every Adam moment
    for leaf in jax.tree.leaves(state_a.params):
        assert leaf.dtype == jnp.float32, leaf.dtype
    for leaf in jax.tree.leaves(state_a.opt_state):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            assert leaf.dtype == jnp.float32, leaf.dtype


def test_amp_through_windowed_dcn():
    # the deployment alignment path: windowed DCN (XLA form on CPU; the
    # Mosaic kernel takes this same route on TPU via _windowed_dcn)
    cfg_model = ModelConfig(
        variant="v18", mid_channels=16, dcn_window=8, dcn_window_hr=32
    )
    state, losses = _run_steps(cfg_model, amp=True, b=1)
    assert all(np.isfinite(losses)), losses
    assert losses[-1] < losses[0], losses

"""End-to-end learning sanity: a short training run must substantially
improve held-out PSNR (validates loss -> grads through DCN/warp/scan ->
two-group Adam with flow freeze -> recurrent forward)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import ndimage

from crfp_tpu.data.fovea import fovea_generator
from crfp_tpu.models import CRFP, ModelConfig
from crfp_tpu.ops.metrics import masked_psnr
from crfp_tpu.train import TrainConfig, create_train_state, make_train_step

S, T, GT = 8, 3, 64


def _make_clip(seed):
    r = np.random.default_rng(seed)
    big = r.uniform(0, 1, (GT + T * 4, GT + T * 4, 3))
    big = ndimage.gaussian_filter(big, (2.5, 2.5, 0))
    big = (big - big.min()) / (big.max() - big.min() + 1e-9)
    dy, dx = int(r.integers(0, 4)), int(r.integers(0, 4))
    return np.stack(
        [big[i * dy : i * dy + GT, i * dx : i * dx + GT] for i in range(T)]
    ).astype(np.float32)


def _make_batch(seed, b=2):
    r = np.random.default_rng(seed)
    hrs, lrs, mks = [], [], []
    for i in range(b):
        hr = _make_clip(seed * 100 + i)
        _, mk, _ = fovea_generator(hr, method="Nanascan", fv_hw=(24, 24), rng=r)
        hrs.append(hr)
        lrs.append(hr.reshape(T, GT // S, S, GT // S, S, 3).mean((2, 4)))
        mks.append(mk)
    hr = jnp.asarray(np.stack(hrs))
    return {"hr": hr, "lr": jnp.asarray(np.stack(lrs)), "fv": hr,
            "mk": jnp.asarray(np.stack(mks))}


@pytest.mark.slow
def test_short_training_improves_heldout_psnr():
    model = CRFP(ModelConfig(variant="v18", mid_channels=16))
    tcfg = TrainConfig(lr_rate=4e-4, flow_freeze_iters=20)
    b0 = _make_batch(1)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               {k: v[:1] for k, v in b0.items()}, tcfg)
    step = make_train_step(model, tcfg)

    ev = _make_batch(999)
    flat = lambda x: x.reshape(-1, *x.shape[2:])
    ones = jnp.ones_like(flat(ev["hr"])[..., :1])

    def eval_psnr(params):
        sr = model.apply(params, ev["lr"], ev["fv"], ev["mk"])
        return float(masked_psnr(flat(sr), flat(ev["hr"]), ones))

    p_init = eval_psnr(state.params)
    batches = [_make_batch(i) for i in range(1, 11)]
    for it in range(60):
        state, m = step(state, batches[it % len(batches)])
    p_trained = eval_psnr(state.params)
    assert np.isfinite(float(m["loss"]))
    # 200-iteration reference run: 16.8 -> 21.6 dB (docs/PERF.md); 60 iters
    # must already recover >2 dB over the random init
    assert p_trained > p_init + 1.5, (p_init, p_trained)

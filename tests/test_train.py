"""Training subsystem: schedule parity, DP step on 8 virtual devices,
flow freeze, checkpoint resume."""

import math
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from crfp_tpu.models import CRFP, ModelConfig
from crfp_tpu.parallel import data_parallel_mesh, shard_batch
from crfp_tpu.train import (
    TrainConfig,
    charbonnier_loss,
    cosine_restart_schedule,
    create_train_state,
    make_train_step,
)
from crfp_tpu.train.checkpoint import CheckpointManager


def _reference_lr(base_lr, it, periods=(600_000,), weights=(1.0,), min_lr=1e-7):
    # /root/reference/trainer.py:609-622, 70-83
    cumulative = [sum(periods[: i + 1]) for i in range(len(periods))]
    idx = next(i for i, p in enumerate(cumulative) if it < p)
    nearest = 0 if idx == 0 else cumulative[idx - 1]
    alpha = min((it - nearest) / periods[idx], 1)
    cos_out = math.cos(math.pi * alpha) + 1
    return min_lr + 0.5 * weights[idx] * (base_lr - min_lr) * cos_out


def test_schedule_matches_reference_formula():
    sched = cosine_restart_schedule(2e-4)
    for it in [0, 1, 100, 5000, 300_000, 599_999]:
        np.testing.assert_allclose(
            float(sched(it)), _reference_lr(2e-4, it), rtol=1e-5, atol=1e-12
        )
    sched2 = cosine_restart_schedule(1e-4, periods=(100, 200), restart_weights=(1.0, 0.5))
    for it in [0, 50, 99, 100, 150, 299]:
        np.testing.assert_allclose(
            float(sched2(it)),
            _reference_lr(1e-4, it, periods=(100, 200), weights=(1.0, 0.5)),
            rtol=1e-5,
            atol=1e-12,
        )


def test_charbonnier_loss():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((2, 3, 4, 4)).astype(np.float32)
    b = rng.standard_normal((2, 3, 4, 4)).astype(np.float32)
    want = np.sqrt((a - b) ** 2 + 1e-12).mean()
    np.testing.assert_allclose(float(charbonnier_loss(a, b)), want, rtol=1e-6)
    # masked variant (mask_reduce_loss semantics)
    mk = (rng.uniform(0, 1, (2, 3, 4, 4)) > 0.5).astype(np.float32)
    want = (np.sqrt((a - b) ** 2 + 1e-12) * mk).sum() / (mk.sum() + 1e-12)
    np.testing.assert_allclose(float(charbonnier_loss(a, b, mk)), want, rtol=1e-6)


def _tiny_batch(b=8, t=2, h=8, w=8, s=8, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "lr": jnp.asarray(rng.uniform(0, 1, (b, t, h, w, 3)), jnp.float32),
        "fv": jnp.asarray(rng.uniform(0, 1, (b, t, h * s, w * s, 3)), jnp.float32),
        "hr": jnp.asarray(rng.uniform(0, 1, (b, t, h * s, w * s, 3)), jnp.float32),
        "mk": jnp.asarray(
            rng.uniform(0, 1, (b, t, h * s, w * s, 1)) > 0.5, jnp.float32
        ),
    }


def test_data_parallel_train_step_runs_and_learns():
    model = CRFP(ModelConfig(variant="v18", mid_channels=16))
    batch = _tiny_batch()
    cfg = TrainConfig(flow_freeze_iters=1)
    state = create_train_state(model, jax.random.PRNGKey(0), batch, cfg)

    mesh = data_parallel_mesh(8)
    step_fn = make_train_step(model, cfg, mesh)
    sbatch = shard_batch(batch, mesh)
    state, m1 = step_fn(state, sbatch)
    state, m2 = step_fn(state, sbatch)
    state, m3 = step_fn(state, sbatch)
    losses = [float(m["loss"]) for m in (m1, m2, m3)]
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]  # optimizing the same batch must descend
    assert int(state.step) == 3


def test_train_step_with_anchored_windows():
    # dcn_anchor is trainable in the batch trunk (anchored Mosaic VJP on
    # TPU; plain-window clamp on this CPU backend) — the round-3
    # inference-only assert is gone and gradients flow finitely
    model = CRFP(ModelConfig(variant="v18", mid_channels=16, dcn_window=8,
                             dcn_window_hr=32, hr_s2d=True, dcn_anchor=True,
                             dcn_anchor_vjp=True))
    batch = _tiny_batch(b=2)
    cfg = TrainConfig(flow_freeze_iters=1)
    state = create_train_state(model, jax.random.PRNGKey(0), batch, cfg)
    step_fn = make_train_step(model, cfg)
    state, m1 = step_fn(state, batch)
    state, m2 = step_fn(state, batch)
    assert np.isfinite(float(m1["loss"])) and np.isfinite(float(m2["loss"]))
    assert float(m2["loss"]) < float(m1["loss"])


def test_flow_freeze_blocks_spynet_updates():
    model = CRFP(ModelConfig(variant="v13", mid_channels=16))
    batch = _tiny_batch(b=2)
    cfg = TrainConfig(flow_freeze_iters=2)
    state = create_train_state(model, jax.random.PRNGKey(0), batch, cfg)
    step_fn = make_train_step(model, cfg)

    def flow_params(p):
        return jax.tree_util.tree_flatten_with_path(p)[0]

    before = {str(k): np.asarray(v) for k, v in flow_params(state.params)}
    state, _ = step_fn(state, batch)
    after1 = {str(k): np.asarray(v) for k, v in flow_params(state.params)}
    for k in before:
        if "spynet" in k:
            np.testing.assert_array_equal(before[k], after1[k])
    changed = [k for k in before if "spynet" not in k and not np.array_equal(before[k], after1[k])]
    assert changed, "trunk params must update during flow freeze"

    state, _ = step_fn(state, batch)  # step 2: freeze over (count>=2)
    state, _ = step_fn(state, batch)
    after3 = {str(k): np.asarray(v) for k, v in flow_params(state.params)}
    flow_changed = [k for k in before if "spynet" in k and not np.array_equal(after1[k], after3[k])]
    assert flow_changed, "spynet params must update after the freeze horizon"


def test_checkpoint_roundtrip():
    model = CRFP(ModelConfig(variant="v13", mid_channels=16))
    batch = _tiny_batch(b=1)
    cfg = TrainConfig()
    state = create_train_state(model, jax.random.PRNGKey(0), batch, cfg)
    step_fn = make_train_step(model, cfg)
    state, _ = step_fn(state, batch)

    with tempfile.TemporaryDirectory() as d:
        mgr = CheckpointManager(d)
        mgr.save(int(state.step), state)
        fresh = create_train_state(model, jax.random.PRNGKey(1), batch, cfg)
        restored = mgr.restore(fresh)
        assert int(restored.step) == int(state.step)
        for (ka, va), (kb, vb) in zip(
            jax.tree_util.tree_flatten_with_path(state.params)[0],
            jax.tree_util.tree_flatten_with_path(restored.params)[0],
        ):
            assert str(ka) == str(kb)
            np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))
        mgr.close()

"""Training step: Charbonnier loss, two-group Adam, flow freeze, DP sharding.

Replicates the reference recipe (/root/reference/trainer.py:120-149,
223-250; /root/reference/loss/loss.py:115-124):
- Adam(beta1 0.9, beta2 0.999, eps 1e-12), trunk lr separate from flow lr
  (param group selected by 'spynet' in the name).
- cosine-restart schedule applied per iteration to both groups.
- flow net frozen for the first 5000 iterations (no gradient, no moment
  updates), then unfrozen.
- loss: mean Charbonnier sqrt(diff^2 + 1e-12).

TPU-native data parallelism: the train step is one ``jax.jit`` whose batch
inputs carry a NamedSharding over the 'data' mesh axis while params/opt
state are replicated — XLA inserts the gradient all-reduce over ICI
(SURVEY.md §2.3). This subsumes the reference's single-process
``nn.DataParallel`` (/root/reference/main.py:37-38).
"""

from __future__ import annotations

import dataclasses
from collections.abc import Sequence
from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from crfp_tpu.models.crfp import CRFP
from crfp_tpu.train.schedule import cosine_restart_schedule


def charbonnier_loss(pred: jax.Array, target: jax.Array, weight=None, eps: float = 1e-12):
    """Masked Charbonnier (/root/reference/loss/loss.py:26-124)."""
    loss = jnp.sqrt((pred - target) ** 2 + eps)
    if weight is None:
        return loss.mean()
    weight = jnp.broadcast_to(weight.astype(loss.dtype), loss.shape)
    return (loss * weight).sum() / (weight.sum() + 1e-12)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    lr_rate: float = 2e-4
    lr_rate_flow: float = 2.5e-5
    beta1: float = 0.9
    beta2: float = 0.999
    eps: float = 1e-12
    periods: Sequence[int] = (600_000,)
    restart_weights: Sequence[float] = (1.0,)
    min_lr: float = 1e-7
    flow_freeze_iters: int = 5000
    rec_w: float = 1.0
    # mixed-precision training: forward/backward compute in bfloat16 on the
    # systolic array while master params, gradients, Adam moments and the
    # loss stay f32 (bf16's f32-sized exponent needs no loss scaling). The
    # reference trains pure f32 (torch default) — this is the TPU-native
    # throughput mode; parity runs keep amp=False.
    amp: bool = False


class TrainState(flax.struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            opt_state=new_opt_state,
        )


def _freeze_until(inner: optax.GradientTransformation, n: int) -> optax.GradientTransformation:
    """Zero updates (and no inner-state advance) until ``n`` steps elapsed.

    Matches torch semantics of requires_grad_(False): while frozen, Adam
    moments do not accumulate (/root/reference/trainer.py:223-229).
    """

    def init(params):
        return {"count": jnp.zeros((), jnp.int32), "inner": inner.init(params)}

    def update(updates, state, params=None):
        live = state["count"] >= n

        def frozen(_):
            zeros = jax.tree.map(jnp.zeros_like, updates)
            return zeros, state["inner"]

        def active(_):
            return inner.update(updates, state["inner"], params)

        new_updates, new_inner = jax.lax.cond(live, active, frozen, None)
        return new_updates, {"count": state["count"] + 1, "inner": new_inner}

    return optax.GradientTransformation(init, update)


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    def adam_with(base_lr):
        return optax.chain(
            optax.scale_by_adam(b1=cfg.beta1, b2=cfg.beta2, eps=cfg.eps),
            optax.scale_by_schedule(
                cosine_restart_schedule(base_lr, cfg.periods, cfg.restart_weights, cfg.min_lr)
            ),
            optax.scale(-1.0),
        )

    flow_opt = adam_with(cfg.lr_rate_flow)
    if cfg.flow_freeze_iters > 0:
        flow_opt = _freeze_until(flow_opt, cfg.flow_freeze_iters)

    def label_fn(params):
        def label(path, _):
            return "flow" if any("spynet" in str(p) for p in path) else "trunk"

        return jax.tree_util.tree_map_with_path(label, params)

    return optax.multi_transform({"trunk": adam_with(cfg.lr_rate), "flow": flow_opt}, label_fn)


def create_train_state(model: CRFP, rng, sample_batch, cfg: TrainConfig) -> TrainState:
    params = model.init(rng, sample_batch["lr"], sample_batch["fv"], sample_batch["mk"])
    tx = make_optimizer(cfg)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params), tx=tx)


def make_train_step(model: CRFP, cfg: TrainConfig, mesh: jax.sharding.Mesh | None = None):
    """Returns a jitted ``train_step(state, batch) -> (state, metrics)``.

    batch: dict with 'lr' (B,T,h,w,3), 'fv'/'hr' (B,T,8h,8w,3),
    'mk' (B,T,8h,8w,1); B is sharded over the 'data' mesh axis when a mesh
    is given.
    """

    def loss_fn(params, batch):
        if cfg.amp:
            from crfp_tpu.utils.precision import cast_pytree

            # differentiable casts: grads come back f32 for the f32 masters
            p = cast_pytree(params, jnp.bfloat16)
            sr = model.apply(
                p,
                batch["lr"].astype(jnp.bfloat16),
                batch["fv"].astype(jnp.bfloat16),
                batch["mk"].astype(jnp.bfloat16),
            ).astype(jnp.float32)
        else:
            sr = model.apply(params, batch["lr"], batch["fv"], batch["mk"])
        return cfg.rec_w * charbonnier_loss(sr, batch["hr"]), sr

    def train_step(state: TrainState, batch):
        (loss, sr), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params, batch)
        new_state = state.apply_gradients(grads)
        metrics = {"loss": loss}
        # per-iteration train PSNR/SSIM in RGB and Y, full-ones mask
        # (/root/reference/trainer.py:253-268)
        from crfp_tpu.ops.color import bgr2ycbcr_y
        from crfp_tpu.ops.metrics import masked_psnr, masked_ssim

        sr_f = jax.lax.stop_gradient(sr).reshape(-1, *sr.shape[2:])
        hr_f = batch["hr"].reshape(-1, *sr.shape[2:])
        ones = jnp.ones_like(sr_f[..., :1])
        metrics["psnr"] = masked_psnr(sr_f, hr_f, ones)
        metrics["ssim"] = masked_ssim(sr_f, hr_f, ones)
        sy, hy = bgr2ycbcr_y(sr_f) / 255.0, bgr2ycbcr_y(hr_f) / 255.0
        metrics["psnr_y"] = masked_psnr(sy, hy, ones)
        metrics["ssim_y"] = masked_ssim(sy, hy, ones)
        return new_state, metrics

    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0,))

    from jax.sharding import NamedSharding, PartitionSpec as P

    batch_sharded = NamedSharding(mesh, P("data"))
    return jax.jit(
        train_step,
        in_shardings=(None, {k: batch_sharded for k in ("lr", "fv", "hr", "mk")}),
        donate_argnums=(0,),
    )

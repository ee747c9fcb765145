"""Driver: train / eval / test dispatch (reference main.py parity).

Mirrors /root/reference/main.py:19-68 with the TPU-native stack: mesh
data parallelism replaces nn.DataParallel, orbax checkpoints replace
torch.save, and checkpoint evaluation accepts both our orbax dirs and
reference ``.pt`` files (via the converter).
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from crfp_tpu.config import model_config, parse_args, train_config
from crfp_tpu.data.loader import get_dataloader
from crfp_tpu.eval.evaluator import evaluate_clips
from crfp_tpu.models import CRFP
from crfp_tpu.parallel import data_parallel_mesh, shard_batch
from crfp_tpu.train import TrainConfig, create_train_state, make_train_step
from crfp_tpu.train.checkpoint import CheckpointManager
from crfp_tpu.utils import MetricsWriter, mk_exp_dir


def _load_params(model, path: str, sample_batch):
    """Load model params from any supported format: flat .npz
    (train_procedural artifacts), torch .pt/.pth (converted), or an orbax
    checkpoint dir (crfp_tpu/utils/params_io.py)."""
    from crfp_tpu.utils.params_io import load_params

    del model, sample_batch  # structure comes from the checkpoint itself
    return load_params(path)


def _sample_from_batch(batch):
    return {
        "lr": jnp.asarray(batch["LR"][:1]),
        "fv": jnp.asarray(batch["Ref"][:1]),
        "mk": jnp.asarray(batch["Ref_sp"][:1]),
    }


def train(args, logger):
    cfg = model_config(args)
    tcfg = train_config(args)
    model = CRFP(cfg)
    loaders = get_dataloader(args)
    metrics = MetricsWriter(os.path.join(args.save_dir, "metrics.jsonl"))

    mesh = data_parallel_mesh(args.num_gpu) if args.num_gpu > 1 else None
    step_fn = make_train_step(model, tcfg, mesh)
    ckpt = CheckpointManager(os.path.join(args.save_dir, "model"))
    viz = None
    if args.viz_every > 0:
        from crfp_tpu.train.viz import TrainViz

        viz = TrainViz(model, args.save_dir, every=args.viz_every)

    state = None
    cur_iter = 0
    t0 = time.time()
    for epoch in range(args.num_epochs):
        for batch in loaders["train"]:
            hr = jnp.asarray(batch["HR"])
            jbatch = {
                "lr": jnp.asarray(batch["LR"]),
                # fvs enters the model only as fvs*mk, so the raw HR is an
                # exact substitute for the pre-multiplied fovea image
                "fv": jnp.asarray(batch["Ref"]) if "Ref" in batch else hr,
                "hr": hr,
                "mk": jnp.asarray(batch["Ref_sp"]),
            }
            if state is None:
                sample = {k: v[:1] for k, v in jbatch.items()}
                state = create_train_state(model, jax.random.PRNGKey(0), sample, tcfg)
                if args.model_path:
                    loaded = _load_params(model, args.model_path, sample)
                    state = state.replace(params=loaded)
                    logger.info(f"loaded initial params from {args.model_path}")
            if mesh is not None:
                jbatch = shard_batch(jbatch, mesh)
            state, m = step_fn(state, jbatch)
            cur_iter += 1
            if cur_iter % args.print_every == 0:
                scalars = {k: float(v) for k, v in m.items()}
                logger.info(
                    f"epoch {epoch} iter {cur_iter} loss {scalars['loss']:.5f} "
                    f"psnr {scalars.get('psnr', 0):.2f} ssim {scalars.get('ssim', 0):.4f} "
                    f"({(time.time() - t0) / cur_iter:.2f} s/iter)"
                )
                metrics.write("train", cur_iter, **scalars)
            if cur_iter % args.save_every == 0:
                ckpt.save(cur_iter, state)
                logger.info(f"saved checkpoint @ iter {cur_iter}")
            if viz is not None and viz.update(cur_iter, state.params, jbatch):
                logger.info(f"viz frames dumped @ iter {cur_iter} -> "
                            f"{os.path.join(args.save_dir, 'viz')}")
        if (epoch + 1) % args.val_every == 0:
            res = evaluate_clips(model, state.params, loaders["eval"], args.y_only, logger.info)
            logger.info(f"eval epoch {epoch}: {res}")
            metrics.write("eval", cur_iter, psnr=res.psnr, ssim=res.ssim,
                          psnr_y=res.psnr_y, ssim_y=res.ssim_y)
    if state is not None:
        ckpt.save(max(cur_iter, 1), state)
    metrics.close()


def evaluate(args, logger):
    cfg = model_config(args)
    model = CRFP(cfg)
    loaders = get_dataloader(args)
    first = next(iter(loaders["eval"]))
    sample = _sample_from_batch(first)

    paths = []
    if args.model_path and os.path.isdir(args.model_path):
        for name in sorted(os.listdir(args.model_path)):
            paths.append(os.path.join(args.model_path, name))
    elif args.model_path:
        paths.append(args.model_path)
    else:
        raise SystemExit("--model_path is required in eval mode")

    best = {"psnr": 0.0, "ssim": 0.0, "psnr_y": 0.0, "ssim_y": 0.0}
    for p in paths:
        params = _load_params(model, p, sample)
        save_dir = (
            os.path.join(args.save_dir, "results", os.path.basename(p))
            if args.eval_save_results else None
        )
        res = evaluate_clips(model, params, loaders["eval"], args.y_only, logger.info, save_dir)
        logger.info(f"{os.path.basename(p)}: {res}")
        for k in best:
            best[k] = max(best[k], getattr(res, k))
    logger.info(
        "Ref  PSNR (max): %.3f \t SSIM (max): %.4f \t PSNR_Y (max): %.3f \t SSIM_Y (max): %.4f"
        % (best["psnr"], best["ssim"], best["psnr_y"], best["ssim_y"])
    )


def test(args, logger):
    cfg = model_config(args)
    model = CRFP(cfg)
    loaders = get_dataloader(args)
    first = next(iter(loaders["test"]))
    sample = _sample_from_batch(first)
    if not args.model_path:
        raise SystemExit("--model_path is required in test mode")
    params = _load_params(model, args.model_path, sample)
    save_dir = os.path.join(args.save_dir, "results") if args.eval_save_results else None
    res = evaluate_clips(model, params, loaders["test"], args.y_only, logger.info, save_dir)
    logger.info(f"test: {res}")


def main():
    args = parse_args()
    if args.cpu:
        # must land before any backend touch; the axon sitecustomize pins
        # jax_platforms, so the env var alone is not enough
        jax.config.update("jax_platforms", "cpu")
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)
    logger = mk_exp_dir(args)
    logger.info(f"devices: {jax.devices()}")
    if args.test:
        test(args, logger)
    elif args.eval:
        evaluate(args, logger)
    else:
        train(args, logger)


if __name__ == "__main__":
    main()

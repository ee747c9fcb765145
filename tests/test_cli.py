"""CLI end-to-end: train a few iterations on a synthetic REDS tree, then
eval the saved checkpoint through main.py's code paths."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.test_data import _make_fake_reds  # noqa: E402


def _argv(tmp, extra):
    return [
        "--save_dir", os.path.join(tmp, "exp"),
        "--reset", "true",
        "--dataset", "Reds",
        "--dataset_dir", os.path.join(tmp, "REDS_sharp"),
        "--variant", "v18",
        "--mid_channels", "16",
        "--scale", "8",
        "--GT_size", "64",
        "--FV_size", "16",
        "--N_frames", "2",
        "--batch_size", "2",
        "--num_workers", "2",
        "--num_gpu", "1",
        "--lr_rate", "1e-3",
        "--flow_freeze_iters", "0",
        "--print_every", "2",
        "--save_every", "4",
        "--num_epochs", "1",
        "--val_every", "999999",
    ] + extra


@pytest.mark.slow
def test_main_train_then_eval(tmp_path):
    import main as cli
    from crfp_tpu.config import parse_args
    from crfp_tpu.utils import mk_exp_dir

    tmp = str(tmp_path)
    _make_fake_reds(tmp, n_frames=3, gt_hw=(96, 128))

    args = parse_args(_argv(tmp, ["--viz_every", "2"]))
    logger = mk_exp_dir(args)
    cli.train(args, logger)

    model_dir = os.path.join(tmp, "exp", "model")
    steps = [d for d in os.listdir(model_dir) if d.isdigit()]
    assert steps, os.listdir(model_dir)
    assert os.path.exists(os.path.join(tmp, "exp", "args.txt"))
    assert os.path.exists(os.path.join(tmp, "exp", "metrics.jsonl"))
    # visual dashboard (train/viz.py wired through --viz_every)
    assert os.path.exists(os.path.join(tmp, "exp", "dashboard.html"))
    assert os.path.exists(os.path.join(tmp, "exp", "viz", "latest_sr.png"))

    # eval mode over the checkpoint directory
    args2 = parse_args(
        _argv(tmp, ["--eval", "true", "--model_path", model_dir])
        + ["--save_dir", os.path.join(tmp, "exp_eval")]
    )
    logger2 = mk_exp_dir(args2)
    cli.evaluate(args2, logger2)
    log_text = open(os.path.join(tmp, "exp_eval", "MRCF.log")).read()
    assert "PSNR (max)" in log_text


def test_mk_exp_dir_refuses_overwrite(tmp_path):
    from crfp_tpu.config import parse_args
    from crfp_tpu.utils import mk_exp_dir

    d = str(tmp_path / "exp")
    args = parse_args(["--save_dir", d, "--reset", "false"])
    mk_exp_dir(args)
    with pytest.raises(SystemExit, match="already exists"):
        mk_exp_dir(args)


@pytest.mark.slow
def test_main_procedural_train_and_npz_eval(tmp_path):
    """--dataset procedural end-to-end (no REDS in the container) and the
    shared checkpoint loader: an .npz artifact (train_procedural's format)
    drives main.py's eval-every-checkpoint unmodified (VERDICT r4 task 2)."""
    import jax
    import jax.numpy as jnp

    import main as cli
    from crfp_tpu.config import model_config, parse_args
    from crfp_tpu.models import CRFP
    from crfp_tpu.utils import mk_exp_dir
    from crfp_tpu.utils.params_io import save_params_npz

    tmp = str(tmp_path)
    argv = [
        "--save_dir", os.path.join(tmp, "exp"),
        "--reset", "true",
        "--dataset", "procedural",
        "--procedural_clips", "2",
        "--variant", "v18",
        "--mid_channels", "16",
        "--scale", "8",
        "--GT_size", "64",
        "--FV_size", "16",
        "--N_frames", "2",
        "--batch_size", "2",
        "--num_workers", "2",
        "--num_gpu", "1",
        "--flow_freeze_iters", "0",
        "--print_every", "1",
        "--save_every", "1",
        "--num_epochs", "1",
        "--val_every", "999999",
    ]
    args = parse_args(argv)
    logger = mk_exp_dir(args)
    cli.train(args, logger)
    model_dir = os.path.join(tmp, "exp", "model")
    assert [d for d in os.listdir(model_dir) if d.isdigit()]

    # mint an .npz the way train_procedural does and eval a DIRECTORY of them
    model = CRFP(model_config(args))
    lr = jnp.zeros((1, 2, 8, 8, 3))
    fv = jnp.zeros((1, 2, 64, 64, 3))
    mk = jnp.zeros((1, 2, 64, 64, 1))
    params = model.init(jax.random.PRNGKey(0), lr, fv, mk)
    ckpt_dir = os.path.join(tmp, "ckpts")
    os.makedirs(ckpt_dir)
    save_params_npz(params, os.path.join(ckpt_dir, "m.npz"))

    args2 = parse_args(
        argv + ["--eval", "true", "--model_path", ckpt_dir,
                "--save_dir", os.path.join(tmp, "exp_eval")]
    )
    logger2 = mk_exp_dir(args2)
    cli.evaluate(args2, logger2)
    log_text = open(os.path.join(tmp, "exp_eval", "MRCF.log")).read()
    assert "PSNR (max)" in log_text

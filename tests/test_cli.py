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

"""Training visual dashboard (crfp_tpu/train/viz.py): the visdom-window
replacement must dump the full PNG set + the HTML viewer, honor its
cadence, and keep a time-lapse copy per dump."""

import json
import os

import jax
import numpy as np
import pytest

from crfp_tpu.models.crfp import CRFP, ModelConfig
from crfp_tpu.train.viz import TrainViz

pytestmark = pytest.mark.fast


def test_trainviz_dumps_frames_and_dashboard(tmp_path):
    model = CRFP(ModelConfig(variant="v18", mid_channels=8))
    b, t, h, w, s = 1, 2, 8, 8, 8
    rng = np.random.default_rng(0)
    batch = {
        "lr": rng.uniform(0, 1, (b, t, h, w, 3)).astype(np.float32),
        "fv": rng.uniform(0, 1, (b, t, h * s, w * s, 3)).astype(np.float32),
        "hr": rng.uniform(0, 1, (b, t, h * s, w * s, 3)).astype(np.float32),
        "mk": (rng.uniform(0, 1, (b, t, h * s, w * s, 1)) > 0.5).astype(np.float32),
    }
    params = model.init(jax.random.PRNGKey(0), batch["lr"], batch["fv"], batch["mk"])

    viz = TrainViz(model, str(tmp_path), every=2)
    assert not viz.update(1, params, batch)   # off-cadence: no-op
    assert viz.update(2, params, batch)

    d = tmp_path / "viz"
    for n in ("sr", "gt", "fv", "absdiff", "psnr_map", "ssim_map",
              "ssim_map_discrete"):
        p = d / f"latest_{n}.png"
        assert p.exists() and p.stat().st_size > 0, n
    assert (d / "sr_iter0000002.png").exists()  # time-lapse copy
    html = (tmp_path / "dashboard.html").read_text()
    assert "metrics.jsonl" in html and "latest_" in html

    from PIL import Image

    im = np.asarray(Image.open(d / "latest_sr.png"))
    assert im.shape == (h * s, w * s, 3) and im.dtype == np.uint8

    # discretized ssim map only contains the reference's 0.1-step bands
    sd = np.unique(np.asarray(Image.open(d / "latest_ssim_map_discrete.png")))
    bands = {int(v * 255 + 0.5) for v in (0.1, 0.2, 0.3, 0.4, 0.5,
                                          0.6, 0.7, 0.8, 0.9, 1.0)}
    assert set(sd.tolist()) <= bands, sd


def test_trainviz_cli_flag_parses():
    from crfp_tpu.config import parse_args

    args = parse_args(["--viz_every", "250"])
    assert args.viz_every == 250

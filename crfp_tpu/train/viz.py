"""Training visual dashboard: periodic image dumps + a static HTML viewer.

Replaces the reference's visdom dashboard (Visdom_exe,
/root/reference/trainer.py:85-105 metric line windows; :675-695 image
windows: the fovea input and the foveated patch-PSNR/SSIM heat-maps with
their 0.1-step discretization) with a zero-dependency local equivalent:

- every ``every`` iterations, run one forward on the first train sample
  and write PNGs under ``save_dir/viz/`` (visdom-window style: the
  ``latest_*`` set is overwritten in place; an iteration-stamped copy of
  the SR frame is kept for the training time-lapse);
- ``dashboard.html`` (written once) renders the metric curves straight
  from the run's ``metrics.jsonl`` on a <canvas> and auto-refreshes the
  images — open it in any browser over a file server, no visdom daemon,
  no open port, no external service.

PNG writing uses PIL (already a data-pipeline dependency). Heat-maps use
the reference's normalization (psnr/100, (ssim-0.7)/0.3) and its
ssim discretization, rendered as grayscale like the visdom image calls.
"""

from __future__ import annotations

import os
import shutil
from typing import Any

import numpy as np

_HTML = os.path.join(os.path.dirname(__file__), "dashboard.html")


def _to_png(arr: np.ndarray, path: str) -> None:
    """arr: (H, W, 3) or (H, W) float in [0, 1]."""
    from PIL import Image

    a = np.clip(np.asarray(arr, np.float32), 0.0, 1.0)
    Image.fromarray((a * 255.0 + 0.5).astype(np.uint8)).save(path)


def _discretize(x: np.ndarray) -> np.ndarray:
    """The reference's 0.1-step SSIM banding (trainer.py:668-683)."""
    out = np.ones_like(x)
    for t in (0.9, 0.8, 0.7, 0.6, 0.5, 0.4, 0.3, 0.2, 0.1):
        out = np.where(x <= t, t, out)
    return out


class TrainViz:
    """Periodic eval-frame dump during training.

    ``update(it, params, batch)`` is a no-op except every ``every``-th
    call, so the train loop can call it unconditionally. The forward runs
    on sample 0 of the incoming batch (its own jitted program — the train
    step's donated state is untouched).
    """

    def __init__(self, model: Any, save_dir: str, every: int = 500):
        import jax

        self.every = int(every)
        self.dir = os.path.join(save_dir, "viz")
        os.makedirs(self.dir, exist_ok=True)
        shutil.copyfile(_HTML, os.path.join(save_dir, "dashboard.html"))
        self._fwd = jax.jit(
            lambda p, lr, fv, mk: model.apply(p, lr, fv, mk))

    def update(self, it: int, params: Any, batch: dict[str, Any]) -> bool:
        if self.every <= 0 or it % self.every != 0:
            return False
        from crfp_tpu.eval.foveated import foveated_metric

        sr = np.asarray(
            self._fwd(params, batch["lr"][:1], batch["fv"][:1], batch["mk"][:1])
        ).astype(np.float32)
        sr_t = np.clip(sr[0, -1], 0, 1)
        gt_t = np.asarray(batch["hr"][0, -1], np.float32)
        fv_t = np.asarray(batch["fv"][0, -1] * batch["mk"][0, -1], np.float32)

        pm, sm, _, _ = foveated_metric(sr_t, gt_t)
        pm, sm = np.asarray(pm), np.asarray(sm)
        d = self.dir
        _to_png(sr_t, os.path.join(d, "latest_sr.png"))
        _to_png(gt_t, os.path.join(d, "latest_gt.png"))
        _to_png(fv_t, os.path.join(d, "latest_fv.png"))
        _to_png(np.abs(sr_t - gt_t).mean(-1) * 4.0,
                os.path.join(d, "latest_absdiff.png"))
        _to_png(pm, os.path.join(d, "latest_psnr_map.png"))
        _to_png(np.clip(sm, 0, 1), os.path.join(d, "latest_ssim_map.png"))
        # the discretization applies to the RAW ssim (foveated_metric
        # returns it normalized as (ssim-0.7)/0.3)
        _to_png(_discretize(np.clip(sm * 0.3 + 0.7, 0.0, 1.0)),
                os.path.join(d, "latest_ssim_map_discrete.png"))
        _to_png(sr_t, os.path.join(d, f"sr_iter{it:07d}.png"))
        return True

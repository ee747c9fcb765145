"""Checkpoint evaluation over eval/test loaders (trainer.eval_basicvsr parity).

Replicates /root/reference/trainer.py:295-413: per-frame masked PSNR/SSIM in
RGB and the (mis-ordered-coefficient) Y domain with a full-ones mask,
skipping frame 0 of every 50th window (clip-boundary reset rule,
trainer.py:349-351), averaged over all frames; y_only reconstruction pairs
the model Y with bicubic-upsampled UV (trainer.py:330-334).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from crfp_tpu.ops.color import bgr2ycbcr_y, rgb2yuv, yuv2rgb
from crfp_tpu.ops.metrics import masked_psnr, masked_ssim


@dataclasses.dataclass
class EvalResult:
    psnr: float
    ssim: float
    psnr_y: float
    ssim_y: float
    n_frames: int

    def __str__(self):
        return (
            f"PSNR {self.psnr:.3f}  SSIM {self.ssim:.4f}  "
            f"PSNR_Y {self.psnr_y:.3f}  SSIM_Y {self.ssim_y:.4f}  ({self.n_frames} frames)"
        )


def _frame_metrics(sr, hr):
    """Per-frame RGB and Y metrics with a ones mask. sr/hr: (T, H, W, 3) in [0,1]."""
    ones = jnp.ones_like(sr[..., :1])

    def one(s, h):
        m = ones[0][None]
        s, h = s[None], h[None]
        p = masked_psnr(s, h, m)
        ss = masked_ssim(s, h, m)
        # Y-domain values are ~[16, 235]; the reference's range heuristic
        # divides by 255 (utils.py:242-254)
        sy = bgr2ycbcr_y(s) / 255.0
        hy = bgr2ycbcr_y(h) / 255.0
        py = masked_psnr(sy, hy, m)
        ssy = masked_ssim(sy, hy, m)
        return p, ss, py, ssy

    return jax.vmap(one)(sr, hr)


_frame_metrics_jit = jax.jit(_frame_metrics)


def evaluate_clips(
    model, params, loader, y_only: bool = False, log=None, save_dir: str | None = None
) -> EvalResult:
    """save_dir: when set, SR frames are written as PNGs
    (--eval_save_results / trainer.test_basicvsr parity,
    /root/reference/trainer.py:415-560)."""
    apply = jax.jit(lambda p, lr, fv, mk: model.apply(p, lr, fv, mk))
    ps, ss, pys, ssys = [], [], [], []
    if save_dir is not None:
        import os

        os.makedirs(save_dir, exist_ok=True)
    for i_batch, batch in enumerate(loader):
        lr = jnp.asarray(batch["LR"])
        fv = jnp.asarray(batch["Ref"])
        mk = jnp.asarray(batch["Ref_sp"])
        hr = jnp.asarray(batch["HR"])
        sr = apply(params, lr, fv, mk)
        if y_only:
            lrsr = jnp.asarray(batch["LR_sr"])
            yuv = rgb2yuv(lrsr.reshape(-1, *lrsr.shape[2:]))
            sr_flat = sr.reshape(-1, *sr.shape[2:])
            sr = yuv2rgb(jnp.concatenate([sr_flat[..., :1], yuv[..., 1:]], axis=-1))
            sr = sr.reshape(hr.shape)
        b, t = sr.shape[:2]
        if save_dir is not None:
            import os

            import PIL.Image

            arr = np.asarray(jnp.clip(sr, 0, 1) * 255).round().astype(np.uint8)
            for bi in range(b):
                for ti in range(t):
                    PIL.Image.fromarray(arr[bi, ti]).save(
                        os.path.join(save_dir, f"sr_{i_batch:05d}_{bi}_{ti:02d}.png")
                    )
        p, s, py, sy = _frame_metrics_jit(sr.reshape(b * t, *sr.shape[2:]),
                                          hr.reshape(b * t, *hr.shape[2:]))
        p, s, py, sy = (np.asarray(x) for x in (p, s, py, sy))
        start = 1 if i_batch % 50 == 0 else 0
        ps.extend(p[start:])
        ss.extend(s[start:])
        pys.extend(py[start:])
        ssys.extend(sy[start:])
        if log is not None and i_batch % 50 == 0:
            log(f"eval[{i_batch}] PSNR {np.mean(ps):.3f} SSIM {np.mean(ss):.4f}")
    return EvalResult(
        float(np.mean(ps)), float(np.mean(ss)), float(np.mean(pys)), float(np.mean(ssys)),
        len(ps),
    )

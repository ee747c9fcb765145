"""Windowed-clamp quality cost under TRAINED weights and a LEARNED flow.

Closes the round-2 caveat that the windowed-vs-exact table used
random-init weights with ground-truth flows (docs/PERF.md): here the
checkpoint from ``crfp_tpu.tools.train_procedural`` streams held-out
translating clips using its OWN FNet flow estimate (the reference
protocol, /root/reference/model/CRFP_test.py:1919-1935), in exact-gather
mode vs windowed-kernel mode, and reports

- exact-vs-windowed output PSNR (the clamp's cost with learned flows,
  which overshoot and jitter unlike ground truth), and
- each path's PSNR vs ground truth (does the clamp cost *quality*, not
  just agreement).

Run:  python -m crfp_tpu.bench.quality_trained \
          --ckpt checkpoints/v18_mid32_procedural.npz --mid 32
"""

from __future__ import annotations

import argparse
import dataclasses

import numpy as np


@dataclasses.dataclass
class TrainedQualityRow:
    v_px: float
    window: int
    agree_db: float   # exact vs windowed
    exact_db: float   # exact vs GT
    win_db: float     # windowed vs GT


def run_trained_quality(
    ckpt: str,
    velocities=(0.5, 1.0, 2.0, 3.0, 4.0, 6.0),
    windows=(8,),
    lr_hw=(24, 40),
    frames: int = 6,
    mid_channels: int = 32,
    seed: int = 7,
) -> list[TrainedQualityRow]:
    import jax
    import jax.numpy as jnp

    from crfp_tpu.bench.quality_window import _texture
    from crfp_tpu.models.crfp import CRFP, ModelConfig
    from crfp_tpu.tools.train_procedural import load_params

    params = load_params(ckpt)
    h, w = lr_hw
    s = 8
    rng = np.random.default_rng(seed)
    margin = int(max(velocities) * frames * s) + 8
    tex_hr = _texture(rng, h * s + margin, w * s + margin)

    fv0 = jnp.zeros((1, h * s, w * s, 3), jnp.float32)
    mk0 = jnp.zeros((1, h * s, w * s, 1), jnp.float32)

    def clip(v):
        """HR frames translating by v LR px/frame (= v*s HR px/frame)."""
        hrs = []
        for i in range(frames):
            o = int(round(v * s * i))
            hrs.append(tex_hr[o : o + h * s, o : o + w * s])
        hr = np.stack(hrs)[None]  # (1, T, 8h, 8w, 3)
        lr = hr.reshape(1, frames, h, s, w, s, 3).mean((3, 5))
        return jnp.asarray(lr), jnp.asarray(hr)

    def stream(cfg: ModelConfig, lrs) -> np.ndarray:
        model = CRFP(cfg)

        def encode(lr):
            return model.apply(params, lr, fv0, mk0, method=CRFP.encode_frame)

        outs = []
        lr = lrs[:, 0]
        x_lr, x_hr = encode(lr)
        state, out = model.apply(params, lr, x_lr, x_hr, mk0, method=CRFP.step0)
        outs.append(out)
        for i in range(1, frames):
            prev, lr = lrs[:, i - 1], lrs[:, i]
            flow = model.apply(params, lr, prev, method=CRFP.compute_flow)
            x_lr, x_hr = encode(lr)
            state, out = model.apply(
                params, state, lr, x_lr, x_hr, mk0, flow, method=CRFP.step
            )
            outs.append(out)
        return np.asarray(jnp.stack(outs, 1))

    def psnr(a, b):
        mse = float(np.mean((a - b) ** 2))
        return 99.0 if mse < 1e-12 else float(-10.0 * np.log10(mse))

    cfg0 = ModelConfig(variant="v18", mid_channels=mid_channels)
    rows = []
    for v in velocities:
        lrs, hrs = clip(v)
        exact = stream(cfg0, lrs)
        hr_np = np.asarray(hrs)
        for d in windows:
            cfg_w = dataclasses.replace(cfg0, dcn_window=d, dcn_window_hr=4 * d)
            win = stream(cfg_w, lrs)
            # score the settled tail (state fully propagated)
            rows.append(TrainedQualityRow(
                v_px=v, window=d,
                agree_db=round(psnr(exact[:, 2:], win[:, 2:]), 2),
                exact_db=round(psnr(exact[:, 2:], hr_np[:, 2:]), 2),
                win_db=round(psnr(win[:, 2:], hr_np[:, 2:]), 2),
            ))
    return rows


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default="checkpoints/v18_mid32_procedural.npz")
    p.add_argument("--mid", type=int, default=32)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    print("| v (LR px/f) | D | exact-vs-win dB | exact-vs-GT | win-vs-GT |")
    print("|---|---|---|---|---|")
    for r in run_trained_quality(args.ckpt, mid_channels=args.mid):
        print(f"| {r.v_px} | {r.window} | {r.agree_db} | {r.exact_db} | {r.win_db} |")


if __name__ == "__main__":
    main()

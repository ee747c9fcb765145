"""Quality cost of the windowed (clamped) DCN vs the exact gather path.

Round 1 validated the windowed DCN only under random-init FNet flows,
which are near zero — leaving the clamp's impact under REAL motion
unmeasured (docs/PERF.md round-1 caveat). This harness closes that gap
without trained weights by driving the recurrent step with GROUND-TRUTH
flow on synthetically translating content:

- frames are integer-shifted crops of one fixed texture, so the true
  inter-frame flow is exactly (vx, vy) everywhere;
- the step's ``flow`` input is fed that true flow directly (the reference
  protocol runs FNet here; with zero-init offset heads the DCN sample
  displacement then equals the flow exactly, so the clamp bites exactly
  when |v| crosses the window);
- after several recurrent steps (state fully motion-warped), the exact
  and windowed outputs are compared frame-by-frame (PSNR).

Interpretation: within the window the two paths must agree to float
noise (>=80 dB); beyond it the divergence quantifies what clamping costs
on content moving faster than D px/frame at the 1/4-res trunk (and
4*D px/frame at the HR level). The reference makes the same
bounded-support trade spatially with its warp_size ROI
(/root/reference/model/CRFP_runtime.py:8492).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from crfp_tpu.models.crfp import CRFP, ModelConfig


def _texture(rng: np.random.Generator, h: int, w: int) -> np.ndarray:
    """Smooth-ish multi-scale texture so bilinear warps are meaningful."""
    img = np.zeros((h, w, 3), np.float32)
    for period in (4, 8, 16, 32):
        phase = rng.uniform(0, 2 * np.pi, (2, 3))
        yy = np.arange(h)[:, None, None]
        xx = np.arange(w)[None, :, None]
        img += np.sin(2 * np.pi * yy / period + phase[0]) * np.cos(
            2 * np.pi * xx / period + phase[1]
        )
    img += 0.3 * rng.standard_normal((h, w, 3)).astype(np.float32)
    img -= img.min()
    img /= img.max()
    return img.astype(np.float32)


@dataclasses.dataclass
class WindowQualityResult:
    v_px: float            # true motion at LR scale, px/frame
    window: int            # dcn_window (1/4-res trunk displacement = 2*v)
    psnr_db: float         # exact vs windowed output agreement


def run_window_quality(
    velocities=(1.0, 2.0, 3.0, 4.0, 6.0, 8.0),
    windows=(4, 8, 16),
    lr_hw=(24, 40),
    frames: int = 6,
    mid_channels: int = 32,
    seed: int = 0,
    anchor: bool = False,
) -> list[WindowQualityResult]:
    """``anchor``: per-cell anchored windows (TPU kernel only — run this
    mode on the chip; the CPU fallback keeps the plain clamp). For
    cell-coherent motion the anchored window follows the displacement, so
    exactness extends to |anchor| + residual > D (the deployment claim —
    crfp_tpu/ops/pallas/dcn.py)."""
    h, w = lr_hw
    s = 8
    rng = np.random.default_rng(seed)
    margin = int(max(velocities) * frames) + 2
    tex = _texture(rng, h + margin, w + margin)

    cfg0 = ModelConfig(variant="v18", mid_channels=mid_channels)
    model0 = CRFP(cfg0)
    lr0 = jnp.zeros((1, h, w, 3), jnp.float32)
    fv0 = jnp.zeros((1, h * s, w * s, 3), jnp.float32)
    mk0 = jnp.zeros((1, h * s, w * s, 1), jnp.float32)
    params = model0.init(jax.random.PRNGKey(0), lr0[:, None], fv0[:, None], mk0[:, None])

    def stream(cfg: ModelConfig, v: float) -> np.ndarray:
        """Run `frames` recurrent steps on content translating by v px/frame
        (LR scale), feeding the TRUE flow; returns the last output frame."""
        model = CRFP(cfg)

        def frame(i):
            # camera pans: crop origin moves by +v per frame, so pixel
            # content moves by -v; flow(cur->prev) = +v
            oy = int(round(v * i))
            return jnp.asarray(tex[oy : oy + h, oy : oy + w])[None]

        flow = jnp.full((1, h, w, 2), float(v), jnp.float32)

        def encode(lr):
            return model.apply(params, lr, fv0, mk0, method=CRFP.encode_frame)

        lr = frame(0)
        x_lr, x_hr = encode(lr)
        state, out = model.apply(params, lr, x_lr, x_hr, mk0, method=CRFP.step0)
        for i in range(1, frames):
            lr = frame(i)
            x_lr, x_hr = encode(lr)
            state, out = model.apply(
                params, state, lr, x_lr, x_hr, mk0, flow, method=CRFP.step
            )
        return np.asarray(out)

    results = []
    for v in velocities:
        exact = stream(cfg0, v)
        for d in windows:
            cfg_w = dataclasses.replace(cfg0, dcn_window=d, dcn_window_hr=4 * d,
                                        dcn_anchor=anchor)
            win = stream(cfg_w, v)
            mse = float(np.mean((exact - win) ** 2))
            psnr = 99.0 if mse < 1e-12 else float(-10.0 * np.log10(mse))
            results.append(WindowQualityResult(v, d, round(psnr, 2)))
    return results


def main() -> None:
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--anchor", action="store_true")
    p.add_argument("--windows", type=int, nargs="+", default=[4, 8, 16])
    args = p.parse_args()
    mode = "anchored" if args.anchor else "windowed"
    for r in run_window_quality(windows=tuple(args.windows),
                                anchor=args.anchor):
        # trunk displacement is 2*v (flow is upsampled x2 and doubled)
        print(
            f"v={r.v_px:4.1f} px/frame (trunk {2*r.v_px:4.1f} px)  "
            f"D={r.window:2d}  exact-vs-{mode} {r.psnr_db:6.2f} dB",
            flush=True,
        )


if __name__ == "__main__":
    main()

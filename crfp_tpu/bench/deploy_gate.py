"""End-to-end deployment-configuration quality gate (docs/DEPLOY.md).

The one integration the 0.05 dB north star asks for (VERDICT r3 next-step
1): run the reference's demo evaluation protocol — per-frame Gaussian
gaze ``x = sigma*randn + W/2, y = sigma*randn + H/2`` with
sigma in {10, 50, 100}, fovea 96x96, 4-zone masked PSNR/SSIM
(/root/reference/test_video.py:149, 303-379, 543-546) — on TPU, with the
TRAINED mid=32 checkpoint, streaming frame-by-frame over procedurally
generated 720p clips, in two configurations on IDENTICAL inputs:

- EXACT — f32, unbounded XLA-gather DCN (``dcn_window=None``): the
  GOLDEN.md parity configuration, the quality reference.
- DEPLOY — the bench.py headline configuration at mid=32: bfloat16
  params/inputs on the MXU, windowed Pallas DCN (D=8 on the 1/4-res
  stages, D=32 on dcn_3 + the HR state warp), per-cell ANCHORED windows,
  and the hr_s2d space-to-depth(4) tail. (bench.py's remaining knobs are
  wrapper-level, not numerics: ``emit_s2d`` returns the same frame in
  s2d layout — bit-exactness pinned by tests/test_pallas_emit.py — and
  ``fused`` only merges the per-frame jit programs.) Since ADVICE r4 the
  batch trunk's anchored ops take ``ModelConfig.dcn_anchor_vjp`` for the
  backward-geometry coupling, so this gate's ``dcn_anchor=True`` now
  resolves the same fast forward-only anchored cell grid the runtime
  models ship with — the gate measures the deployed geometry, not the
  training one.

Per zone (whole / fovea / outskirt / past) it reports each path's
PSNR/SSIM vs ground truth and the DEPLOY-EXACT delta, plus the direct
full-frame agreement PSNR between the two paths. Zone metrics run
on-chip in one dispatch per frame (crfp_tpu/eval/zones.py::OnChipZoneEval).

Run (writes the tables used by docs/DEPLOY.md):
    python -m crfp_tpu.bench.deploy_gate --ckpt checkpoints/v18_mid32_procedural.npz
"""

from __future__ import annotations

import argparse
import dataclasses

import numpy as np

FV_SIZE = 96  # the reference demo fovea (test_video.py:153)


@dataclasses.dataclass
class GateRow:
    sigma: float
    zone: str
    exact_psnr: float
    exact_ssim: float
    deploy_psnr: float
    deploy_ssim: float

    @property
    def d_psnr(self) -> float:
        return self.deploy_psnr - self.exact_psnr

    @property
    def d_ssim(self) -> float:
        return self.deploy_ssim - self.exact_ssim


def _clip(rng, h, w, s, frames, vy, vx):
    """Procedural GT/LR clip: textured plane translating (vy, vx) LR px/f."""
    from crfp_tpu.bench.quality_window import _texture

    mh = int(abs(vy) * s * frames) + 8
    mw = int(abs(vx) * s * frames) + 8
    tex = _texture(rng, h * s + mh, w * s + mw)
    hrs = []
    for i in range(frames):
        oy, ox = int(round(vy * s * i)), int(round(vx * s * i))
        hrs.append(tex[oy : oy + h * s, ox : ox + w * s])
    hr = np.stack(hrs)  # (T, 8h, 8w, 3)
    lr = hr.reshape(frames, h, s, w, s, 3).mean((2, 4))
    return lr.astype(np.float32), hr.astype(np.float32)


def run_gate(
    ckpt: str,
    sigmas=(10.0, 50.0, 100.0),
    lr_hw=(90, 160),
    frames: int = 20,
    mid_channels: int = 32,
    velocity=(1.0, 2.0),
    seed: int = 42,
    skip: int = 2,
) -> tuple[list[GateRow], dict[str, float]]:
    """Returns (rows, extras). ``skip``: settle frames excluded from the
    zone averages (state not yet propagated; the reference's eval also
    skips frame 0 via its border rule)."""
    import jax.numpy as jnp

    from crfp_tpu.eval.zones import OnChipZoneEval, zone_masks_step
    from crfp_tpu.models.crfp import CRFP, ModelConfig
    from crfp_tpu.models.streaming import StreamingRunner
    from crfp_tpu.tools.train_procedural import load_params
    from crfp_tpu.utils.precision import cast_pytree

    params = load_params(ckpt)
    h, w = lr_hw
    s = 8
    hh, hw = h * s, w * s

    cfg_exact = ModelConfig(variant="v18", mid_channels=mid_channels)
    cfg_deploy = dataclasses.replace(
        cfg_exact, dcn_window=8, dcn_window_hr=32, hr_s2d=True, dcn_anchor=True
    )
    run_exact = StreamingRunner(CRFP(cfg_exact), params, donate=False)
    run_deploy = StreamingRunner(
        CRFP(cfg_deploy), cast_pytree(params, jnp.bfloat16), donate=False
    )

    rows: list[GateRow] = []
    agree_db: list[float] = []
    rng = np.random.default_rng(seed)
    for sigma in sigmas:
        lr, hr = _clip(rng, h, w, s, frames, *velocity)
        gaze = np.stack(
            [
                sigma * rng.standard_normal(frames) + hh / 2,
                sigma * rng.standard_normal(frames) + hw / 2,
            ],
            axis=1,
        )
        ev_exact, ev_deploy = OnChipZoneEval(FV_SIZE), OnChipZoneEval(FV_SIZE)
        run_exact.clear_states()
        run_deploy.clear_states()
        mse_sum = 0.0
        for i in range(frames):
            z = zone_masks_step(hh, hw, tuple(gaze[i]), FV_SIZE)
            lr_i = jnp.asarray(lr[i][None])
            fv_i = jnp.asarray(hr[i][None])
            mk_i = jnp.asarray(z.mask[None])
            gt_i = hr[i][None]
            out_e = np.clip(np.asarray(run_exact(lr_i, fv_i, mk_i)), 0, 1)
            out_d = np.clip(
                np.asarray(
                    run_deploy(
                        lr_i.astype(jnp.bfloat16),
                        fv_i.astype(jnp.bfloat16),
                        mk_i.astype(jnp.bfloat16),
                    )
                ).astype(np.float32),
                0,
                1,
            )
            ev_exact.update(jnp.asarray(out_e), jnp.asarray(gt_i), z)
            ev_deploy.update(jnp.asarray(out_d), jnp.asarray(gt_i), z)
            if i >= skip:
                mse_sum += float(np.mean((out_e - out_d) ** 2))

        def settled(ev):
            # drop the settle frames (recurrent state not yet propagated);
            # 'past' entry j scores frame j+1, so it drops one fewer
            return {
                k: float(np.mean(v[max(skip - 1, 0) if k.endswith("past") else skip :]))
                for k, v in ev.results.items()
            }

        se, sd = settled(ev_exact), settled(ev_deploy)
        for zone in ("whole", "fovea", "outskirt", "past"):
            rows.append(
                GateRow(
                    sigma=sigma,
                    zone=zone,
                    exact_psnr=se[f"psnr_{zone}"],
                    exact_ssim=se[f"ssim_{zone}"],
                    deploy_psnr=sd[f"psnr_{zone}"],
                    deploy_ssim=sd[f"ssim_{zone}"],
                )
            )
        agree_db.append(-10.0 * np.log10(mse_sum / (frames - skip) + 1e-12))
    extras = {"agree_db_min": float(min(agree_db)), "agree_db": agree_db}
    return rows, extras


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default="checkpoints/v18_mid32_procedural.npz")
    p.add_argument("--frames", type=int, default=20)
    p.add_argument("--lr_hw", type=int, nargs=2, default=(90, 160))
    p.add_argument("--mid", type=int, default=32)
    p.add_argument("--sigmas", type=float, nargs="+", default=(10.0, 50.0, 100.0))
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    rows, extras = run_gate(
        args.ckpt,
        sigmas=tuple(args.sigmas),
        lr_hw=tuple(args.lr_hw),
        frames=args.frames,
        mid_channels=args.mid,
    )
    print("| sigma | zone | exact PSNR | deploy PSNR | dPSNR | exact SSIM | deploy SSIM | dSSIM |")
    print("|---|---|---|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r.sigma:g} | {r.zone} | {r.exact_psnr:.2f} | {r.deploy_psnr:.2f} "
            f"| {r.d_psnr:+.3f} | {r.exact_ssim:.4f} | {r.deploy_ssim:.4f} "
            f"| {r.d_ssim:+.4f} |"
        )
    print(f"\nfull-frame exact-vs-deploy agreement: min {extras['agree_db_min']:.1f} dB "
          f"(per-sigma: {', '.join(f'{a:.1f}' for a in extras['agree_db'])})")
    worst = max(abs(r.d_psnr) for r in rows)
    print(f"worst per-zone |dPSNR|: {worst:.3f} dB (budget 0.05 dB)")


if __name__ == "__main__":
    main()

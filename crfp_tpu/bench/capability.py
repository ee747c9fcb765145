"""Capability ablation: does the framework train a model worth having?

VERDICT r4 task 1: exactness everywhere was proven (goldens, deploy
gate), but the architecture's defining capabilities — fovea texture
injection and DCN-aligned recurrent propagation — had never been shown
to WIN anything end-to-end. This harness runs the reference's demo
evaluation protocol (Gaussian gaze sigma in {10, 50, 100}, fovea 96^2,
4-zone masked PSNR/SSIM — /root/reference/test_video.py:149, 303-379,
543-546) on HELD-OUT structured procedural clips
(crfp_tpu/data/procedural.py; seeds disjoint from training) for four
rows:

- **bicubic** — PIL-parity bicubic 8x upsample of the LR stream (no
  model, no fovea): the interpolation control;
- **no_dcn** — trained CRFP_simple_noDCN (plain conv alignment,
  /root/reference/model/CRFP.py:2000-2312): the DCN ablation;
- **basic_fvsr** — trained BasicFVSR (fovea blended once at input,
  :1708-1998): the foveation ablation;
- **v18** — the trained flagship CRFP_DSV in its deployment window
  configuration.

Each trained row streams frame-by-frame with its OWN FNet flow and its
training window configuration. Results feed docs/DEPLOY.md's capability
table; the claims to check are v18 > bicubic (whole frame), v18 > no_dcn
(alignment earns quality), and a fovea/past advantage over basic_fvsr
(output-blend foveation propagates detail).

Run:
    python -m crfp_tpu.bench.capability \
        --ckpt_v18 checkpoints/v18_mid32_struct.npz \
        --ckpt_no_dcn checkpoints/no_dcn_mid32_struct.npz \
        --ckpt_basic_fvsr checkpoints/basic_fvsr_mid32_struct.npz
"""

from __future__ import annotations

import argparse
import json

import numpy as np

FV_SIZE = 96  # the reference demo fovea (test_video.py:153)
ZONES = ("whole", "fovea", "outskirt", "past")


def _held_out_clip(seed: int, frames: int, hh: int, hw: int):
    """Structured GT/LR clip from the held-out seed range (>= 9000)."""
    from crfp_tpu.data.procedural import lr_box, make_clip

    assert hh == hw, "make_clip generates square frames; pad/crop below"
    rng = np.random.default_rng(seed)
    hr = make_clip(rng, frames, hh)
    return lr_box(hr).astype(np.float32), hr


def _bicubic8(lr: np.ndarray, hh: int, hw: int) -> np.ndarray:
    from crfp_tpu.data.reds import _bicubic_upsample

    u8 = (np.clip(lr, 0, 1) * 255).round().astype(np.uint8)
    return _bicubic_upsample(u8, hh, hw).astype(np.float32) / 255.0


def _model_runner(name: str, ckpt: str, mid: int):
    import jax.numpy as jnp

    from crfp_tpu.models.crfp import CRFP, ModelConfig
    from crfp_tpu.models.streaming import StreamingRunner
    from crfp_tpu.utils.params_io import load_params
    from crfp_tpu.utils.precision import cast_pytree

    if name == "v18":
        # The full deployment configuration (= bench.py _DEPLOY and the
        # deploy gate): bf16 + windowed Pallas + hr_s2d (bit-exact,
        # tests/test_models.py::test_hr_s2d_bit_equivalence_v18) +
        # dcn_anchor — the whole bundle's quality cost is gated at
        # 0.025 dB worst per-zone (docs/DEPLOY.md). bf16 is also what
        # makes 768^2 compile on-chip: the f32 shared-tap dcn_3 resolves
        # band=8 (nn/align.py:59), whose 4x-denser cell grid pushes the
        # scalar-prefetch starts table past the 1 MB SMEM.
        cfg = ModelConfig(variant="v18", mid_channels=mid,
                          dcn_window=8, dcn_window_hr=32, hr_s2d=True,
                          dcn_anchor=True)
    elif name == "no_dcn":
        cfg = ModelConfig(variant="no_dcn", mid_channels=mid, hr_dcn=False)
    elif name == "basic_fvsr":
        cfg = ModelConfig(variant="basic_fvsr", mid_channels=mid, hr_dcn=False,
                          dcn_window=8)
    else:
        raise ValueError(name)
    # every trained row runs the deployment precision (bf16 params +
    # inputs, f32 metrics) so the ablation compares models, not dtypes
    params = cast_pytree(load_params(ckpt), jnp.bfloat16)
    runner = StreamingRunner(CRFP(cfg), params, donate=False)

    def run(lr, fv, mk):
        out = runner(lr.astype(jnp.bfloat16), fv.astype(jnp.bfloat16),
                     mk.astype(jnp.bfloat16))
        return out.astype(jnp.float32)

    run.clear_states = runner.clear_states
    return run


def run_capability(
    ckpts: dict[str, str],
    sigmas=(10.0, 50.0, 100.0),
    hr_size: int = 768,
    frames: int = 20,
    mid: int = 32,
    seed0: int = 9000,
    skip: int = 2,
) -> dict:
    """Returns {row: {sigma: {metric_zone: value}}} plus 'deltas'.

    ``skip``: settle frames excluded (recurrent state not yet propagated),
    matching the deploy gate; 'past' entry j scores frame j+1 so it drops
    one fewer.
    """
    import jax.numpy as jnp

    from crfp_tpu.eval.zones import OnChipZoneEval, zone_masks_step

    hh = hw = hr_size
    rows = ["bicubic"] + [k for k in ("no_dcn", "basic_fvsr", "v18") if k in ckpts]
    runners = {k: _model_runner(k, ckpts[k], mid) for k in rows if k != "bicubic"}

    results: dict[str, dict] = {r: {} for r in rows}
    for si, sigma in enumerate(sigmas):
        rng = np.random.default_rng(seed0 + si)
        lr, hr = _held_out_clip(seed0 + 100 + si, frames, hh, hw)
        bic = _bicubic8(lr, hh, hw)
        gaze = np.stack(
            [sigma * rng.standard_normal(frames) + hh / 2,
             sigma * rng.standard_normal(frames) + hw / 2], axis=1,
        )
        evs = {r: OnChipZoneEval(FV_SIZE) for r in rows}
        for r in runners.values():
            r.clear_states()
        for i in range(frames):
            z = zone_masks_step(hh, hw, tuple(gaze[i]), FV_SIZE)
            gt_i = jnp.asarray(hr[i][None])
            evs["bicubic"].update(jnp.asarray(bic[i][None]), gt_i, z)
            lr_i = jnp.asarray(lr[i][None])
            fv_i = jnp.asarray(hr[i][None])
            mk_i = jnp.asarray(z.mask[None])
            for name, runner in runners.items():
                out = jnp.clip(runner(lr_i, fv_i, mk_i), 0, 1)
                evs[name].update(out, gt_i, z)

        def settled(ev):
            return {
                k: float(np.mean(v[max(skip - 1, 0) if k.endswith("past") else skip:]))
                for k, v in ev.results.items()
            }

        for r in rows:
            results[r][f"{sigma:g}"] = settled(evs[r])

    # headline deltas (averaged over sigmas, whole frame)
    def avg(row, metric):
        return float(np.mean([results[row][s][metric] for s in results[row]]))

    deltas = {}
    if "v18" in results:
        deltas["v18_vs_bicubic_whole_db"] = avg("v18", "psnr_whole") - avg(
            "bicubic", "psnr_whole")
        deltas["v18_vs_bicubic_fovea_db"] = avg("v18", "psnr_fovea") - avg(
            "bicubic", "psnr_fovea")
        if "no_dcn" in results:
            deltas["v18_vs_no_dcn_whole_db"] = avg("v18", "psnr_whole") - avg(
                "no_dcn", "psnr_whole")
        if "basic_fvsr" in results:
            for z in ("fovea", "past", "whole"):
                deltas[f"v18_vs_basic_fvsr_{z}_db"] = avg(
                    "v18", f"psnr_{z}") - avg("basic_fvsr", f"psnr_{z}")
    return {"rows": results, "deltas": deltas}


def print_tables(res: dict) -> None:
    rows = res["rows"]
    sigmas = list(next(iter(rows.values())).keys())
    for sigma in sigmas:
        print(f"\n### sigma^T = {sigma}\n")
        print("| model | " + " | ".join(
            f"{z} PSNR | {z} SSIM" for z in ZONES) + " |")
        print("|---" * (1 + 2 * len(ZONES)) + "|")
        for r, per in rows.items():
            m = per[sigma]
            cells = []
            for z in ZONES:
                cells.append(f"{m[f'psnr_{z}']:.2f}")
                cells.append(f"{m[f'ssim_{z}']:.4f}")
            print(f"| {r} | " + " | ".join(cells) + " |")
    print("\nheadline deltas (PSNR dB, averaged over sigmas):")
    for k, v in res["deltas"].items():
        print(f"  {k}: {v:+.2f}")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt_v18", default="checkpoints/v18_mid32_struct.npz")
    p.add_argument("--ckpt_no_dcn", default=None)
    p.add_argument("--ckpt_basic_fvsr", default=None)
    p.add_argument("--mid", type=int, default=32)
    p.add_argument("--hr_size", type=int, default=768)
    p.add_argument("--frames", type=int, default=20)
    p.add_argument("--sigmas", type=float, nargs="+", default=(10.0, 50.0, 100.0))
    p.add_argument("--json_out", default=None)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    ckpts = {"v18": args.ckpt_v18}
    if args.ckpt_no_dcn:
        ckpts["no_dcn"] = args.ckpt_no_dcn
    if args.ckpt_basic_fvsr:
        ckpts["basic_fvsr"] = args.ckpt_basic_fvsr
    res = run_capability(ckpts, sigmas=tuple(args.sigmas), hr_size=args.hr_size,
                         frames=args.frames, mid=args.mid)
    print_tables(res)
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()

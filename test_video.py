"""Streaming inference demo / 4-zone evaluation (reference test_video.py parity).

Per clip: frame-by-frame streaming through the shared CRFP step with a
Gaussian eye-tracker gaze model (x = sigma*randn + center,
/root/reference/test_video.py:309-310), 4-zone PSNR/SSIM
(whole/fovea/outskirt/past), foveated patch heat-maps, and PNG/GIF export
of SR / Bicubic / GT. The reference's edit-in-file constants
(test_video.py:138-163) are CLI flags here.
"""

from __future__ import annotations

import argparse
import os


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dataset_dir", type=str, default="/DATA/REDS_sharp")
    p.add_argument("--video_set", type=str, default="train")
    p.add_argument("--video_num", type=str, default="0,11,15,20")
    p.add_argument("--procedural", action="store_true",
                   help="stream generated structured-content clips "
                        "(crfp_tpu/data/procedural.py) instead of REDS "
                        "frames on disk — the in-container demo path; "
                        "--video_num indexes held-out seeds")
    p.add_argument("--procedural_hw", type=int, nargs=2, default=(512, 512),
                   help="HR frame size of the generated clips")
    p.add_argument("--model_path", type=str, default=None)
    p.add_argument("--variant", type=str, default="v15",
                   choices=["v13", "v15", "v18", "v18_cra", "no_dcn", "basic_fvsr"])
    p.add_argument("--mid_channels", type=int, default=32)
    p.add_argument("--y_only", action="store_true")
    p.add_argument("--hr_dcn", type=lambda v: v.lower() in ("1", "true", "y"), default=True)
    p.add_argument("--offset_prop", type=lambda v: v.lower() in ("1", "true", "y"), default=True)
    p.add_argument("--split_ratio", type=int, default=3)
    p.add_argument("--sigma", type=float, default=50.0,
                   help="eye-tracker noise sigma^T (README demos use 10/50/100)")
    p.add_argument("--fv_size", type=int, default=96)
    p.add_argument("--regional_dcn", action="store_true")
    p.add_argument("--dcn_size", type=int, default=720)
    p.add_argument("--n_frames", type=int, default=100)
    p.add_argument("--eval_mode", action="store_true")
    p.add_argument("--save_dir", type=str, default="test_png/eval_video")
    p.add_argument("--save_gif", action="store_true")
    p.add_argument("--heatmaps", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cpu", action="store_true")
    return p.parse_args(argv)


def load_clip(gt_dir: str, lr_dir: str, n_frames: int):
    import cv2
    import numpy as np
    import PIL.Image

    gt_files = sorted(os.listdir(gt_dir))[:n_frames]
    lr_files = sorted(os.listdir(lr_dir))[:n_frames]
    gts, lrs, lrsrs = [], [], []
    for gf, lf in zip(gt_files, lr_files):
        gt = cv2.imread(os.path.join(gt_dir, gf))[:1072, :1920, ::-1]  # BGR->RGB
        lr_full = cv2.imread(os.path.join(lr_dir, lf))[:, :, ::-1]
        lr = lr_full[:134, :240]
        h, w = gt.shape[:2]
        lrsr = np.array(
            PIL.Image.fromarray(np.ascontiguousarray(lr_full)).resize((w, h), PIL.Image.BICUBIC)
        )
        gts.append(gt)
        lrs.append(lr)
        lrsrs.append(lrsr)
    f = lambda x: np.stack(x).astype(np.float32) / 255.0
    return f(gts), f(lrs), f(lrsrs)


def main(argv=None):
    args = parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from crfp_tpu.eval.foveated import foveated_metric
    from crfp_tpu.eval.zones import StreamingZoneEval, zone_masks_step
    from crfp_tpu.models import CRFP, ModelConfig, StreamingRunner
    from crfp_tpu.tools.video import frames_to_gif

    cfg = ModelConfig(
        variant=args.variant, mid_channels=args.mid_channels, y_only=args.y_only,
        hr_dcn=args.hr_dcn, offset_prop=args.offset_prop, split_ratio=args.split_ratio,
    )
    model = CRFP(cfg)
    rng = np.random.default_rng(args.seed)

    os.makedirs(args.save_dir, exist_ok=True)
    zone_eval = StreamingZoneEval()
    params = None
    use_fg = args.regional_dcn

    for v in (int(x) for x in args.video_num.split(",")):
        if args.procedural:
            from crfp_tpu.data.procedural import lr_box, make_clip
            from crfp_tpu.data.reds import _bicubic_upsample

            gh, gw = args.procedural_hw
            assert gh == gw, "make_clip generates square frames"
            clip_rng = np.random.default_rng(5000 + v)  # held out from training
            gts = make_clip(clip_rng, args.n_frames, gh)
            lrs = lr_box(gts).astype(np.float32)
            lrsrs = (
                _bicubic_upsample(
                    (lrs * 255).round().astype(np.uint8), gh, gw
                ).astype(np.float32) / 255.0
            )
            print(f"clip {v:03d}: procedural seed {5000 + v} ({gh}x{gw})")
        else:
            gt_dir = os.path.join(
                args.dataset_dir,
                f"{args.video_set}/{args.video_set}/{args.video_set}_sharp",
                f"{v:03d}",
            )
            lr_root = args.dataset_dir.replace("_sharp", "_sharp_BI_x8")
            lr_dir = os.path.join(
                lr_root, f"{args.video_set}/{args.video_set}/{args.video_set}_sharp",
                f"{v:03d}",
            )
            print(f"clip {v:03d}: {gt_dir}")
            gts, lrs, lrsrs = load_clip(gt_dir, lr_dir, args.n_frames)
        n, h, w, _ = gts.shape

        if params is None:
            if args.model_path:
                from crfp_tpu.utils.params_io import load_params

                params = load_params(args.model_path)
            else:
                lr0 = jnp.asarray(lrs[:1])
                fv0 = jnp.zeros((1, h, w, 3), jnp.float32)
                mk0 = jnp.zeros((1, h, w, 1), jnp.float32)
                params = jax.jit(
                    lambda k: model.init(k, lr0[:, None], fv0[:, None], mk0[:, None])
                )(jax.random.PRNGKey(0))
                print("WARNING: no --model_path given; using random weights")

        runner = StreamingRunner(model, params, use_fg=use_fg)
        zone_eval.new_clip()

        gaze_x = args.sigma * rng.standard_normal(n) + w / 2
        gaze_y = args.sigma * rng.standard_normal(n) + h / 2

        sr_frames, heat_frames = [], []
        for i in range(n):
            zones = zone_masks_step(
                h, w, (gaze_y[i], gaze_x[i]), args.fv_size,
                regional_dcn=args.regional_dcn, dcn_size=args.dcn_size,
            )
            fv = gts[i] * zones.mask
            out = runner(
                jnp.asarray(lrs[i : i + 1]),
                jnp.asarray(fv[None]),
                jnp.asarray(zones.mask[None]),
                jnp.asarray(zones.fg[None]) if use_fg else None,
            )
            sr = np.asarray(out)
            if args.y_only:
                # pair the model's Y with bicubic-upsampled UV
                # (/root/reference/test_video.py:396-402)
                from crfp_tpu.ops.color import rgb2yuv, yuv2rgb

                yuv = np.asarray(rgb2yuv(lrsrs[i : i + 1]))
                sr = np.asarray(
                    yuv2rgb(np.concatenate([sr[..., :1], yuv[..., 1:]], axis=-1))
                )
            zone_eval.update(sr, gts[i : i + 1], zones)
            sr_frames.append((np.clip(sr[0], 0, 1) * 255).round().astype(np.uint8))
            if args.heatmaps:
                pm, sm, _, _ = foveated_metric(jnp.asarray(sr[0]), jnp.asarray(gts[i]))
                heat_frames.append(
                    (np.clip(np.asarray(pm), 0, 1) * 255).astype(np.uint8)
                )
            print(f"  frame {i}\r", end="")

        clip_dir = os.path.join(args.save_dir, f"{v:03d}")
        os.makedirs(clip_dir, exist_ok=True)
        import PIL.Image

        for i, f in enumerate(sr_frames):
            PIL.Image.fromarray(f).save(os.path.join(clip_dir, f"sr_{i:08d}.png"))
        if args.save_gif:
            frames_to_gif(sr_frames, os.path.join(args.save_dir, f"sr_{v:03d}.gif"))
            frames_to_gif(
                [(np.clip(x, 0, 1) * 255).astype(np.uint8) for x in lrsrs],
                os.path.join(args.save_dir, f"bicubic_{v:03d}.gif"),
            )
            frames_to_gif(
                [(np.clip(x, 0, 1) * 255).astype(np.uint8) for x in gts],
                os.path.join(args.save_dir, f"gt_{v:03d}.gif"),
            )
        if args.heatmaps and heat_frames:
            frames_to_gif(
                [np.repeat(f[..., None], 3, axis=-1) for f in heat_frames],
                os.path.join(args.save_dir, f"psnr_heat_{v:03d}.gif"),
            )

    summary = zone_eval.summary()
    print()
    for zone in ("whole", "fovea", "outskirt", "past"):
        print(
            f"{zone:>9}: PSNR {summary[f'psnr_{zone}']:.3f}  SSIM {summary[f'ssim_{zone}']:.4f}"
        )
    return summary


if __name__ == "__main__":
    main()

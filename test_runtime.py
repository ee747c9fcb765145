"""Latency benchmark entry point (reference test_runtime.py parity).

Usage: python test_runtime.py [--preset 1080p|720p|512] [--warp 720]
       [--mid 32] [--reps 30] [--warmup 10] [--t 5]
"""

from __future__ import annotations

import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="1080p", choices=["1080p", "720p", "512"])
    p.add_argument("--warp", type=int, default=720)
    p.add_argument("--warp_w", type=int, default=None)
    p.add_argument("--mid", type=int, default=32)
    p.add_argument("--reps", type=int, default=30)
    p.add_argument("--warmup", type=int, default=10)
    p.add_argument("--t", type=int, default=5)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--dcn_window", type=int, default=None)
    p.add_argument("--dcn_window_hr", type=int, default=None)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--hr_s2d", action="store_true")
    p.add_argument("--lv3_s2d", action="store_true")
    p.add_argument("--dcn_anchor", action="store_true")
    p.add_argument("--emit_s2d", action="store_true")
    p.add_argument("--fused", action="store_true",
                   help="one jitted flow+enc+step program per frame, one sync "
                        "per rep chain (deployment number)")
    p.add_argument("--model_path", default=None,
                   help="run with trained weights (.npz/.pt/orbax; the "
                        "batch-trunk checkpoint is adapted onto the runtime "
                        "trunk) instead of random init")
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from crfp_tpu.bench.runtime import run_runtime_bench

    res = run_runtime_bench(
        preset=args.preset,
        warp_size=(args.warp, args.warp_w or args.warp),
        mid_channels=args.mid,
        t=args.t,
        repeat_time=args.reps,
        warm_up=args.warmup,
        dcn_window=args.dcn_window,
        dcn_window_hr=args.dcn_window_hr,
        bf16=args.bf16,
        hr_s2d=args.hr_s2d,
        lv3_s2d=args.lv3_s2d,
        dcn_anchor=args.dcn_anchor,
        emit_s2d=args.emit_s2d,
        fused=args.fused,
        params_path=args.model_path,
    )
    print(res)


if __name__ == "__main__":
    main()

"""Per-op device-time table from a captured TPU trace (SURVEY.md §5.1).

Runs N steady-state frames of the runtime model under
``jax.profiler.trace`` and prints each device op's total time / N —
the tool behind PERF.md's roofline table (the reference's counterpart
is torch.profiler tables, /root/reference/test_runtime.py:84-186 timing
harness). Works through the axon tunnel: the trace lands in
``<logdir>/plugins/profile/<ts>/*.trace.json.gz``.

Usage:
    python -m crfp_tpu.bench.trace_table --frames 10 --lv3_s2d
"""

from __future__ import annotations

import glob
import gzip
import json
import os
from collections import defaultdict


def parse_trace(logdir: str, frames: int, top: int = 40) -> list[tuple[str, float]]:
    """Sum device-lane durations per op name across the trace; return
    (name, ms_per_frame) sorted descending."""
    paths = sorted(
        glob.glob(os.path.join(logdir, "plugins/profile/*/*.trace.json.gz"))
    )
    if not paths:
        raise FileNotFoundError(f"no trace under {logdir}")
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]

    # device lanes: pids whose process name mentions TPU/device XLA ops
    names: dict[int, str] = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {
        pid for pid, n in names.items()
        if "/device:TPU" in n or "TPU" in n and "host" not in n.lower()
    }

    tot: dict[str, float] = defaultdict(float)
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        # XLA op lanes nest under thread lanes; use the leaf op name
        tot[e.get("name", "?")] += e.get("dur", 0.0)  # microseconds
    rows = sorted(tot.items(), key=lambda kv: -kv[1])
    return [(n, us / 1e3 / frames) for n, us in rows[:top]]


def run(frames: int = 10, logdir: str = "/tmp/crfp_trace_table", **bench_kw):
    """Capture + print. ``bench_kw`` forwards to the runtime model config
    (dcn_window, hr_s2d, lv3_s2d, bf16, ...)."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from crfp_tpu.bench.profile import force_sync, trace
    from crfp_tpu.models.crfp import ModelConfig
    from crfp_tpu.models.runtime import CRFPRuntimeV18

    preset_lr = {"1080p": (135, 240), "720p": (90, 160)}[
        bench_kw.pop("preset", "1080p")]
    warp = bench_kw.pop("warp_size", (720, 720))
    bf16 = bench_kw.pop("bf16", True)
    cfg = ModelConfig(variant="v18", **bench_kw)
    model = CRFPRuntimeV18(cfg, warp_size=warp)
    rng = np.random.default_rng(0)
    lr = jnp.asarray(rng.uniform(0, 1, (1, *preset_lr, 3)), jnp.float32)
    fv = jnp.asarray(rng.uniform(0, 1, (1, 96, 96, 3)), jnp.float32)

    def init(key):
        def run_(mdl):
            x_lr, x_hr = mdl.encode(lr, fv)
            state, _ = mdl.step0(lr, x_lr, x_hr)
            mdl.step(state, lr, lr, x_lr, x_hr)

        return model.init(key, method=run_)

    params = jax.jit(init)(jax.random.PRNGKey(0))
    if bf16:
        from crfp_tpu.utils.precision import cast_pytree

        params = cast_pytree(params, jnp.bfloat16)
        lr_, fv_ = lr.astype(jnp.bfloat16), fv.astype(jnp.bfloat16)
    else:
        lr_, fv_ = lr, fv

    def frame(p, state, a, pa, f):
        x_lr, x_hr = model.apply(p, a, f, method=CRFPRuntimeV18.encode)
        return model.apply(p, state, a, pa, x_lr, x_hr,
                           method=CRFPRuntimeV18.step)

    frame_fn = jax.jit(frame, donate_argnums=(1,))

    def frame0(p, a, f):
        x_lr, x_hr = model.apply(p, a, f, method=CRFPRuntimeV18.encode)
        return model.apply(p, a, x_lr, x_hr, method=CRFPRuntimeV18.step0)

    state, out = jax.jit(frame0)(params, lr_, fv_)
    for _ in range(3):  # warm
        state, out = frame_fn(params, state, lr_, lr_, fv_)
    force_sync(out)

    with trace(logdir):
        for _ in range(frames):
            state, out = frame_fn(params, state, lr_, lr_, fv_)
        force_sync(out)
        time.sleep(0.5)

    rows = parse_trace(logdir, frames)
    total = sum(ms for _, ms in rows)
    print(f"{'ms/frame':>9}  op  (top {len(rows)}, sum {total:.2f} ms)")
    for n, ms in rows:
        print(f"{ms:9.3f}  {n}")
    return rows


def main():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=10)
    p.add_argument("--preset", default="1080p")
    p.add_argument("--warp", type=int, default=720)
    p.add_argument("--warp_w", type=int, default=None,
                   help="warp width when the ROI is not square "
                        "(full-frame 1080p: --warp 1080 --warp_w 1920)")
    p.add_argument("--mid", type=int, default=32)
    p.add_argument("--dcn_window", type=int, default=8)
    p.add_argument("--dcn_window_hr", type=int, default=32)
    p.add_argument("--hr_s2d", action="store_true", default=True)
    p.add_argument("--lv3_s2d", action="store_true")
    p.add_argument("--dcn_anchor", action="store_true")
    p.add_argument("--f32", action="store_true")
    p.add_argument("--logdir", default="/tmp/crfp_trace_table")
    args = p.parse_args()
    run(
        frames=args.frames,
        logdir=args.logdir,
        preset=args.preset,
        warp_size=(args.warp, args.warp_w or args.warp),
        mid_channels=args.mid,
        dcn_window=args.dcn_window,
        dcn_window_hr=args.dcn_window_hr,
        hr_s2d=args.hr_s2d,
        lv3_s2d=args.lv3_s2d,
        dcn_anchor=args.dcn_anchor,
        bf16=not args.f32,
    )


if __name__ == "__main__":
    main()

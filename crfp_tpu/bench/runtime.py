"""Streaming latency harness (test_runtime.py parity) with per-stage timing.

Protocol from /root/reference/test_runtime.py:81-186: synthetic inputs,
batch 1, t frames per rep, ``repeat_time`` reps with ``warm_up`` discarded,
presets 1080p (LR 135x240) / 720p / 512^2, fovea 96^2, warp_size 720^2.

Stage timing replaces CUDA events (SURVEY.md §5.1): each stage (flow,
encoders, trunk step, reconstruction is inside the step) is jitted
separately and timed with ``block_until_ready`` host timers; memory via
``device.memory_stats()``.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from crfp_tpu.models.crfp import ModelConfig
from crfp_tpu.models.runtime import CRFPRuntimeV18

PRESETS = {
    "1080p": {"hr": (1080, 1920), "lr": (135, 240)},
    "720p": {"hr": (720, 1280), "lr": (90, 160)},
    "512": {"hr": (512, 512), "lr": (64, 64)},
}


@dataclasses.dataclass
class BenchResult:
    preset: str
    warp_size: tuple[int, int]
    sec_per_frame: float
    frames_per_sec: float
    stage_seconds: dict[str, float]
    peak_bytes: int | None

    def __str__(self):
        stages = "  ".join(f"{k} {v*1e3:.2f}ms" for k, v in self.stage_seconds.items())
        mem = f"  peak {self.peak_bytes/2**20:.0f}MiB" if self.peak_bytes else ""
        return (
            f"[{self.preset} warp={self.warp_size}] {self.sec_per_frame*1e3:.2f} ms/frame"
            f" = {self.frames_per_sec:.1f} fps  |  {stages}{mem}"
        )


def _timed(fn, *args) -> tuple[Any, float]:
    from crfp_tpu.bench.profile import force_sync

    t0 = time.perf_counter()
    out = fn(*args)
    # block_until_ready does NOT synchronize on the axon remote backend
    # (docs/PERF.md) — force_sync's scalar fetch is the true barrier
    force_sync(out)
    return out, time.perf_counter() - t0


def run_runtime_bench(
    preset: str = "1080p",
    warp_size: tuple[int, int] = (720, 720),
    mid_channels: int = 32,
    t: int = 5,
    repeat_time: int = 30,
    warm_up: int = 10,
    fv_hw: tuple[int, int] = (96, 96),
    seed: int = 0,
    dcn_window: int | None = None,
    dcn_window_hr: int | None = None,
    bf16: bool = False,
    hr_s2d: bool = False,
    lv3_s2d: bool = False,
    dcn_anchor: bool = False,
    emit_s2d: bool = False,
    fused: bool = False,
    params_path: str | None = None,
) -> BenchResult:
    """``fused``: time one jitted flow+encode+step program per frame with a
    single sync per rep chain (the deployment number — the per-stage mode
    pays the ~28 ms axon dispatch floor at every stage boundary).
    ``emit_s2d``: the step returns the s2d frame and a separate tiny
    jitted program runs the Mosaic depth-to-space emission per frame
    (requires ``fused``; the emission program is timed as part of the
    chain)."""
    if emit_s2d:
        assert fused, "emit_s2d is a fused-deployment configuration"
    cfg = ModelConfig(variant="v18", mid_channels=mid_channels,
                      dcn_window=dcn_window, dcn_window_hr=dcn_window_hr,
                      hr_s2d=hr_s2d, lv3_s2d=lv3_s2d, dcn_anchor=dcn_anchor,
                      emit_s2d=emit_s2d)
    model = CRFPRuntimeV18(cfg, warp_size=warp_size)
    lr_h, lr_w = PRESETS[preset]["lr"]
    rng = np.random.default_rng(seed)

    lr = jnp.asarray(rng.uniform(0, 1, (1, lr_h, lr_w, 3)), jnp.float32)
    fv = jnp.asarray(rng.uniform(0, 1, (1, *fv_hw, 3)), jnp.float32)

    def init(key):
        def run(mdl):
            x_lr, x_hr = mdl.encode(lr, fv)
            state, _ = mdl.step0(lr, x_lr, x_hr)
            mdl.step(state, lr, lr, x_lr, x_hr)

        return model.init(key, method=run)

    params = jax.jit(init)(jax.random.PRNGKey(0))
    if params_path:
        # trained batch-trunk checkpoint adapted onto the runtime trunk
        # (mid_channels must match the checkpoint's width)
        from crfp_tpu.models.runtime import runtime_params_from_batch
        from crfp_tpu.utils.params_io import load_params

        params, n_unmapped = runtime_params_from_batch(load_params(params_path), params)
        print(f"loaded {params_path} ({n_unmapped} runtime-only leaves kept at init)")
    if bf16:
        from crfp_tpu.utils.precision import cast_pytree

        params = cast_pytree(params, jnp.bfloat16)
        lr = lr.astype(jnp.bfloat16)
        fv = fv.astype(jnp.bfloat16)

    flow_fn = jax.jit(
        lambda p, a, b: model.apply(p, a, b, method=CRFPRuntimeV18.compute_flow)
    )
    enc_fn = jax.jit(lambda p, a, b: model.apply(p, a, b, method=CRFPRuntimeV18.encode))
    step0_fn = jax.jit(
        lambda p, a, xl, xh: model.apply(p, a, xl, xh, method=CRFPRuntimeV18.step0)
    )
    step_fn = jax.jit(
        lambda p, s, a, pa, xl, xh: model.apply(p, s, a, pa, xl, xh, method=CRFPRuntimeV18.step),
        donate_argnums=(1,),
    )

    dev = jax.devices()[0]
    if fused:
        from crfp_tpu.bench.profile import force_sync

        def frame(p, state, a, pa, f):
            x_lr, x_hr = model.apply(p, a, f, method=CRFPRuntimeV18.encode)
            return model.apply(p, state, a, pa, x_lr, x_hr,
                               method=CRFPRuntimeV18.step)

        frame_fn = jax.jit(frame, donate_argnums=(1,))

        def frame0(p, a, f):
            x_lr, x_hr = model.apply(p, a, f, method=CRFPRuntimeV18.encode)
            return model.apply(p, a, x_lr, x_hr, method=CRFPRuntimeV18.step0)

        frame0_fn = jax.jit(frame0)

        if emit_s2d:
            from crfp_tpu.ops.pallas.emit import emit_frame_nhwc

            # its OWN program, on purpose: in-step the Mosaic call rolls
            # back XLA's space-to-batch conv rewrites (docs/PERF.md)
            emit_fn = jax.jit(emit_frame_nhwc)
        else:
            emit_fn = lambda y: y  # noqa: E731

        def chain(n_reps):
            out = None
            for _ in range(n_reps):
                state, out = frame0_fn(params, lr, fv)
                out = emit_fn(out)
                for _ in range(t - 1):
                    (state, out) = frame_fn(params, state, lr, lr, fv)
                    out = emit_fn(out)
            return out

        force_sync(chain(max(1, warm_up)))
        timed_reps = max(1, repeat_time - warm_up)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            force_sync(chain(timed_reps))
            best = min(best, time.perf_counter() - t0)
        spf = best / (timed_reps * t)
        try:
            peak = dev.memory_stats().get("peak_bytes_in_use")
        except Exception:
            peak = None
        return BenchResult(
            preset=preset, warp_size=warp_size, sec_per_frame=spf,
            frames_per_sec=1.0 / spf, stage_seconds={}, peak_bytes=peak,
        )

    stage_times = {"flow": 0.0, "enc": 0.0, "step": 0.0}
    n_timed = 0
    total = 0.0

    out = None
    for rep in range(repeat_time):
        timed = rep >= warm_up
        rep_t0 = time.perf_counter()
        # per-stage measurement (flow is also inside step; measured alone
        # here to report the breakdown like CRFP_runtime.py:8654-8662)
        _, t_flow = _timed(flow_fn, params, lr, lr)
        (x_lr, x_hr), t_enc = _timed(enc_fn, params, lr, fv)
        state, _ = step0_fn(params, lr, x_lr, x_hr)
        t_steps = 0.0
        for _ in range(t - 1):
            (state, out), dt = _timed(step_fn, params, state, lr, lr, x_lr, x_hr)
            t_steps += dt
        from crfp_tpu.bench.profile import force_sync

        force_sync(out)
        if timed:
            total += time.perf_counter() - rep_t0
            stage_times["flow"] += t_flow
            stage_times["enc"] += t_enc
            stage_times["step"] += t_steps / (t - 1)
            n_timed += 1

    spf = total / (n_timed * t)
    stages = {k: v / n_timed for k, v in stage_times.items()}
    try:
        peak = dev.memory_stats().get("peak_bytes_in_use")
    except Exception:
        peak = None
    return BenchResult(
        preset=preset,
        warp_size=warp_size,
        sec_per_frame=spf,
        frames_per_sec=1.0 / spf,
        stage_seconds=stages,
        peak_bytes=peak,
    )

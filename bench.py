"""Headline benchmark: BOTH reference protocols on TPU, one JSON line.

Primary metric — the reference's own runtime latency protocol
(/root/reference/test_runtime.py:84-186, its headline benchmark): 1080p
output (LR 135x240), fovea 96x96, warp_size 720x720 ROI, t=5 frames per
rep, 30 reps with 10 warm-up, batch 1, MRCF_simple_v18 (split_ratio 3) —
here CRFPRuntimeV18, the same math (crfp_tpu/models/runtime.py).

Secondary metric (the "also" entry) — BASELINE.md's target row: 720p 8x
foveated SR streaming with NO ROI crop (warp = the whole 720x1280 frame),
the protocol BENCH_r01/r02 measured. Both are reported every round so the
series has no protocol discontinuity (VERDICT r3 weak-item 1).

Each frame is ONE jitted flow+encoders+step program; reps are enqueued
back-to-back and timed with a true device sync at the chain end
(jax.block_until_ready does not synchronize on the axon backend —
docs/PERF.md), so the ~28 ms tunnel dispatch floor is amortized exactly
as a streaming deployment would.

The model runs in the TPU-native inference configuration:
- gather-free windowed DCN (the Pallas interpolation-matrix kernel,
  crfp_tpu/ops/pallas/dcn.py) on the three 1/4-res alignment stages
  (displacements clamped to +-8 px), on the HR-level dcn_3 (shared-tap
  mode, +-32 px at 8x resolution — the same displacement budget), and on
  the HR state warp — exact up to the clamp (tests/test_pallas_dcn.py),
  the same bounded-support trade the reference's own runtime makes
  spatially with warp_size.
- the full-resolution tail in space-to-depth(4) layout (hr_s2d):
  numerically-exact kernel-rearranged convs at C=48-64 instead of C<=6,
  so TPU HBM tile padding stops inflating every HR pass
  (tests/test_models.py::test_hr_s2d_bit_equivalence_v18).
- per-cell anchored windows (dcn_anchor): each kernel grid cell's source
  window DMA starts at the cell's quantized mean displacement, so the
  halo covers only the residual spread — less stage-1 MXU work/DMA and a
  HIGHER effective displacement range (anchor±residual) for
  cell-coherent motion (tests/test_pallas_dcn.py::test_anchor*).
- bfloat16 weights/activations on the systolic array with f32
  accumulation (56 dB agreement with the f32 parity path;
  tests/test_bf16.py).
End-to-end deployment-config quality is gated in docs/DEPLOY.md; exact-f32
throughputs are reported in docs/PERF.md.

Prints ONE JSON line. vs_baseline is frames/sec divided by the 30 fps
real-time bar from BASELINE.md (the reference publishes no numbers).
"""

from __future__ import annotations

import json

_DEPLOY = dict(
    mid_channels=32,
    t=5,
    dcn_window=8,
    dcn_window_hr=32,
    bf16=True,
    hr_s2d=True,
    dcn_anchor=True,
    emit_s2d=True,
    fused=True,
)


def main() -> None:
    from crfp_tpu.bench.runtime import run_runtime_bench

    roi = run_runtime_bench(
        preset="1080p", warp_size=(720, 720), repeat_time=30, warm_up=10,
        **_DEPLOY,
    )
    full = run_runtime_bench(
        preset="720p", warp_size=(720, 1280), repeat_time=20, warm_up=5,
        **_DEPLOY,
    )
    # beyond-reference protocol: full-frame 1080p (the reference's only
    # 1080p path is the lossy warp_size crop, CRFP_runtime.py:8492)
    full1080 = run_runtime_bench(
        preset="1080p", warp_size=(1080, 1920), repeat_time=15, warm_up=5,
        **_DEPLOY,
    )

    fps = roi.frames_per_sec
    full_fps = full.frames_per_sec
    full1080_fps = full1080.frames_per_sec
    print(
        json.dumps(
            {
                "metric": "1080p_8x_foveated_sr_runtime_warp720",
                "value": round(fps, 3),
                "unit": "frames/sec/chip",
                "vs_baseline": round(fps / 30.0, 3),
                "also": [
                    {
                        "metric": "720p_8x_foveated_sr_streaming_fullframe",
                        "value": round(full_fps, 3),
                        "unit": "frames/sec/chip",
                        "vs_baseline": round(full_fps / 30.0, 3),
                    },
                    {
                        "metric": "1080p_8x_foveated_sr_streaming_fullframe",
                        "value": round(full1080_fps, 3),
                        "unit": "frames/sec/chip",
                        "vs_baseline": round(full1080_fps / 30.0, 3),
                    },
                ],
            }
        )
    )


if __name__ == "__main__":
    main()

"""Headline benchmark: 720p 8x foveated-SR streaming throughput per chip.

Protocol mirrors the reference latency harness
(/root/reference/test_runtime.py:84-99, 142-186): synthetic inputs,
batch 1, warm-up reps then averaged steady-state timing of the stateful
per-frame step (flow + encoders + 4 DCN stages + reconstruction).
Here: LR 90x160 -> 720x1280 output (720p), fovea 96x96.

The model runs in the TPU-native inference configuration:
- gather-free windowed DCN (the Pallas interpolation-matrix kernel,
  crfp_tpu/ops/pallas/dcn.py) on the three 1/4-res alignment stages
  (displacements clamped to +-8 px), on the HR-level dcn_3
  (shared-tap mode, +-32 px at 8x resolution — the same displacement
  budget), and on the HR state warp — exact up to the clamp
  (tests/test_pallas_dcn.py), the same bounded-support trade the
  reference's own runtime makes spatially with warp_size.
- the full-resolution tail in space-to-depth(4) layout (hr_s2d):
  bit-exact kernel-rearranged convs at C=48-64 instead of C<=6, so TPU
  HBM tile padding stops inflating every HR pass
  (tests/test_models.py::test_hr_s2d_bit_equivalence_v18).
- bfloat16 weights/activations on the systolic array with f32
  accumulation (56 dB agreement with the f32 parity path;
  tests/test_bf16.py).
Exact-f32 throughput is reported alongside in docs/PERF.md.

Prints ONE JSON line. vs_baseline is frames/sec divided by the 30 fps
real-time bar from BASELINE.md (the reference publishes no numbers).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    from crfp_tpu.models import CRFP, ModelConfig, StreamingRunner

    cfg = ModelConfig(variant="v18", mid_channels=32, dcn_window=8, dcn_window_hr=32,
                      hr_s2d=True)
    model = CRFP(cfg)
    h, w, s = 90, 160, cfg.scale
    rng = np.random.default_rng(0)

    lr = jnp.asarray(rng.uniform(0, 1, (1, h, w, 3)), jnp.float32)
    fv = jnp.asarray(rng.uniform(0, 1, (1, h * s, w * s, 3)), jnp.float32)
    mk = np.zeros((1, h * s, w * s, 1), np.float32)
    mk[:, 312:408, 592:688] = 1.0  # 96x96 fovea at center
    mk = jnp.asarray(mk)

    init_params = jax.jit(
        lambda k: model.init(k, lr[:, None], fv[:, None], mk[:, None])
    )
    params = init_params(jax.random.PRNGKey(0))

    from crfp_tpu.bench.profile import force_sync
    from crfp_tpu.utils.precision import cast_pytree

    params = cast_pytree(params, jnp.bfloat16)
    lr = lr.astype(jnp.bfloat16)
    fv = fv.astype(jnp.bfloat16)
    mk = mk.astype(jnp.bfloat16)

    runner = StreamingRunner(model, params)
    # warm-up: compile step0 + step, then settle.
    # NOTE: jax.block_until_ready does NOT synchronize on the axon remote
    # backend (docs/PERF.md); force_sync fetches one scalar of the result,
    # which is the only true barrier here.
    out = runner(lr, fv, mk)
    for _ in range(3):
        out = runner(lr, fv, mk)
    force_sync(out)

    # best-of-2 windows: the tunnel occasionally has degraded episodes.
    # 20 reps per synchronized chain amortize the ~28 ms dispatch+fetch
    # floor to ~1.4 ms/frame — steady-state streaming enqueues
    # continuously, so this is the honest deployment number.
    reps = 20
    dt = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = runner(lr, fv, mk)
        force_sync(out)
        dt = min(dt, (time.perf_counter() - t0) / reps)
    fps = 1.0 / dt

    print(
        json.dumps(
            {
                "metric": "720p_8x_foveated_sr_streaming",
                "value": round(fps, 3),
                "unit": "frames/sec/chip",
                "vs_baseline": round(fps / 30.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()

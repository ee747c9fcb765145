"""Streaming soak: 1000+ frames through the donated-buffer StreamingRunner
on the real chip (VERDICT r4 task 6).

The reference's deployment shape is indefinite streaming with
``clear_states()`` at clip boundaries
(/root/reference/model/CRFP_test.py:2110, test_video.py:477); round 4
tested the runner only at toy lengths. Here:

- 44 clips x 24 frames = 1056 frames stream back-to-back through ONE
  runner (donated state buffers),
- on sampled clips the streamed outputs must equal the batch ``scan``
  forward of the same clip under the same params — which simultaneously
  proves state-reset correctness (any leakage across the boundary breaks
  equality) and no numeric drift,
- device memory (bytes_in_use) and host RSS must not grow across the run.

The TPU tier runs it on the chip; the default CPU tier runs a shortened
version (4 clips) so the logic itself stays gated in CI.
"""

from __future__ import annotations

import os
import resource

import numpy as np
import pytest


def _clips(n_clips: int, t: int, h: int, w: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    s = 8
    for _ in range(n_clips):
        hr = rng.uniform(0, 1, (t, h * s, w * s, 3)).astype(np.float32)
        lr = hr.reshape(t, h, s, w, s, 3).mean((2, 4)).astype(np.float32)
        mk = np.zeros((t, h * s, w * s, 1), np.float32)
        y0 = int(rng.integers(0, h * s - 32))
        x0 = int(rng.integers(0, w * s - 32))
        mk[:, y0 : y0 + 32, x0 : x0 + 32] = 1.0
        yield lr, hr, mk


def _run_soak(n_clips: int, check_every: int):
    import jax
    import jax.numpy as jnp

    from crfp_tpu.models.crfp import CRFP, ModelConfig
    from crfp_tpu.models.streaming import StreamingRunner

    t, h, w = 24, 16, 24
    cfg = ModelConfig(variant="v18", mid_channels=16, remat=False)
    model = CRFP(cfg)
    lr0 = jnp.zeros((1, 2, h, w, 3))
    fv0 = jnp.zeros((1, 2, h * 8, w * 8, 3))
    mk0 = jnp.zeros((1, 2, h * 8, w * 8, 1))
    params = jax.jit(lambda k: model.init(k, lr0, fv0, mk0))(jax.random.PRNGKey(0))
    runner = StreamingRunner(model, params, donate=True)
    batch_fwd = jax.jit(lambda p, lr, fv, mk: model.apply(p, lr, fv, mk))

    dev = jax.devices()[0]

    def dev_bytes():
        try:
            return dev.memory_stats().get("bytes_in_use")
        except Exception:
            return None

    mem_after_warm = None
    rss_after_warm = None
    frames_done = 0
    for ci, (lr, hr, mk) in enumerate(_clips(n_clips, t, h, w)):
        runner.clear_states()
        outs = []
        keep = ci % check_every == 0
        for i in range(t):
            out = runner(
                jnp.asarray(lr[i][None]), jnp.asarray(hr[i][None]),
                jnp.asarray(mk[i][None]),
            )
            frames_done += 1
            if keep:
                outs.append(np.asarray(out))
        if keep:
            want = np.asarray(
                batch_fwd(params, jnp.asarray(lr[None]), jnp.asarray(hr[None]),
                          jnp.asarray(mk[None]))
            )
            got = np.concatenate(outs, axis=0)[None]
            np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)
        if ci == 1:  # after compile + first steady-state clip
            mem_after_warm = dev_bytes()
            rss_after_warm = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    mem_end = dev_bytes()
    rss_end = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    if mem_after_warm and mem_end:
        assert mem_end <= mem_after_warm * 1.05, (mem_after_warm, mem_end)
    # ru_maxrss is a high-water mark (KiB on linux); allow modest growth
    assert rss_end <= rss_after_warm + 256 * 1024, (rss_after_warm, rss_end)
    return frames_done


_TPU_TIER = bool(os.environ.get("CRFP_TPU_TESTS"))


@pytest.mark.tpu
@pytest.mark.skipif(not _TPU_TIER, reason="on-chip soak (CRFP_TPU_TESTS=1)")
def test_streaming_soak_on_chip():
    frames = _run_soak(n_clips=44, check_every=11)
    assert frames == 44 * 24  # 1056 > 1000


@pytest.mark.slow
@pytest.mark.skipif(_TPU_TIER, reason="covered by the on-chip soak")
def test_streaming_soak_short_cpu():
    frames = _run_soak(n_clips=4, check_every=2)
    assert frames == 4 * 24

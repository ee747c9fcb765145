"""Deploy-gate harness (crfp_tpu/bench/deploy_gate.py) at smoke scale:
the sigma-sweep 4-zone exact-vs-deploy comparison must run end-to-end
and stay inside a loose CPU-scale budget (the on-chip minted numbers
live in docs/DEPLOY.md). On this CPU backend the deploy path exercises
bf16 casting + the XLA windowed fallback; the Mosaic anchored kernels
are covered by the compiled TPU tier."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def test_deploy_gate_smoke_budget():
    from crfp_tpu.bench.deploy_gate import run_gate

    rows, extras = run_gate(
        "checkpoints/v18_mid16_procedural.npz",
        sigmas=(30.0,),
        lr_hw=(24, 32),
        frames=4,
        mid_channels=16,
        skip=2,
    )
    assert len(rows) == 4  # whole/fovea/outskirt/past for one sigma
    zones = [r.zone for r in rows]
    assert zones == ["whole", "fovea", "outskirt", "past"]
    for r in rows:
        assert np.isfinite(r.exact_psnr) and np.isfinite(r.deploy_psnr), r
        # CPU fallback path: windowed clamp + bf16 only — well under the
        # deployment budget at these tiny shapes
        assert abs(r.d_psnr) <= 0.05, (r.zone, r.d_psnr)
    assert extras["agree_db_min"] >= 40.0, extras

"""Capability-ablation harness smoke: all four rows stream, zones score,
deltas come out (tiny shapes, random-init checkpoints)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.mark.slow
def test_capability_rows_and_deltas(tmp_path):
    from crfp_tpu.bench.capability import run_capability
    from crfp_tpu.models.crfp import CRFP, ModelConfig
    from crfp_tpu.utils.params_io import save_params_npz

    mid = 8
    lr = jnp.zeros((1, 2, 16, 16, 3))
    fv = jnp.zeros((1, 2, 128, 128, 3))
    mk = jnp.zeros((1, 2, 128, 128, 1))
    ckpts = {}
    for name, kw in (
        ("v18", dict(variant="v18", dcn_window=8, dcn_window_hr=32)),
        ("no_dcn", dict(variant="no_dcn", hr_dcn=False)),
        ("basic_fvsr", dict(variant="basic_fvsr", hr_dcn=False, dcn_window=8)),
    ):
        model = CRFP(ModelConfig(mid_channels=mid, **kw))
        params = model.init(jax.random.PRNGKey(0), lr, fv, mk)
        path = os.path.join(str(tmp_path), f"{name}.npz")
        save_params_npz(params, path)
        ckpts[name] = path

    res = run_capability(ckpts, sigmas=(10.0,), hr_size=128, frames=4, mid=mid)
    rows = res["rows"]
    assert set(rows) == {"bicubic", "no_dcn", "basic_fvsr", "v18"}
    for r, per in rows.items():
        m = per["10"]
        for z in ("whole", "fovea", "outskirt", "past"):
            assert np.isfinite(m[f"psnr_{z}"]), (r, z, m)
            assert 0.0 <= m[f"ssim_{z}"] <= 1.0, (r, z, m)
    # bicubic on structured content is a sane baseline; random-init models
    # should lose to it — the trained runs flip these signs
    assert res["deltas"]["v18_vs_bicubic_whole_db"] < 0
    assert set(res["deltas"]) >= {
        "v18_vs_bicubic_whole_db", "v18_vs_no_dcn_whole_db",
        "v18_vs_basic_fvsr_fovea_db", "v18_vs_basic_fvsr_past_db",
    }

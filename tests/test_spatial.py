"""Spatial halo-exchange sharding: exactness vs unsharded conv on 8 devices."""

import jax
import jax.numpy as jnp
import numpy as np

from crfp_tpu.parallel import data_parallel_mesh
from crfp_tpu.parallel.spatial import halo_exchange, shard_frame_height, sharded_conv3x3


def test_sharded_conv_matches_unsharded():
    mesh = data_parallel_mesh(8)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 64, 32, 8)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 8, 16)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((16,)), jnp.float32)

    want = jax.lax.conv_general_dilated(
        x, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    ) + b

    xs = shard_frame_height(x, mesh)
    got = sharded_conv3x3(xs, k, b, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)


def test_halo_exchange_boundaries():
    mesh = data_parallel_mesh(8)
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    x = jnp.arange(16, dtype=jnp.float32).reshape(1, 16, 1, 1)

    fn = shard_map(
        lambda xb: halo_exchange(xb, 1, "data"),
        mesh=mesh,
        in_specs=P(None, "data", None, None),
        out_specs=P(None, "data", None, None),
    )
    out = np.asarray(fn(x))  # (1, 8 shards * (2 local + 2 halo), 1, 1)
    out = out.reshape(8, 4)
    # shard 0 top halo is the zero boundary; shard i>0 top halo = last row of shard i-1
    assert out[0, 0] == 0.0
    for i in range(1, 8):
        assert out[i, 0] == x[0, i * 2 - 1, 0, 0]
    # bottom halos: shard 7 sees the zero boundary
    assert out[7, 3] == 0.0
    for i in range(0, 7):
        assert out[i, 3] == x[0, (i + 1) * 2, 0, 0]


def test_spatial_streaming_matches_single():
    """Full-model height-sharded streaming (GSPMD) equals the unsharded
    runner frame-for-frame on the 8-device mesh."""
    from crfp_tpu.models import CRFP, ModelConfig
    from crfp_tpu.models.streaming import StreamingRunner
    from crfp_tpu.parallel.spatial import SpatialStreamingRunner

    mesh = data_parallel_mesh(8)
    cfg = ModelConfig(variant="v18", mid_channels=16)
    model = CRFP(cfg)
    rng = np.random.default_rng(0)
    h, w, s, t = 32, 16, 8, 3
    lrs = jnp.asarray(rng.uniform(0, 1, (t, 1, h, w, 3)), jnp.float32)
    fvs = jnp.asarray(rng.uniform(0, 1, (t, 1, h * s, w * s, 3)), jnp.float32)
    mks = jnp.asarray(
        rng.uniform(0, 1, (t, 1, h * s, w * s, 1)) > 0.5, jnp.float32)
    params = model.init(
        jax.random.PRNGKey(0), lrs.transpose(1, 0, 2, 3, 4),
        fvs.transpose(1, 0, 2, 3, 4), mks.transpose(1, 0, 2, 3, 4))

    single = StreamingRunner(model, params, donate=False)
    sharded = SpatialStreamingRunner(model, params, mesh)
    for i in range(t):
        want = np.asarray(single(lrs[i], fvs[i], mks[i]))
        got = np.asarray(sharded(lrs[i], fvs[i], mks[i]))
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_initialize_distributed_single_process_noop():
    # without coordinator env the bring-up must be a no-op returning False
    import os

    from crfp_tpu.parallel import global_mesh, initialize_distributed

    for k in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS"):
        assert not os.environ.get(k), f"test assumes {k} unset"
    assert initialize_distributed() is False
    mesh = global_mesh()
    assert mesh.devices.size == jax.device_count()
    assert mesh.axis_names == ("data",)

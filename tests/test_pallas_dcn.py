"""Pallas windowed-DCN kernel vs the exact gather formulation.

Runs in interpret mode on the CPU test mesh; the Mosaic-compiled path is
exercised on the real chip by the benchmarks (docs/PERF.md). Oracle: the
exact gather op (itself oracle-tested against a numpy loop and torchvision
``deform_conv2d`` in tests/test_ops_dcn.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crfp_tpu.ops.dcn import deform_conv2d
from crfp_tpu.ops.dcn_windowed import deform_conv2d_windowed
from crfp_tpu.ops.pallas.dcn import deform_conv2d_pallas


@pytest.mark.parametrize("g,c,o", [(4, 16, 24), (1, 4, 4), (8, 32, 32)])
def test_pallas_matches_gather_within_window(g, c, o):
    rng = np.random.default_rng(0)
    n, h, w = 2, 19, 27  # deliberately not multiples of band/xtile
    x = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)
    off = jnp.asarray(rng.uniform(-6, 6, (n, h, w, g, 9, 2)), jnp.float32)
    mk = jnp.asarray(rng.uniform(0, 1, (n, h, w, g, 9)), jnp.float32)
    wt = jnp.asarray(rng.standard_normal((3, 3, c, o)) * 0.2, jnp.float32)
    b = jnp.asarray(rng.standard_normal((o,)), jnp.float32)

    want = np.asarray(deform_conv2d(x, off, mk, wt, b))
    got = np.asarray(
        deform_conv2d_pallas(x, off, mk, wt, b, max_displacement=8, interpret=True)
    )
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)


def test_pallas_clamps_beyond_window_like_xla_windowed():
    rng = np.random.default_rng(1)
    n, h, w, c, g = 1, 16, 24, 8, 2
    x = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)
    off = jnp.asarray(rng.uniform(-20, 20, (n, h, w, g, 9, 2)), jnp.float32)
    mk = jnp.asarray(rng.uniform(0, 1, (n, h, w, g, 9)), jnp.float32)
    wt = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.2, jnp.float32)

    want = np.asarray(deform_conv2d_windowed(x, off, mk, wt, None, max_displacement=4))
    got = np.asarray(
        deform_conv2d_pallas(x, off, mk, wt, None, max_displacement=4, interpret=True)
    )
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)


def test_pallas_identity_init():
    # zero offsets + identity weight + unit mask ==> output == input
    # (guaranteed by the reference's DCN init, /root/reference/model/CRFP.py:354-370)
    rng = np.random.default_rng(2)
    n, h, w, c = 1, 16, 16, 8
    x = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)
    off = jnp.zeros((n, h, w, 1, 9, 2), jnp.float32)
    mk = jnp.ones((n, h, w, 1, 9), jnp.float32)
    wt = jnp.zeros((3, 3, c, c), jnp.float32).at[1, 1].set(jnp.eye(c))
    got = np.asarray(
        deform_conv2d_pallas(x, off, mk, wt, None, max_displacement=4, interpret=True)
    )
    np.testing.assert_allclose(got, np.asarray(x), atol=1e-6)


def test_pallas_shared_offset_repeat_mode():
    # the HR dcn_3 broadcast: one (dy, dx) per pixel repeated to all taps
    rng = np.random.default_rng(3)
    n, h, w, c = 1, 24, 32, 4
    x = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)
    shared = jnp.asarray(rng.uniform(-5, 5, (n, h, w, 1, 1, 2)), jnp.float32)
    off = jnp.broadcast_to(shared, (n, h, w, 1, 9, 2))
    mk = jnp.asarray(rng.uniform(0, 1, (n, h, w, 1, 9)), jnp.float32)
    wt = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.2, jnp.float32)

    from crfp_tpu.ops.dcn import deform_conv2d_shared_offset

    want = np.asarray(
        deform_conv2d_shared_offset(x, shared[:, :, :, 0, 0, :], mk[:, :, :, 0, :], wt, None)
    )
    got = np.asarray(
        deform_conv2d_pallas(x, off, mk, wt, None, max_displacement=8, interpret=True)
    )
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)


def test_pallas_bf16_tracks_f32():
    rng = np.random.default_rng(4)
    n, h, w, c = 1, 16, 24, 8
    x = rng.standard_normal((n, h, w, c)).astype(np.float32)
    off = rng.uniform(-3, 3, (n, h, w, 2, 9, 2)).astype(np.float32)
    mk = rng.uniform(0, 1, (n, h, w, 2, 9)).astype(np.float32)
    wt = (rng.standard_normal((3, 3, c, c)) * 0.2).astype(np.float32)

    f32 = np.asarray(
        deform_conv2d_pallas(
            jnp.asarray(x), jnp.asarray(off), jnp.asarray(mk), jnp.asarray(wt),
            None, max_displacement=4, interpret=True,
        )
    )
    bf = np.asarray(
        deform_conv2d_pallas(
            jnp.asarray(x, jnp.bfloat16), jnp.asarray(off), jnp.asarray(mk),
            jnp.asarray(wt, jnp.bfloat16), None, max_displacement=4, interpret=True,
        ),
        np.float32,
    )
    assert np.abs(bf - f32).max() < 0.15
    assert np.abs(bf - f32).mean() < 0.02


def test_pallas_vjp_matches_xla_windowed_grads():
    # Pallas forward + custom VJP (backward = vjp of the XLA windowed op)
    # must produce the same gradients as autodiff of the XLA windowed op
    from crfp_tpu.ops.pallas.dcn import deform_conv2d_pallas_vjp

    rng = np.random.default_rng(5)
    n, h, w, c, g = 1, 12, 16, 8, 2
    x = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)
    off = jnp.asarray(rng.uniform(-3, 3, (n, h, w, g, 9, 2)), jnp.float32)
    mk = jnp.asarray(rng.uniform(0.2, 0.8, (n, h, w, g, 9)), jnp.float32)
    wt = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.2, jnp.float32)
    b = jnp.asarray(rng.standard_normal((c,)), jnp.float32)
    tgt = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)

    def loss_pallas(x, off, mk, wt, b):
        y = deform_conv2d_pallas_vjp(
            x, off, mk, wt, b, max_displacement=4, interpret=True
        )
        return jnp.sum((y - tgt) ** 2)

    def loss_xla(x, off, mk, wt, b):
        y = deform_conv2d_windowed(x, off, mk, wt, b, max_displacement=4)
        return jnp.sum((y - tgt) ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3, 4))(x, off, mk, wt, b)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2, 3, 4))(x, off, mk, wt, b)
    for a, b_, name in zip(gp, gx, ["x", "offset", "mask", "weight", "bias"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=1e-3, rtol=1e-3, err_msg=name
        )


def test_pallas_windowed_warp_matches_clipped_gather_warp():
    from crfp_tpu.ops.pallas.warp import flow_warp_windowed_pallas
    from crfp_tpu.ops.warp import flow_warp

    rng = np.random.default_rng(6)
    n, h, w, c = 1, 20, 28, 4
    x = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)
    flow = jnp.asarray(rng.uniform(-12, 12, (n, h, w, 2)), jnp.float32)

    # clamping displacements == clamping the flow itself for a plain warp
    want = np.asarray(flow_warp(x, jnp.clip(flow, -8, 8)))
    got = np.asarray(
        flow_warp_windowed_pallas(x, flow, max_displacement=8, interpret=True)
    )
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)


def test_flow_warp_maybe_windowed_dispatch():
    from crfp_tpu.ops.pallas.warp import flow_warp_maybe_windowed
    from crfp_tpu.ops.warp import flow_warp

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((1, 12, 16, 4)), jnp.float32)
    flow = jnp.asarray(rng.uniform(-3, 3, (1, 12, 16, 2)), jnp.float32)
    # window None == exact warp; small flows within window == exact warp
    np.testing.assert_allclose(
        np.asarray(flow_warp_maybe_windowed(x, flow, None)),
        np.asarray(flow_warp(x, flow)),
    )
    np.testing.assert_allclose(
        np.asarray(flow_warp_maybe_windowed(x, flow, 8)),
        np.asarray(flow_warp(x, flow)),
        atol=2e-6,
    )


def test_pallas_shared_taps_mode():
    # shared_taps=True with (N,H,W,G,1,2) offsets == broadcast offsets
    rng = np.random.default_rng(8)
    n, h, w, c = 1, 24, 32, 4
    x = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)
    shared = jnp.asarray(rng.uniform(-5, 5, (n, h, w, 1, 1, 2)), jnp.float32)
    mk = jnp.asarray(rng.uniform(0, 1, (n, h, w, 1, 9)), jnp.float32)
    wt = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.2, jnp.float32)

    want = np.asarray(
        deform_conv2d_pallas(
            x, jnp.broadcast_to(shared, (n, h, w, 1, 9, 2)), mk, wt, None,
            max_displacement=8, interpret=True,
        )
    )
    got = np.asarray(
        deform_conv2d_pallas(
            x, shared, mk, wt, None,
            max_displacement=8, shared_taps=True, interpret=True,
        )
    )
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)


@pytest.mark.parametrize("r", [2, 4])
def test_pallas_s2d_nonshared_matches_native(r):
    # the lv3_s2d trunk path: non-repeat (per-tap offsets/masks) with every
    # operand and the output in space-to-depth(r) layout
    from crfp_tpu.ops.shuffle import pixel_shuffle, pixel_unshuffle

    rng = np.random.default_rng(11)
    n, h, w, c, g, o = 1, 16, 24, 8, 4, 8
    x = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)
    off = jnp.asarray(rng.uniform(-6, 6, (n, h, w, g, 9, 2)), jnp.float32)
    mk = jnp.asarray(rng.uniform(0, 1, (n, h, w, g, 9)), jnp.float32)
    wt = jnp.asarray(rng.standard_normal((3, 3, c, o)) * 0.2, jnp.float32)
    b = jnp.asarray(rng.standard_normal((o,)), jnp.float32)

    want = np.asarray(
        deform_conv2d_pallas(x, off, mk, wt, b, max_displacement=8,
                             interpret=True))

    r2 = r * r
    hs, ws = h // r, w // r
    x_s = pixel_unshuffle(x, r)
    # (n,h,w,g,9,2) -> s2d: pixel_unshuffle is c-major (channel = c*r2 +
    # phase), so the flattened (g,k2,2) fields stay major, phase minor
    off_s = pixel_unshuffle(off.reshape(n, h, w, -1), r).reshape(
        n, hs, ws, g, 9, 2, r2)
    mk_s = pixel_unshuffle(mk.reshape(n, h, w, -1), r).reshape(
        n, hs, ws, g, 9, r2)
    got_s = deform_conv2d_pallas(x_s, off_s, mk_s, wt, b, max_displacement=8,
                                 s2d=r, interpret=True)
    got = np.asarray(pixel_shuffle(got_s, r))
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)


# ---- anchored windows (docs/PERF.md lever 2) ----

def test_pallas_anchored_uniform_beyond_window_is_exact():
    # uniform motion LARGER than ±D stays exact under anchoring: the
    # per-cell window follows the quantized mean displacement, so only
    # the residual must fit the (>=12 px) local window
    rng = np.random.default_rng(20)
    n, h, w, c, g = 1, 19, 27, 8, 2
    x = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)
    base = jnp.asarray([14.3, -11.7], jnp.float32)  # |dy| > D=8
    off = base + jnp.asarray(rng.uniform(-2, 2, (n, h, w, g, 9, 2)), jnp.float32)
    mk = jnp.asarray(rng.uniform(0, 1, (n, h, w, g, 9)), jnp.float32)
    wt = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.2, jnp.float32)

    want = np.asarray(deform_conv2d(x, off, mk, wt, None))
    got = np.asarray(
        deform_conv2d_pallas(x, off, mk, wt, None, max_displacement=8,
                             anchor=True, interpret=True))
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)


def test_pallas_anchored_small_offsets_match_gather():
    # near-zero cell means -> anchors quantize to 0 -> behaves like the
    # plain window (and the residual window is at least as wide)
    rng = np.random.default_rng(21)
    n, h, w, c, g = 2, 16, 24, 8, 2
    x = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)
    off = jnp.asarray(rng.uniform(-6, 6, (n, h, w, g, 9, 2)), jnp.float32)
    mk = jnp.asarray(rng.uniform(0, 1, (n, h, w, g, 9)), jnp.float32)
    wt = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.2, jnp.float32)

    want = np.asarray(deform_conv2d(x, off, mk, wt, None))
    got = np.asarray(
        deform_conv2d_pallas(x, off, mk, wt, None, max_displacement=8,
                             anchor=True, interpret=True))
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)


def test_pallas_anchored_shared_s2d_matches_oracle():
    # the HR dcn_3 deployment shape: shared taps + shared mask + s2d(4)
    # operands + anchored windows, uniform motion beyond ±D
    from crfp_tpu.ops.dcn import deform_conv2d_shared_offset
    from crfp_tpu.ops.shuffle import pixel_shuffle, pixel_unshuffle

    rng = np.random.default_rng(22)
    n, h, w, c, r = 1, 24, 32, 4, 4
    r2 = r * r
    x = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)
    base = jnp.asarray([10.5, -9.25], jnp.float32)
    shared = base + jnp.asarray(rng.uniform(-1.5, 1.5, (n, h, w, 1, 1, 2)),
                                jnp.float32)
    mk1 = jnp.asarray(rng.uniform(0, 1, (n, h, w, 1, 1)), jnp.float32)
    wt = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.2, jnp.float32)

    want = np.asarray(
        deform_conv2d_shared_offset(
            x, shared[:, :, :, 0, 0, :],
            jnp.broadcast_to(mk1[..., 0][..., None], (n, h, w, 1, 9))[:, :, :, 0, :],
            wt, None))

    hs, ws = h // r, w // r
    x_s = pixel_unshuffle(x, r)
    off_s = pixel_unshuffle(shared.reshape(n, h, w, 2), r).reshape(
        n, hs, ws, 1, 1, 2, r2)
    mk_s = pixel_unshuffle(mk1.reshape(n, h, w, 1), r).reshape(
        n, hs, ws, 1, 1, r2)
    got = np.asarray(pixel_shuffle(
        deform_conv2d_pallas(x_s, off_s, mk_s, wt, None, max_displacement=8,
                             shared_taps=True, shared_mask=True, s2d=r,
                             anchor=True, interpret=True), r))
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)


def test_pallas_anchored_warp_beyond_window_is_exact():
    from crfp_tpu.ops.warp import flow_warp

    rng = np.random.default_rng(23)
    n, h, w, c = 1, 24, 32, 4
    x = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)
    flow = jnp.asarray([13.0, -10.0], jnp.float32) + jnp.asarray(
        rng.uniform(-2, 2, (n, h, w, 2)), jnp.float32)
    off = jnp.stack([flow[..., 1], flow[..., 0]], -1).reshape(n, h, w, 1, 1, 2)
    eye = jnp.eye(c, dtype=x.dtype).reshape(1, 1, c, c)

    want = np.asarray(flow_warp(x, flow))  # NO clipping: exact beyond ±D
    got = np.asarray(
        deform_conv2d_pallas(x, off, None, eye, None, max_displacement=8,
                             anchor=True, interpret=True))
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)


def test_pallas_anchored_refuses_grad_without_anchor_vjp():
    # the pure-inference anchored path (anchor_vjp=False) attaches no
    # VJP, so differentiation must raise instead of silently mixing
    # geometries — opt into anchored training with anchor_vjp=True
    from crfp_tpu.ops.pallas.dcn import deform_conv2d_pallas_vjp

    rng = np.random.default_rng(24)
    n, h, w, c = 1, 8, 8, 4
    x = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)
    off = jnp.asarray(rng.uniform(-2, 2, (n, h, w, 1, 9, 2)), jnp.float32)
    mk = jnp.asarray(rng.uniform(0, 1, (n, h, w, 1, 9)), jnp.float32)
    wt = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.2, jnp.float32)

    def loss(x):
        return jnp.sum(deform_conv2d_pallas_vjp(
            x, off, mk, wt, None, max_displacement=8, anchor=True,
            interpret=True) ** 2)

    with pytest.raises(Exception):
        jax.grad(loss)(x)


def _anchor_mirror_geom(d, cpg, pad, sub_tile=8):
    """The anchored kernel's quantization constants (mirror of the prep
    formulas in crfp_tpu/ops/pallas/dcn.py)."""
    import math

    def round_up(v, m):
        return -(-v // m) * m

    lane_q = 128 // math.gcd(cpg, 128)
    a_y = round_up(d, sub_tile)
    a_x = round_up(d, lane_q)
    dl_r = float(max(12, sub_tile // 2 + 8))
    dl_c = float(max(12, lane_q // 2 + 8))
    halo_r = round_up(int(dl_r) + pad + 2, sub_tile // 2)
    halo_c = round_up(int(dl_c) + pad + 2, max(1, lane_q // 2))
    return lane_q, a_y, a_x, float(halo_r - pad - 2), float(halo_c - pad - 2)


def test_pallas_anchored_grads_match_effective_offset_mirror():
    # anchor_vjp=True: the anchored Mosaic backward (window DMAs follow
    # the starts table; extended dwin blocks) must produce the gradients
    # of the effective-offset math: eff = anchor + clip(off - anchor, dl)
    from crfp_tpu.ops.pallas.dcn import (_anchored_effective_offsets,
                                         deform_conv2d_pallas_vjp)

    rng = np.random.default_rng(30)
    n, h, w, c, g = 1, 19, 27, 8, 2
    x = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)
    base = jnp.asarray([14.3, -11.7], jnp.float32)  # beyond D=8
    off = base + jnp.asarray(rng.uniform(-2, 2, (n, h, w, g, 9, 2)), jnp.float32)
    mk = jnp.asarray(rng.uniform(0, 1, (n, h, w, g, 9)), jnp.float32)
    wt = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.2, jnp.float32)

    def loss_pallas(x, off, mk, wt):
        return jnp.sum(deform_conv2d_pallas_vjp(
            x, off, mk, wt, None, max_displacement=8, anchor=True,
            anchor_vjp=True, interpret=True) ** 2)

    got = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(x, off, mk, wt)

    lane_q, a_y, a_x, dl_r, dl_c = _anchor_mirror_geom(8, c // g, 1)

    def loss_mirror(x, off, mk, wt):
        # resolved geometry for this call: f32 -> band 8; xtile 32
        eff = _anchored_effective_offsets(off, 8, 32, 8, lane_q, a_y, a_x,
                                          dl_r, dl_c)
        return jnp.sum(deform_conv2d(x, eff, mk, wt, None) ** 2)

    want = jax.grad(loss_mirror, argnums=(0, 1, 2, 3))(x, off, mk, wt)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=1e-4)


def test_pallas_anchored_grads_fallback_geometry():
    # huge-halo geometry (D=64, cpg=64 -> lane_q=2): the Pallas backward
    # exceeds scoped VMEM and the op must degrade to the geometry-mirrored
    # XLA effective-offset backward — gradients still match the mirror
    from crfp_tpu.ops.pallas.dcn import (_anchored_effective_offsets,
                                         deform_conv2d_pallas_vjp)
    from crfp_tpu.ops.warp import flow_warp

    rng = np.random.default_rng(31)
    n, h, w, c = 1, 16, 16, 64
    x = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)
    flow = jnp.asarray(rng.uniform(-40, 40, (n, h, w, 2)), jnp.float32)
    off = jnp.stack([flow[..., 1], flow[..., 0]], -1).reshape(n, h, w, 1, 1, 2)
    eye = jnp.eye(c, dtype=x.dtype).reshape(1, 1, c, c)

    def loss_w(x, off):
        return jnp.sum(deform_conv2d_pallas_vjp(
            x, off, None, eye, None, max_displacement=64, band=8, xtile=8,
            anchor=True, anchor_vjp=True, interpret=True) ** 2)

    got = jax.grad(loss_w, argnums=(0, 1))(x, off)

    lane_q, a_y, a_x, dl_r, dl_c = _anchor_mirror_geom(64, c, 0)

    def loss_m(x, off):
        # floor geometry: band 8, xtile 16 (xstep = lcm(2, 16))
        eff = _anchored_effective_offsets(off, 8, 16, 8, lane_q, a_y, a_x,
                                          dl_r, dl_c)
        mk = jnp.ones(off.shape[:-1], jnp.float32)
        return jnp.sum(deform_conv2d(x, eff, mk, eye, None) ** 2)

    want = jax.grad(loss_m, argnums=(0, 1))(x, off)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-3, rtol=1e-4)


def test_fusedprep_matches_structured_and_oracle():
    """The fused-prep variant (dense head-output operands, in-kernel query
    build — ops/pallas/dcn.py round-3 experiment) is the same math as the
    structured kernel up to f32 reassociation."""
    from crfp_tpu.ops.pallas.dcn import deform_conv2d_pallas_fusedprep

    rng = np.random.default_rng(7)
    n, h, w, c, g, o = 1, 19, 27, 16, 4, 24
    k2 = 9
    d = 6
    x = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)
    offc = jnp.clip(
        jnp.asarray(rng.uniform(-9, 9, (n, h, w, g * k2 * 2)), jnp.float32),
        -d, d)
    mskc = jnp.asarray(rng.uniform(0, 1, (n, h, w, g * k2)), jnp.float32)
    wt = jnp.asarray(rng.standard_normal((3, 3, c, o)) * 0.2, jnp.float32)
    b = jnp.asarray(rng.standard_normal((o,)), jnp.float32)

    got = np.asarray(deform_conv2d_pallas_fusedprep(
        x, offc, mskc, wt, b, max_displacement=d, band=8, xtile=32,
        interpret=True))
    structured = np.asarray(deform_conv2d_pallas(
        x, offc.reshape(n, h, w, g, k2, 2), mskc.reshape(n, h, w, g, k2),
        wt, b, max_displacement=d, band=8, xtile=32, interpret=True))
    oracle = np.asarray(deform_conv2d(
        x, offc.reshape(n, h, w, g, k2, 2), mskc.reshape(n, h, w, g, k2),
        wt, b))
    np.testing.assert_allclose(got, structured, atol=5e-5, rtol=1e-4)
    np.testing.assert_allclose(got, oracle, atol=5e-5, rtol=1e-4)


def test_fusedprep_model_dispatch_parity():
    """dcn_fused is a pure dispatch knob: off-TPU the model must produce
    exactly the structured path's output (the flag is ignored), and the
    param tree must be identical so checkpoints stay interchangeable."""
    from crfp_tpu.models import CRFP, ModelConfig

    rng = np.random.default_rng(3)
    kw = dict(variant="v18", mid_channels=16, dcn_window=4)
    m0 = CRFP(ModelConfig(**kw))
    m1 = CRFP(ModelConfig(**kw, dcn_fused=True))
    b, t, h, w, s = 1, 2, 8, 8, 8
    lrs = jnp.asarray(rng.uniform(0, 1, (b, t, h, w, 3)), jnp.float32)
    fvs = jnp.asarray(rng.uniform(0, 1, (b, t, h * s, w * s, 3)), jnp.float32)
    mks = jnp.asarray(rng.uniform(0, 1, (b, t, h * s, w * s, 1)) > 0.5,
                      jnp.float32)
    p0 = m0.init(jax.random.PRNGKey(0), lrs, fvs, mks)
    p1 = m1.init(jax.random.PRNGKey(0), lrs, fvs, mks)
    assert jax.tree.structure(p0) == jax.tree.structure(p1)
    out0 = m0.apply(p0, lrs, fvs, mks)
    out1 = m1.apply(p0, lrs, fvs, mks)
    np.testing.assert_array_equal(np.asarray(out0), np.asarray(out1))

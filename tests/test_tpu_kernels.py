"""Compiled-Mosaic correctness tier: runs on the REAL TPU chip.

Interpret-mode tests (tests/test_pallas_dcn.py) validate the kernel math
but cannot catch Mosaic lowering/layout regressions — this repo has a
real history of exactly such surprises (bf16 one-hot builds crashing the
remote compiler, f32 scoped-vmem OOM; crfp_tpu/ops/pallas/dcn.py NOTES).
This tier compiles the shipped kernels on the chip and gates them against
the exact gather oracle, per VERDICT round-2 task 3.

Run via the verify path:  CRFP_TPU_TESTS=1 pytest tests -m tpu -q
(The default CPU-tier run skips these; the CPU run's conftest forces the
virtual 8-device CPU mesh, so the two tiers never mix.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.tpu

requires_tpu = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="no TPU backend in this run"
)


def _case(dtype, shared, shape=(1, 64, 96, 32), groups=8, d=8, seed=0):
    rng = np.random.default_rng(seed)
    n, h, w, c = shape
    k2 = 9
    koff = 1 if shared else k2
    x = jnp.asarray(rng.standard_normal(shape), dtype)
    off = jnp.asarray(rng.uniform(-d * 0.9, d * 0.9, (n, h, w, groups, koff, 2)), jnp.float32)
    mask = jnp.asarray(rng.uniform(0, 1, (n, h, w, groups, k2)), jnp.float32)
    wgt = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.1, dtype)
    return x, off, mask, wgt


def _oracle(x, off, mask, wgt, shared):
    from crfp_tpu.ops.dcn import deform_conv2d

    k2 = 9
    if shared:
        off = jnp.broadcast_to(off, off.shape[:4] + (k2, 2))
    f = jax.jit(lambda *a: deform_conv2d(*a, None))
    return f(x.astype(jnp.float32), off, mask, wgt.astype(jnp.float32))


@requires_tpu
@pytest.mark.parametrize(
    "dtype,shared,tol",
    [
        (jnp.float32, False, 2e-5),
        (jnp.bfloat16, False, 5e-2),
        (jnp.float32, True, 2e-5),
        (jnp.bfloat16, True, 5e-2),
    ],
    ids=["f32", "bf16", "f32-shared", "bf16-shared"],
)
def test_compiled_kernel_vs_gather_oracle(dtype, shared, tol):
    from crfp_tpu.ops.pallas.dcn import deform_conv2d_pallas

    g = 1 if shared else 8
    x, off, mask, wgt = _case(dtype, shared, groups=g)
    if shared:
        mask = mask[:, :, :, :, :1]
    f = jax.jit(
        lambda *a: deform_conv2d_pallas(
            *a, max_displacement=8, shared_taps=shared, shared_mask=shared
        )
    )
    out = f(x, off, mask, wgt)
    if shared:
        mask = jnp.broadcast_to(mask, mask.shape[:4] + (9,))
    ref = _oracle(x, off, mask, wgt, shared)
    err = float(jnp.abs(out.astype(jnp.float32) - ref).max())
    assert err <= tol, err


@requires_tpu
def test_compiled_identity_exact():
    """Zero offsets + unit mask + identity center-tap weight == input,
    bit-exactly (the reference's DCN identity-init contract,
    /root/reference/model/CRFP.py:354-370)."""
    from crfp_tpu.ops.pallas.dcn import deform_conv2d_pallas

    n, h, w, c = 1, 64, 96, 32
    x = jnp.asarray(np.random.default_rng(1).standard_normal((n, h, w, c)), jnp.float32)
    off = jnp.zeros((n, h, w, 8, 9, 2), jnp.float32)
    mask = jnp.ones((n, h, w, 8, 9), jnp.float32)
    wgt = jnp.zeros((3, 3, c, c), jnp.float32).at[1, 1, jnp.arange(c), jnp.arange(c)].set(1.0)
    out = jax.jit(lambda *a: deform_conv2d_pallas(*a, max_displacement=8))(x, off, mask, wgt)
    assert float(jnp.abs(out - x).max()) == 0.0


@requires_tpu
def test_compiled_s2d_layout_matches_logical():
    """The s2d(4) operand layout is pure relayout: compiled outputs agree
    with the logical-layout kernel to float-reassociation noise."""
    from crfp_tpu.ops.pallas.dcn import deform_conv2d_pallas
    from crfp_tpu.ops.shuffle import pixel_shuffle, pixel_unshuffle

    n, h, w, c, d, r = 1, 64, 64, 4, 8, 4
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)
    off = jnp.asarray(rng.uniform(-d, d, (n, h, w, 1, 1, 2)), jnp.float32)
    mask = jnp.asarray(rng.uniform(0, 1, (n, h, w, 1, 1)), jnp.float32)
    wgt = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.1, jnp.float32)

    ref = jax.jit(
        lambda *a: deform_conv2d_pallas(
            *a, max_displacement=d, shared_taps=True, shared_mask=True)
    )(x, off, mask, wgt)

    xs = pixel_unshuffle(x, r)
    offs = pixel_unshuffle(off.reshape(n, h, w, 2), r).reshape(n, h // r, w // r, 1, 1, 2, r * r)
    masks = pixel_unshuffle(mask.reshape(n, h, w, 1), r).reshape(n, h // r, w // r, 1, 1, r * r)
    out = jax.jit(
        lambda *a: deform_conv2d_pallas(
            *a, max_displacement=d, shared_taps=True, shared_mask=True, s2d=r)
    )(xs, offs, masks, wgt)
    err = float(jnp.abs(pixel_shuffle(out, r) - ref).max())
    assert err <= 1e-5, err


@requires_tpu
def test_compiled_vjp_grads_match_xla_windowed():
    """The custom-VJP kernel's gradients (compiled forward) equal the XLA
    windowed formulation's gradients."""
    from crfp_tpu.ops.dcn_windowed import deform_conv2d_windowed
    from crfp_tpu.ops.pallas.dcn import deform_conv2d_pallas_vjp

    x, off, mask, wgt = _case(jnp.float32, False, shape=(1, 32, 32, 8), groups=2)
    bias = jnp.zeros((8,), jnp.float32)

    def loss_pallas(x, off, mask, wgt):
        o = deform_conv2d_pallas_vjp(x, off, mask, wgt, bias, max_displacement=8)
        return (o * o).sum()

    def loss_xla(x, off, mask, wgt):
        o = deform_conv2d_windowed(x, off, mask, wgt, bias, max_displacement=8)
        return (o * o).sum()

    gp = jax.jit(jax.grad(loss_pallas, argnums=(0, 1, 3)))(x, off, mask, wgt)
    gx = jax.jit(jax.grad(loss_xla, argnums=(0, 1, 3)))(x, off, mask, wgt)
    for a, b, name in zip(gp, gx, ("x", "offset", "weight")):
        err = float(jnp.abs(a - b).max())
        rel = err / (float(jnp.abs(b).max()) + 1e-6)
        assert rel <= 2e-4, (name, err, rel)


@requires_tpu
def test_compiled_windowed_warp_matches_clipped_gather():
    from crfp_tpu.ops.pallas.warp import flow_warp_windowed_pallas
    from crfp_tpu.ops.warp import flow_warp

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 64, 128, 4)), jnp.float32)
    flow = jnp.asarray(rng.uniform(-30, 30, (1, 64, 128, 2)), jnp.float32)
    out = jax.jit(lambda a, f: flow_warp_windowed_pallas(a, f, max_displacement=16))(x, flow)
    ref = jax.jit(lambda a, f: flow_warp(a, jnp.clip(f, -16.0, 16.0)))(x, flow)
    err = float(jnp.abs(out - ref).max())
    # two-stage (row-then-column) interpolation reassociates the f32
    # bilinear arithmetic vs the gather path's fused form
    assert err <= 5e-5, err


@requires_tpu
@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 2e-5), (jnp.bfloat16, 5e-2)],
                         ids=["f32", "bf16"])
def test_compiled_s2d2_nonshared_matches_logical(dtype, tol):
    """The lv3_s2d trunk path: non-repeat per-tap operands in s2d(2)
    layout — compiled kernel vs the logical-layout compiled kernel."""
    from crfp_tpu.ops.pallas.dcn import deform_conv2d_pallas
    from crfp_tpu.ops.shuffle import pixel_shuffle, pixel_unshuffle

    n, h, w, c, g, d, r = 1, 64, 96, 32, 8, 8, 2
    r2 = r * r
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((n, h, w, c)), dtype)
    off = jnp.asarray(rng.uniform(-d, d, (n, h, w, g, 9, 2)), jnp.float32)
    mask = jnp.asarray(rng.uniform(0, 1, (n, h, w, g, 9)), jnp.float32)
    wgt = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.1, dtype)

    ref = jax.jit(lambda *a: deform_conv2d_pallas(*a, max_displacement=d))(
        x, off, mask, wgt)

    xs = pixel_unshuffle(x, r)
    hs, ws = h // r, w // r
    offs = pixel_unshuffle(off.reshape(n, h, w, -1), r).reshape(
        n, hs, ws, g, 9, 2, r2)
    masks = pixel_unshuffle(mask.reshape(n, h, w, -1), r).reshape(
        n, hs, ws, g, 9, r2)
    out = jax.jit(
        lambda *a: deform_conv2d_pallas(*a, max_displacement=d, s2d=r, band=32)
    )(xs, offs, masks, wgt)
    err = float(jnp.abs(
        pixel_shuffle(out, r).astype(jnp.float32) - ref.astype(jnp.float32)
    ).max())
    assert err <= tol, err


@requires_tpu
@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 5e-5), (jnp.bfloat16, 5e-2)],
                         ids=["f32", "bf16"])
def test_compiled_anchored_uniform_beyond_window(dtype, tol):
    """Anchored windows compiled on-chip: uniform motion beyond ±D stays
    exact vs the unclipped gather oracle (docs/PERF.md lever 2)."""
    from crfp_tpu.ops.dcn import deform_conv2d
    from crfp_tpu.ops.pallas.dcn import deform_conv2d_pallas

    rng = np.random.default_rng(7)
    n, h, w, c, g, d = 1, 64, 96, 32, 8, 8
    x = jnp.asarray(rng.standard_normal((n, h, w, c)), dtype)
    base = jnp.asarray([13.0, -11.0], jnp.float32)  # beyond ±8
    off = base + jnp.asarray(rng.uniform(-2, 2, (n, h, w, g, 9, 2)), jnp.float32)
    mask = jnp.asarray(rng.uniform(0, 1, (n, h, w, g, 9)), jnp.float32)
    wgt = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.1, dtype)

    out = jax.jit(
        lambda *a: deform_conv2d_pallas(*a, max_displacement=d, anchor=True)
    )(x, off, mask, wgt)
    ref = jax.jit(lambda *a: deform_conv2d(*a, None))(
        x.astype(jnp.float32), off, mask, wgt.astype(jnp.float32))
    err = float(jnp.abs(out.astype(jnp.float32) - ref).max())
    assert err <= tol, err


@requires_tpu
def test_compiled_anchored_shared_s2d():
    """The anchored HR dcn_3 deployment shape (shared taps + shared mask +
    s2d(4)) compiled on-chip vs the shared-offset gather oracle."""
    from crfp_tpu.ops.dcn import deform_conv2d_shared_offset
    from crfp_tpu.ops.pallas.dcn import deform_conv2d_pallas
    from crfp_tpu.ops.shuffle import pixel_shuffle, pixel_unshuffle

    rng = np.random.default_rng(8)
    n, h, w, c, d, r = 1, 64, 64, 4, 32, 4
    r2 = r * r
    x = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)
    base = jnp.asarray([37.0, -35.0], jnp.float32)  # beyond ±32
    shared = base + jnp.asarray(rng.uniform(-3, 3, (n, h, w, 1, 1, 2)), jnp.float32)
    mask = jnp.asarray(rng.uniform(0, 1, (n, h, w, 1, 1)), jnp.float32)
    wgt = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.1, jnp.float32)

    ref = jax.jit(
        lambda *a: deform_conv2d_shared_offset(*a, None)
    )(x, shared[:, :, :, 0, 0, :],
      jnp.broadcast_to(mask[..., :1], (n, h, w, 1, 9))[:, :, :, 0, :], wgt)

    xs = pixel_unshuffle(x, r)
    offs = pixel_unshuffle(shared.reshape(n, h, w, 2), r).reshape(
        n, h // r, w // r, 1, 1, 2, r2)
    masks = pixel_unshuffle(mask.reshape(n, h, w, 1), r).reshape(
        n, h // r, w // r, 1, 1, r2)
    out = jax.jit(
        lambda *a: deform_conv2d_pallas(
            *a, max_displacement=d, shared_taps=True, shared_mask=True,
            s2d=r, anchor=True)
    )(xs, offs, masks, wgt)
    err = float(jnp.abs(pixel_shuffle(out, r) - ref).max())
    assert err <= 5e-5, err


@requires_tpu
@pytest.mark.parametrize("dtype,hs", [(jnp.bfloat16, 270), (jnp.float32, 270),
                                      (jnp.bfloat16, 96)])
def test_compiled_emit_frame_matches_pixel_shuffle(dtype, hs):
    # the emit_s2d deployment path: Mosaic depth-to-space interleave at
    # the 1080p shape (ragged last band) and a two-full-band shape —
    # multi-band compiled coverage (the index_map bug class that
    # single-band interpret tests cannot see)
    from crfp_tpu.ops.pallas.emit import depth_to_space_add_chw
    from crfp_tpu.ops.shuffle import pixel_shuffle

    rng = np.random.default_rng(11)
    ws, c, r = 480 if hs == 270 else 32, 3, 4
    y = jnp.asarray(rng.standard_normal((1, hs, ws, c * r * r)), dtype)
    got = np.asarray(
        jax.jit(lambda a: depth_to_space_add_chw(a, None))(y), np.float32)
    want = np.asarray(pixel_shuffle(y, r), np.float32).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=2e-6, rtol=2e-6)


@pytest.mark.parametrize(
    "dtype,tol,c,band,xtile",
    [
        (jnp.float32, 5e-5, 32, 16, 32),
        # bf16 runs the empirically-validated lv3 geometry (c=64 -> cpg=8,
        # band/xtile 16): Mosaic's stack accounting rejects the cpg=4
        # small-shape variant the f32 case uses
        (jnp.bfloat16, 5e-2, 64, 16, 16),
    ],
)
def test_compiled_fusedprep_matches_structured(dtype, tol, c, band, xtile):
    """The fused-prep experiment (dense head-output operands, in-kernel
    query build) compiled on chip vs the structured kernel — same math up
    to f32 reassociation (and bf16 rounding of the offsets' consumers).
    Measured SLOWER than the structured path at the lv3 deployment shapes
    (docs/PERF.md round-3 negative results) — kept opt-in; this test keeps
    the compiled path honest."""
    from crfp_tpu.ops.pallas.dcn import (
        deform_conv2d_pallas,
        deform_conv2d_pallas_fusedprep,
    )

    rng = np.random.default_rng(11)
    n, h, w, g, o = 1, 64, 96, 8, c
    k2, d = 9, 8
    x = jnp.asarray(rng.standard_normal((n, h, w, c)), dtype)
    offc = jnp.clip(
        jnp.asarray(rng.uniform(-12, 12, (n, h, w, g * k2 * 2)), jnp.float32),
        -d, d)
    mskc = jnp.asarray(rng.uniform(0, 1, (n, h, w, g * k2)), jnp.float32)
    wt = jnp.asarray(rng.standard_normal((3, 3, c, o)) * 0.2, dtype)

    got = np.asarray(jax.jit(
        lambda x, oc, mc: deform_conv2d_pallas_fusedprep(
            x, oc, mc, wt, None, max_displacement=d, band=band, xtile=xtile)
    )(x, offc, mskc), np.float32)
    want = np.asarray(jax.jit(
        lambda x, os_, ms: deform_conv2d_pallas(
            x, os_, ms, wt, None, max_displacement=d, band=band, xtile=xtile)
    )(x, offc.reshape(n, h, w, g, k2, 2), mskc.reshape(n, h, w, g, k2)),
        np.float32)
    np.testing.assert_allclose(got, want, atol=tol, rtol=tol)


@requires_tpu
def test_compiled_anchored_vjp_matches_interpret():
    """anchor_vjp=True compiled on-chip: the anchored Mosaic backward
    (starts-table DMAs, anchor-extended dwin blocks) vs interpret mode —
    which tests/test_pallas_dcn.py gates against the effective-offset XLA
    mirror. Catches Mosaic lowering/layout regressions in the new
    scalar-prefetch backward."""
    from crfp_tpu.ops.pallas.dcn import deform_conv2d_pallas_vjp

    rng = np.random.default_rng(9)
    n, h, w, c, g = 1, 24, 40, 8, 2
    x = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)
    base = jnp.asarray([14.3, -11.7], jnp.float32)  # beyond ±8
    off = base + jnp.asarray(rng.uniform(-2, 2, (n, h, w, g, 9, 2)), jnp.float32)
    mk = jnp.asarray(rng.uniform(0, 1, (n, h, w, g, 9)), jnp.float32)
    wgt = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.1, jnp.float32)

    def loss(interp):
        def f(x, off, mk, wgt):
            o = deform_conv2d_pallas_vjp(
                x, off, mk, wgt, None, max_displacement=8, anchor=True,
                anchor_vjp=True, interpret=interp)
            return (o * o).sum()
        return f

    gc = jax.jit(jax.grad(loss(False), argnums=(0, 1, 2, 3)))(x, off, mk, wgt)
    gi = jax.grad(loss(True), argnums=(0, 1, 2, 3))(x, off, mk, wgt)
    for a, b, name in zip(gc, gi, ("x", "offset", "mask", "weight")):
        err = float(jnp.abs(a - b).max())
        rel = err / (float(jnp.abs(b).max()) + 1e-6)
        assert rel <= 2e-4, (name, err, rel)


@requires_tpu
def test_compiled_anchored_vjp_shared_s2d_grads():
    """The TRAINED deployment geometry — anchored + shared taps/mask +
    s2d(4) (the dcn_3/HR-warp shape with dcn_anchor on in the batch
    trunk) — compiled gradients vs interpret mode."""
    from crfp_tpu.ops.pallas.dcn import deform_conv2d_pallas_vjp
    from crfp_tpu.ops.shuffle import pixel_unshuffle

    rng = np.random.default_rng(10)
    n, h, w, c, d, r = 1, 32, 64, 4, 32, 4
    r2 = r * r
    x = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)
    base = jnp.asarray([37.0, -35.0], jnp.float32)  # beyond ±32
    shared = base + jnp.asarray(rng.uniform(-3, 3, (n, h, w, 1, 1, 2)), jnp.float32)
    mask = jnp.asarray(rng.uniform(0, 1, (n, h, w, 1, 1)), jnp.float32)
    wgt = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.1, jnp.float32)

    xs = pixel_unshuffle(x, r)
    offs = pixel_unshuffle(shared.reshape(n, h, w, 2), r).reshape(
        n, h // r, w // r, 1, 1, 2, r2)
    masks = pixel_unshuffle(mask.reshape(n, h, w, 1), r).reshape(
        n, h // r, w // r, 1, 1, r2)

    def loss(interp):
        def f(xs, offs, masks, wgt):
            o = deform_conv2d_pallas_vjp(
                xs, offs, masks, wgt, None, max_displacement=d,
                shared_taps=True, shared_mask=True, s2d=r, anchor=True,
                anchor_vjp=True, interpret=interp)
            return (o * o).sum()
        return f

    gc = jax.jit(jax.grad(loss(False), argnums=(0, 1, 2, 3)))(xs, offs, masks, wgt)
    gi = jax.grad(loss(True), argnums=(0, 1, 2, 3))(xs, offs, masks, wgt)
    for a, b, name in zip(gc, gi, ("x", "offset", "mask", "weight")):
        err = float(jnp.abs(a - b).max())
        rel = err / (float(jnp.abs(b).max()) + 1e-6)
        assert rel <= 2e-4, (name, err, rel)

"""deform_conv2d vs a direct numpy DCNv2 oracle + identity/grad sanity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crfp_tpu.ops.dcn import deform_conv2d


def _dcn_oracle(x, offset, mask, weight, bias):
    """Literal per-pixel DCNv2 (stride 1, same padding, dilation 1).

    x: (n,h,w,c); offset: (n,h,w,g,k2,2) (dy,dx); mask: (n,h,w,g,k2);
    weight: (kh,kw,c,o); bias: (o,)
    """
    n, h, w, c = x.shape
    kh, kw, _, o = weight.shape
    g = offset.shape[3]
    cpg = c // g
    pad_y, pad_x = (kh - 1) // 2, (kw - 1) // 2
    out = np.zeros((n, h, w, o), np.float64)

    def sample(img2d, sy, sx):
        hh, ww = img2d.shape
        if sy <= -1 or sy >= hh or sx <= -1 or sx >= ww:
            return 0.0
        y0, x0 = int(np.floor(sy)), int(np.floor(sx))
        fy, fx = sy - y0, sx - x0
        val = 0.0
        for dy, wy in ((0, 1 - fy), (1, fy)):
            for dx, wx in ((0, 1 - fx), (1, fx)):
                yy, xx = y0 + dy, x0 + dx
                if 0 <= yy < hh and 0 <= xx < ww:
                    val += wy * wx * img2d[yy, xx]
        return val

    for b in range(n):
        for y in range(h):
            for xx_ in range(w):
                acc = np.zeros(o, np.float64)
                for gi in range(g):
                    for ky in range(kh):
                        for kx in range(kw):
                            k = ky * kw + kx
                            sy = y + ky - pad_y + offset[b, y, xx_, gi, k, 0]
                            sx = xx_ + kx - pad_x + offset[b, y, xx_, gi, k, 1]
                            m = mask[b, y, xx_, gi, k]
                            for ci in range(cpg):
                                cc = gi * cpg + ci
                                v = sample(x[b, :, :, cc], sy, sx) * m
                                acc += v * weight[ky, kx, cc, :]
                out[b, y, xx_] = acc + bias
    return out.astype(np.float32)


@pytest.mark.parametrize("g,k,c,o", [(1, 3, 4, 4), (2, 3, 4, 6), (4, 1, 8, 8)])
def test_deform_conv_matches_oracle(g, k, c, o):
    rng = np.random.default_rng(0)
    n, h, w = 1, 5, 6
    x = rng.standard_normal((n, h, w, c)).astype(np.float32)
    offset = (rng.standard_normal((n, h, w, g, k * k, 2)) * 2.0).astype(np.float32)
    mask = rng.uniform(0, 1, (n, h, w, g, k * k)).astype(np.float32)
    weight = rng.standard_normal((k, k, c, o)).astype(np.float32) * 0.2
    bias = rng.standard_normal((o,)).astype(np.float32)

    got = np.asarray(deform_conv2d(x, offset, mask, weight, bias))
    want = _dcn_oracle(x, offset, mask, weight, bias)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_identity_init_is_identity():
    # zero offsets + unit mask + identity-initialized center-tap weight
    # reproduces the reference's conv_identify property
    # (/root/reference/model/CRFP.py:354-370): output == input.
    rng = np.random.default_rng(1)
    n, h, w, c = 2, 6, 7, 8
    x = rng.standard_normal((n, h, w, c)).astype(np.float32)
    offset = np.zeros((n, h, w, 2, 9, 2), np.float32)
    mask = np.ones((n, h, w, 2, 9), np.float32)
    weight = np.zeros((3, 3, c, c), np.float32)
    for i in range(c):
        weight[1, 1, i, i] = 1.0
    out = np.asarray(deform_conv2d(x, offset, mask, weight, np.zeros(c, np.float32)))
    np.testing.assert_allclose(out, x, atol=1e-5)


def test_shared_offset_matches_generic():
    from crfp_tpu.ops.dcn import deform_conv2d_shared_offset

    rng = np.random.default_rng(3)
    n, h, w, c, o = 1, 6, 7, 4, 4
    x = rng.standard_normal((n, h, w, c)).astype(np.float32)
    shared = (rng.standard_normal((n, h, w, 2)) * 2).astype(np.float32)
    mask9 = rng.uniform(0, 1, (n, h, w, 9)).astype(np.float32)
    weight = rng.standard_normal((3, 3, c, o)).astype(np.float32) * 0.2
    bias = rng.standard_normal((o,)).astype(np.float32)

    off_full = np.broadcast_to(shared[:, :, :, None, None, :], (n, h, w, 1, 9, 2))
    got = np.asarray(deform_conv2d_shared_offset(x, shared, mask9, weight, bias))
    want = np.asarray(deform_conv2d(x, off_full, mask9[:, :, :, None, :], weight, bias))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_deform_conv_is_differentiable():
    rng = np.random.default_rng(2)
    n, h, w, c, g = 1, 4, 4, 4, 2
    x = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)
    offset = jnp.asarray(rng.standard_normal((n, h, w, g, 9, 2)), jnp.float32)
    mask = jnp.asarray(rng.uniform(0, 1, (n, h, w, g, 9)), jnp.float32)
    weight = jnp.asarray(rng.standard_normal((3, 3, c, c)), jnp.float32)
    bias = jnp.zeros((c,), jnp.float32)

    def loss(x, offset, mask, weight, bias):
        return (deform_conv2d(x, offset, mask, weight, bias) ** 2).sum()

    grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(x, offset, mask, weight, bias)
    for gr in grads:
        assert np.all(np.isfinite(np.asarray(gr)))
    assert float(jnp.abs(grads[0]).sum()) > 0
    assert float(jnp.abs(grads[1]).sum()) > 0

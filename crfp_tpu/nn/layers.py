"""Core conv building blocks (flax.linen, NHWC) with torch-parity init.

Mirrors the reference blocks so converted torch checkpoints drop in:
- ``ResidualBlockNoBN`` / ``ResidualBlocksWithInputConv``
  (/root/reference/model/CRFP.py:433-552), ESRGAN-style 0.1-scaled
  kaiming-normal init (/root/reference/model/CRFP.py:459-469).
- ``PixelShufflePack`` (conv then depth-to-space,
  /root/reference/model/CRFP.py:154-193) and ``PixelUnShufflePack_v2``
  (space-to-depth then conv, /root/reference/model/CRFP.py:239-279), both
  kaiming-normal fan_in initialized (default_init_weights,
  /root/reference/model/CRFP.py:75-88).
- plain convs use torch's Conv2d default (kaiming-uniform a=sqrt(5), i.e.
  U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for weight AND bias).
"""

from __future__ import annotations

import functools
import math
from collections.abc import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

from crfp_tpu.ops.shuffle import pixel_shuffle, pixel_unshuffle


def lrelu(x: jax.Array, slope: float = 0.1) -> jax.Array:
    return jax.nn.leaky_relu(x, negative_slope=slope)


def _fan_in(shape: tuple[int, ...]) -> int:
    # HWIO kernel
    return shape[0] * shape[1] * shape[2]


def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    bound = 1.0 / math.sqrt(_fan_in(shape))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_conv_bias_init(fan_in: int) -> Callable:
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def kaiming_normal_fan_in(scale: float = 1.0) -> Callable:
    def init(key, shape, dtype=jnp.float32):
        std = math.sqrt(2.0 / _fan_in(shape)) * scale
        return jax.random.normal(key, shape, dtype) * std

    return init


class Conv(nn.Module):
    """3x3 (by default) 'same' conv with torch-default init, NHWC."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    kernel_init: Callable | None = None
    bias_init: Callable | None = None
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = self.kernel_size
        fan_in = k * k * x.shape[-1]
        kinit = self.kernel_init or torch_conv_kernel_init
        binit = self.bias_init or torch_conv_bias_init(fan_in)
        # parity runs pin full-f32 MXU passes; the bf16 fast path (inputs
        # cast by crfp_tpu.utils.precision.cast_to_compute) uses the native
        # bf16 systolic array with f32 accumulation
        if x.dtype == jnp.bfloat16:
            prec = None
            dtype = jnp.bfloat16
        else:
            prec = jax.lax.Precision.HIGHEST
            dtype = None
        return nn.Conv(
            features=self.features,
            kernel_size=(k, k),
            strides=(self.stride, self.stride),
            padding=[(k // 2, k // 2), (k // 2, k // 2)],
            kernel_init=kinit,
            bias_init=binit,
            use_bias=self.use_bias,
            precision=prec,
            dtype=dtype,
            name="conv",
        )(x)


def conv3x3(features: int, name: str | None = None, kernel_init: Callable | None = None) -> Conv:
    return Conv(features=features, kernel_size=3, name=name, kernel_init=kernel_init)


class ResidualBlockNoBN(nn.Module):
    """conv-relu-conv residual (/root/reference/model/CRFP.py:433-481).

    ``s2d``: evaluate in space-to-depth(4) layout via :class:`ConvS2D`
    (same parameters, bit-exact; see ConvS2D docstring)."""

    mid_channels: int
    res_scale: float = 1.0
    s2d: bool = False
    s2d_r: int = 4

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        init = kaiming_normal_fan_in(0.1) if self.res_scale == 1.0 else None
        conv = (lambda name: ConvS2D(self.mid_channels, r=self.s2d_r, kernel_init=init, name=name))             if self.s2d else (lambda name: Conv(self.mid_channels, kernel_init=init, name=name))
        out = conv("conv1")(x)
        out = jax.nn.relu(out)
        out = conv("conv2")(out)
        return x + out * self.res_scale


class ResidualBlocksWithInputConv(nn.Module):
    """input conv + lrelu + N residual blocks (/root/reference/model/CRFP.py:516-552)."""

    out_channels: int
    num_blocks: int = 1
    s2d: bool = False
    s2d_r: int = 4

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.s2d:
            x = ConvS2D(self.out_channels, r=self.s2d_r, name="input_conv")(x)
        else:
            x = Conv(self.out_channels, name="input_conv")(x)
        x = lrelu(x)
        for i in range(self.num_blocks):
            x = ResidualBlockNoBN(self.out_channels, s2d=self.s2d, s2d_r=self.s2d_r,
                                  name=f"block{i}")(x)
        return x


class PixelShufflePack(nn.Module):
    """conv(c -> out*s^2) + depth-to-space (/root/reference/model/CRFP.py:154-193)."""

    out_channels: int
    scale_factor: int
    upsample_kernel: int = 3

    @nn.compact
    def __call__(self, x: jax.Array, keep_depth: bool = False,
                 in_s2d: int = 1) -> jax.Array:
        s = self.scale_factor
        if in_s2d > 1:
            # input arrives in space-to-depth(in_s2d) layout (the lv3_s2d
            # trunk): run the conv as ConvS2D (same parameters), then
            # relayout its s2d(in_s2d)-of-(native-grid, out*s^2) output to
            # the native grid — which IS the keep_depth s2d(s) layout of
            # the upsampled result; pixel_shuffle(s) of that recovers the
            # full-resolution output as usual.
            x = ConvS2D(
                self.out_channels * s * s,
                r=in_s2d,
                kernel_size=self.upsample_kernel,
                kernel_init=kaiming_normal_fan_in(1.0),
                name="upsample_conv",
            )(x)
            x = pixel_shuffle(x, in_s2d)
        else:
            x = Conv(
                self.out_channels * s * s,
                kernel_size=self.upsample_kernel,
                kernel_init=kaiming_normal_fan_in(1.0),
                name="upsample_conv",
            )(x)
        if keep_depth:
            # the conv output IS the pixel_shuffle(s) s2d layout of the
            # upsampled result (same channel order) — callers running the
            # high-res tail in s2d skip the depth-to-space round trip
            return x
        return pixel_shuffle(x, s)


class PixelUnShufflePackV2(nn.Module):
    """space-to-depth + conv(c*s^2 -> out) (/root/reference/model/CRFP.py:239-279)."""

    out_channels: int
    scale_factor: int
    downsample_kernel: int = 3

    @nn.compact
    def __call__(self, x: jax.Array, pre_shuffled: bool = False,
                 out_s2d: int = 1) -> jax.Array:
        if not pre_shuffled:
            # pre_shuffled: x is already in pixel_unshuffle(s) layout (the
            # s2d HR-tail state) — identical bytes, skip the relayout
            x = pixel_unshuffle(x, self.scale_factor)
        if out_s2d > 1:
            # emit the conv result directly in space-to-depth(out_s2d)
            # layout (the lv3_s2d trunk): the few-channel output never
            # materializes at its tile-padded native width
            return ConvOutS2D(
                self.out_channels,
                r=out_s2d,
                kernel_size=self.downsample_kernel,
                kernel_init=kaiming_normal_fan_in(1.0),
                name="downsample_conv",
            )(x)
        return Conv(
            self.out_channels,
            kernel_size=self.downsample_kernel,
            kernel_init=kaiming_normal_fan_in(1.0),
            name="downsample_conv",
        )(x)


@functools.lru_cache(maxsize=None)
def _s2d_route(k: int, r: int, pad: int):
    """Constant 0/1 routing tensor for :class:`ConvS2D`'s kernel rearrange.

    Shape (k, k, 3, 3, r*r, r*r): HR tap (dy, dx) feeding output phase
    q = ao*r+bo reads the s2d block at offset (di, dj) ∈ {-1,0,1} (stored
    +1) and input phase p = ai*r+bi, where (r*?+ai, r*?+bi) is the HR
    source pixel of the tap."""
    import numpy as np

    m = np.zeros((k, k, 3, 3, r * r, r * r), np.float32)
    for dy in range(k):
        for dx in range(k):
            for ao in range(r):
                for bo in range(r):
                    sy, sx = ao + dy - pad, bo + dx - pad
                    di, ai = sy // r, sy % r
                    dj, bi = sx // r, sx % r
                    m[dy, dx, di + 1, dj + 1, ai * r + bi, ao * r + bo] = 1.0
    return m


class _ConvS2DParams(nn.Module):
    k: int
    cin: int
    cout: int
    use_bias: bool
    kinit: Callable
    binit: Callable

    @nn.compact
    def __call__(self):
        w = self.param("kernel", self.kinit, (self.k, self.k, self.cin, self.cout))
        b = self.param("bias", self.binit, (self.cout,)) if self.use_bias else None
        return w, b


class ConvS2D(nn.Module):
    """A 'same' conv evaluated in space-to-depth(r) layout — numerically
    exact (same math; summation reassociation only, tests use atol ~2e-5).

    Holds the SAME parameter (kh, kw, cin, cout) as :class:`Conv` (so
    checkpoints and the torch converter are untouched) but consumes and
    produces tensors in pixel-unshuffle(r) layout (N, H/r, W/r, cin*r^2).
    Why: full-resolution activations in this model have 1-6 channels, and
    TPU HBM tiles pad the minor dim to 128 lanes — every elementwise or
    conv pass over an (H, W, 4) tensor moves ~32x its logical bytes
    (docs/PERF.md). In s2d layout the same math runs at C*r^2 channels on
    1/r^2 the pixels.

    The s2d kernel is built by index rearrangement: an HR output pixel
    (r*Y+ao, r*X+bo) reading HR tap (dy, dx) reads s2d block
    (Y + (ao+dy-pad)//r, X + ...) channel slot ((ao+dy-pad)%r, ...), so
    each HR tap value appears once per (ao, bo) phase in a 3x3 s2d
    kernel (for kh,kw<=r+1). Zero 'same' padding maps exactly (blocks
    align with the frame border).
    """

    features: int
    r: int = 4
    kernel_size: int = 3
    kernel_init: Callable | None = None
    bias_init: Callable | None = None
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k, r = self.kernel_size, self.r
        r2 = r * r
        cin_s2d = x.shape[-1]
        assert cin_s2d % r2 == 0, (x.shape, r)
        cin = cin_s2d // r2
        pad = (k - 1) // 2
        assert pad <= r, "tap reach beyond one s2d block needs a larger kernel"
        fan_in = k * k * cin
        kinit = self.kernel_init or torch_conv_kernel_init
        binit = self.bias_init or torch_conv_bias_init(fan_in)
        # parameters live under a child scope named 'conv' with the HR
        # shapes, so the param tree is IDENTICAL to :class:`Conv` and
        # converted checkpoints drop in unchanged
        w, b = _ConvS2DParams(
            k=k, cin=cin, cout=self.features, use_bias=self.use_bias,
            kinit=kinit, binit=binit, name="conv",
        )()

        # s2d kernel via one einsum against a constant 0/1 routing tensor
        # (scatter-free: the old 144-step .at[].set chain serialized in the
        # autodiff graph). M[dy,dx,D,A,p,q] = 1 iff HR tap (dy,dx) at output
        # phase q=(ao,bo) lands in s2d block offset (D-1,A-1) input phase p.
        route = _s2d_route(k, r, pad)
        ws = jnp.einsum("ijco,ijdapq->dacpoq", w, route.astype(w.dtype))
        ws = ws.reshape(3, 3, cin * r2, self.features * r2)

        if x.dtype == jnp.bfloat16:
            prec = None
            ws = ws.astype(jnp.bfloat16)
        else:
            prec = jax.lax.Precision.HIGHEST
        out = jax.lax.conv_general_dilated(
            x, ws, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=prec,
        )
        if b is not None:
            out = out + jnp.tile(b[:, None], (1, r2)).reshape(-1)
        return out


@functools.lru_cache(maxsize=None)
def _out_s2d_route(k: int, r: int):
    """Constant 0/1 routing for :class:`ConvOutS2D`'s kernel rearrange.

    Shape (k, k, k+r-1, k+r-1, r*r): native tap (dy, dx) feeding output
    phase q = ao*r+bo lands at fused-kernel position (ao+dy, bo+dx) of
    the stride-r conv."""
    import numpy as np

    m = np.zeros((k, k, k + r - 1, k + r - 1, r * r), np.float32)
    for dy in range(k):
        for dx in range(k):
            for ao in range(r):
                for bo in range(r):
                    m[dy, dx, ao + dy, bo + dx, ao * r + bo] = 1.0
    return m


class ConvOutS2D(nn.Module):
    """A 'same' conv over a native-grid input that EMITS its result in
    space-to-depth(r) layout — numerically exact (same math, summation
    reassociation only).

    Holds the SAME (kh, kw, cin, cout) parameter as :class:`Conv` under
    the same child scope. Output phase q = (ao, bo) of s2d block (Y, X)
    is the native output pixel (rY+ao, rX+bo); its tap (dy, dx) reads
    input (rY+ao+dy-pad, rX+bo+dx-pad), i.e. position (ao+dy, bo+dx) of
    a (k+r-1)^2 stride-r kernel. One strided conv writes the
    (N, H/r, W/r, cout*r^2) c-major result directly — the few-channel
    native-width output is never materialized at its tile-padded cost
    (the lv3_s2d trunk's downsample boundary, docs/PERF.md)."""

    features: int
    r: int = 2
    kernel_size: int = 3
    kernel_init: Callable | None = None
    bias_init: Callable | None = None
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k, r = self.kernel_size, self.r
        r2 = r * r
        cin = x.shape[-1]
        pad = (k - 1) // 2
        fan_in = k * k * cin
        kinit = self.kernel_init or torch_conv_kernel_init
        binit = self.bias_init or torch_conv_bias_init(fan_in)
        w, b = _ConvS2DParams(
            k=k, cin=cin, cout=self.features, use_bias=self.use_bias,
            kinit=kinit, binit=binit, name="conv",
        )()

        route = _out_s2d_route(k, r)
        ws = jnp.einsum("ijco,ijuvq->uvcoq", w, route.astype(w.dtype))
        ws = ws.reshape(k + r - 1, k + r - 1, cin, self.features * r2)

        if x.dtype == jnp.bfloat16:
            prec = None
            ws = ws.astype(jnp.bfloat16)
        else:
            prec = jax.lax.Precision.HIGHEST
        out = jax.lax.conv_general_dilated(
            x, ws, (r, r), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=prec,
        )
        if b is not None:
            out = out + jnp.tile(b[:, None], (1, r2)).reshape(-1)
        return out

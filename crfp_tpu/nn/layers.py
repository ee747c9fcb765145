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
    """conv-relu-conv residual (/root/reference/model/CRFP.py:433-481)."""

    mid_channels: int
    res_scale: float = 1.0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        init = kaiming_normal_fan_in(0.1) if self.res_scale == 1.0 else None
        out = Conv(self.mid_channels, kernel_init=init, name="conv1")(x)
        out = jax.nn.relu(out)
        out = Conv(self.mid_channels, kernel_init=init, name="conv2")(out)
        return x + out * self.res_scale


class ResidualBlocksWithInputConv(nn.Module):
    """input conv + lrelu + N residual blocks (/root/reference/model/CRFP.py:516-552)."""

    out_channels: int
    num_blocks: int = 1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = Conv(self.out_channels, name="input_conv")(x)
        x = lrelu(x)
        for i in range(self.num_blocks):
            x = ResidualBlockNoBN(self.out_channels, name=f"block{i}")(x)
        return x


class PixelShufflePack(nn.Module):
    """conv(c -> out*s^2) + depth-to-space (/root/reference/model/CRFP.py:154-193)."""

    out_channels: int
    scale_factor: int
    upsample_kernel: int = 3

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        s = self.scale_factor
        x = Conv(
            self.out_channels * s * s,
            kernel_size=self.upsample_kernel,
            kernel_init=kaiming_normal_fan_in(1.0),
            name="upsample_conv",
        )(x)
        return pixel_shuffle(x, s)


class PixelUnShufflePackV2(nn.Module):
    """space-to-depth + conv(c*s^2 -> out) (/root/reference/model/CRFP.py:239-279)."""

    out_channels: int
    scale_factor: int
    downsample_kernel: int = 3

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = pixel_unshuffle(x, self.scale_factor)
        return Conv(
            self.out_channels,
            kernel_size=self.downsample_kernel,
            kernel_init=kaiming_normal_fan_in(1.0),
            name="downsample_conv",
        )(x)

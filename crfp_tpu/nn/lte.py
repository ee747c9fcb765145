"""LTE (learnable texture extractor) encoders from TTSR, simplified.

- ``LTESimpleLR``: two 3x3 convs + lrelu over the LR frame
  (/root/reference/model/LTE.py:34-51).
- ``LTESimpleHRSingle``: the same over the 6-channel concat of the
  fovea-blended HR frame and the bicubic-upsampled LR
  (/root/reference/model/LTE.py:100-117).
- ``LTESimpleHRPS``: 4-level pyramid using PixelUnshuffle(4) for the CRA
  variant (/root/reference/model/LTE.py:119-166).
"""

from __future__ import annotations

import flax.linen as nn
import jax

from crfp_tpu.nn.layers import Conv, ConvS2D, lrelu
from crfp_tpu.ops.shuffle import pixel_unshuffle


class LTESimpleLR(nn.Module):
    mid_channels: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = lrelu(Conv(self.mid_channels, name="slice1_conv1")(x))
        x = lrelu(Conv(self.mid_channels, name="slice1_conv2")(x))
        return x


class LTESimpleHRSingle(nn.Module):
    mid_channels: int
    s2d: bool = False  # evaluate in space-to-depth(4) layout (ConvS2D)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        conv = ConvS2D if self.s2d else Conv
        x = lrelu(conv(self.mid_channels, name="slice1_conv1")(x))
        x = lrelu(conv(self.mid_channels, name="slice1_conv2")(x))
        return x


class LTESimpleHR(nn.Module):
    """3-level VGG-ish pyramid (/root/reference/model/LTE.py:53-98).

    Returns (x_lv1, x_lv2, x_lv3): lv3 full res, lv2 half, lv1 quarter —
    BasicFVSR uses the quarter-res x_lv1 as its texture feature."""

    mid_channels: int

    @nn.compact
    def __call__(self, x: jax.Array):
        m = self.mid_channels
        x = lrelu(Conv(m, name="slice1_conv1")(x))
        x = lrelu(Conv(m, name="slice1_conv2")(x))
        x_lv3 = lrelu(Conv(m, name="conv_lv3")(x))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = lrelu(Conv(m, name="slice2_conv1")(x))
        x = lrelu(Conv(m, name="slice2_conv2")(x))
        x_lv2 = lrelu(Conv(m, name="conv_lv2")(x))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = lrelu(Conv(m, name="slice3_conv1")(x))
        x = lrelu(Conv(m, name="slice3_conv2")(x))
        x_lv1 = lrelu(Conv(m, name="conv_lv1")(x))
        return x_lv1, x_lv2, x_lv3


class LTESimpleHRV1(nn.Module):
    """3-level pyramid with widening channels mid/4 -> mid/2 -> mid
    (/root/reference/model/LTE.py:168-213; unused by shipped models)."""

    mid_channels: int

    @nn.compact
    def __call__(self, x: jax.Array):
        m = self.mid_channels
        x = lrelu(Conv(m // 4, name="slice1_conv1")(x))
        x = lrelu(Conv(m // 4, name="slice1_conv2")(x))
        x_lv3 = lrelu(Conv(m // 4, name="conv_lv3")(x))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = lrelu(Conv(m // 2, name="slice2_conv1")(x))
        x = lrelu(Conv(m // 2, name="slice2_conv2")(x))
        x_lv2 = lrelu(Conv(m // 2, name="conv_lv2")(x))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = lrelu(Conv(m, name="slice3_conv1")(x))
        x = lrelu(Conv(m, name="slice3_conv2")(x))
        x_lv1 = lrelu(Conv(m, name="conv_lv1")(x))
        return x_lv1, x_lv2, x_lv3


class LTESimpleHRX8(nn.Module):
    """4-level 64-channel maxpool pyramid
    (/root/reference/model/LTE.py:215-273; unused by shipped models)."""

    @nn.compact
    def __call__(self, x: jax.Array):
        outs = []
        for level in range(4):
            if level > 0:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = lrelu(Conv(64, name=f"slice{level+1}_conv1")(x))
            x = lrelu(Conv(64, name=f"slice{level+1}_conv2")(x))
            outs.append(lrelu(Conv(64, name=f"conv_lv{3-level}")(x)))
        x_lv3, x_lv2, x_lv1, x_lv0 = outs
        return x_lv0, x_lv1, x_lv2, x_lv3


class LTESimpleHRPS(nn.Module):
    """Returns (x_lv0, x_lv1, x_lv2, x_lv3): lv3 at full res with C=mid,
    lv0..2 at 1/4 res with C=mid*4."""

    mid_channels: int

    @nn.compact
    def __call__(self, x: jax.Array):
        m = self.mid_channels
        x = lrelu(Conv(m, name="slice1_conv1")(x))
        x = lrelu(Conv(m, name="slice1_conv2")(x))
        x_lv3 = lrelu(Conv(m, name="conv_lv3")(x))
        x = pixel_unshuffle(x, 4)
        x = lrelu(Conv(m * 4, name="slice2_conv1")(x))
        x = lrelu(Conv(m * 4, name="slice2_conv2")(x))
        x_lv2 = lrelu(Conv(m * 4, name="conv_lv2")(x))
        x = lrelu(Conv(m * 4, name="slice3_conv1")(x))
        x = lrelu(Conv(m * 4, name="slice3_conv2")(x))
        x_lv1 = lrelu(Conv(m * 4, name="conv_lv1")(x))
        x = lrelu(Conv(m * 4, name="slice4_conv1")(x))
        x = lrelu(Conv(m * 4, name="slice4_conv2")(x))
        x_lv0 = lrelu(Conv(m * 4, name="conv_lv0")(x))
        return x_lv0, x_lv1, x_lv2, x_lv3

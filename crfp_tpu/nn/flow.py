"""Optical-flow estimators: FNet (the active one) and SPyNet.

- FNet: TecoGAN/EGVSR-style encoder-decoder, output ``tanh(.)*256``
  bilinearly resized to the input size (/root/reference/model/CRFP.py:743-814).
- SPyNet: 6-level coarse-to-fine residual flow with avg-pool pyramid,
  border-padded warping and /32 padding (/root/reference/model/CRFP.py:554-741).
  Offered for parity with the reference's commented alternative and for
  the SPyNet-based BASELINE config 1.

Both take NHWC frames and return NHWC flow with channels (dx, dy) in
pixel units (same convention the reference feeds flow_warp after its
``permute``).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from crfp_tpu.nn.layers import Conv
from crfp_tpu.ops.resize import avg_pool_2x, resize_bilinear, upsample
from crfp_tpu.ops.warp import flow_warp


class FNet(nn.Module):
    """Flow from x1 to x2; both (N, H, W, 3)."""

    @nn.compact
    def __call__(self, x1: jax.Array, x2: jax.Array) -> jax.Array:
        n, h, w, _ = x1.shape
        if min(h, w) < 8:
            raise ValueError(
                f"FNet needs input frames of at least 8x8 pixels (its encoder "
                f"pools 3 times); got {h}x{w}. Use a larger GT_size/scale ratio."
            )
        out = jnp.concatenate([x1, x2], axis=-1)
        for i, ch in enumerate((32, 64, 128)):
            out = jax.nn.relu(Conv(ch, name=f"encoder{i+1}_conv1")(out))
            out = jax.nn.relu(Conv(ch, name=f"encoder{i+1}_conv2")(out))
            out = avg_pool_2x(out)
        for i, ch in enumerate((256, 128, 64)):
            out = jax.nn.relu(Conv(ch, name=f"decoder{i+1}_conv1")(out))
            out = jax.nn.relu(Conv(ch, name=f"decoder{i+1}_conv2")(out))
            out = upsample(out, 2)
        out = jax.nn.relu(Conv(32, name="flow_conv1")(out))
        out = Conv(2, name="flow_conv2")(out)
        out = jnp.tanh(out) * 256.0
        return resize_bilinear(out, (h, w))


class SPyNetBasicModule(nn.Module):
    """Five 7x7 convs 8->32->64->32->16->2; each conv preceded by ReLU
    per the reference's ``conv`` block (/root/reference/model/CRFP.py:145-152)."""

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for i, ch in enumerate((32, 64, 32, 16, 2)):
            x = Conv(ch, kernel_size=7, name=f"conv{i}")(jax.nn.relu(x))
        return x


_SPYNET_MEAN = (0.485, 0.456, 0.406)
_SPYNET_STD = (0.229, 0.224, 0.225)


class SPyNet(nn.Module):
    levels: int = 6

    @nn.compact
    def __call__(self, ref: jax.Array, supp: jax.Array) -> jax.Array:
        n, h, w, _ = ref.shape
        h_up = h if h % 32 == 0 else 32 * (h // 32 + 1)
        w_up = w if w % 32 == 0 else 32 * (w // 32 + 1)
        ref_r = resize_bilinear(ref, (h_up, w_up))
        supp_r = resize_bilinear(supp, (h_up, w_up))

        mean = jnp.asarray(_SPYNET_MEAN, ref.dtype)
        std = jnp.asarray(_SPYNET_STD, ref.dtype)
        refs = [(ref_r - mean) / std]
        supps = [(supp_r - mean) / std]
        for _ in range(self.levels - 1):
            refs.append(avg_pool_2x(refs[-1]))
            supps.append(avg_pool_2x(supps[-1]))
        refs, supps = refs[::-1], supps[::-1]

        flow = jnp.zeros((n, h_up // 32, w_up // 32, 2), ref.dtype)
        for level in range(self.levels):
            if level == 0:
                flow_up = flow
            else:
                hh, ww = refs[level].shape[1:3]
                flow_up = resize_bilinear(flow, (hh, ww), align_corners=True) * 2.0
            warped = flow_warp(supps[level], flow_up, padding_mode="border")
            inp = jnp.concatenate([refs[level], warped, flow_up], axis=-1)
            flow = flow_up + SPyNetBasicModule(name=f"basic_module{level}")(inp)

        flow = resize_bilinear(flow, (h, w))
        scale = jnp.asarray([w / w_up, h / h_up], ref.dtype)
        return flow * scale

"""The CRFP recurrent foveated-VSR trunk, one module for every variant.

The reference maintains three parallel 2.6k-9.3k-line files (CRFP.py /
CRFP_test.py / CRFP_runtime.py) with near-identical math for batch
training, stateful streaming and latency benchmarking, times six
architecture variants. Here there is ONE parameterized trunk with an
explicit per-frame ``step`` (plus a ``step0`` for the cold start); the
batch forward is ``step0`` + ``nn.scan(step)`` over time, and streaming
applies the same ``step`` with a host-held state pytree — eliminating the
triple maintenance while keeping the math of each variant exact:

- variant 'v13'  == CRFP_simple      (/root/reference/model/CRFP.py:816-1099)
- variant 'v15'  == CRFP             (/root/reference/model/CRFP.py:1101-1386)
- variant 'v18'  == CRFP_DSV         (/root/reference/model/CRFP.py:1387-1706,
                    the trained model, main.py:34) with the channel-split
                    persistent state (split_ratio)
- the streaming counterparts MRCF_simple_v13/v15/v18
  (/root/reference/model/CRFP_test.py) are the same step with state carried
  by the caller and optional regional-DCN ``fg`` gating
  (/root/reference/model/CRFP_test.py:2347-2389).

Inputs are NHWC: lrs (B,T,h,w,3), fvs (B,T,8h,8w,3), mks (B,T,8h,8w,1);
output (B,T,8h,8w,3) (or 1 channel for y_only).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from crfp_tpu.nn.align import DCNAlign
from crfp_tpu.nn.flow import FNet, SPyNet
from crfp_tpu.nn.layers import (
    Conv,
    PixelShufflePack,
    PixelUnShufflePackV2,
    ResidualBlocksWithInputConv,
    lrelu,
)
from crfp_tpu.nn.lte import LTESimpleHRSingle, LTESimpleLR
from crfp_tpu.ops.color import rgb2y
from crfp_tpu.ops.resize import resize_bilinear, upsample
from crfp_tpu.ops.warp import flow_warp

State = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    variant: str = "v18"  # 'v13' | 'v15' | 'v18'
    mid_channels: int = 32
    scale: int = 8
    y_only: bool = False
    hr_dcn: bool = True
    offset_prop: bool = True
    split_ratio: int = 3
    deform_groups: int = 8
    dcn_kernel: int = 3
    max_residue_magnitude: float = 10.0
    flow_net: str = "fnet"  # 'fnet' | 'spynet'
    remat: bool = False  # rematerialize each scan step during training

    @property
    def last_channels(self) -> int:
        return self.mid_channels // 8

    @property
    def keep_channels(self) -> int:
        """Channels continuing down the cascade in the DSV split (v18)."""
        return (self.mid_channels * self.split_ratio) // 4

    @property
    def state_channels(self) -> int:
        """Per-level persistent state channels in the DSV split (v18)."""
        return (self.mid_channels * (4 - self.split_ratio)) // 4


class CRFP(nn.Module):
    cfg: ModelConfig

    def setup(self):
        cfg = self.cfg
        assert cfg.variant in ("v13", "v15", "v18"), cfg.variant
        if cfg.variant == "v18":
            assert cfg.hr_dcn, "the DSV trunk always runs the HR-level DCN"
        m, last = cfg.mid_channels, cfg.last_channels
        dg, dk, mag = cfg.deform_groups, cfg.dcn_kernel, cfg.max_residue_magnitude

        self.spynet = FNet() if cfg.flow_net == "fnet" else SPyNet()

        self.dcn_0 = DCNAlign(m, dg, dk, mag)
        self.dcn_1 = DCNAlign(m, dg, dk, mag, pre_offset=cfg.offset_prop)
        self.dcn_2 = DCNAlign(m, dg, dk, mag, pre_offset=cfg.offset_prop)
        if cfg.hr_dcn:
            self.dcn_3 = DCNAlign(
                last, 1, dk, mag, repeat=True, pre_offset=cfg.offset_prop,
                interpolate="pixelshuffle",
            )
        else:
            self.dcn_3 = DCNAlign(m, dg, dk, mag, pre_offset=cfg.offset_prop)

        self.encoder_lr = LTESimpleLR(m)
        self.encoder_hr = LTESimpleHRSingle(last)
        self.conv_tttf = Conv(last, name="conv_tttf")

        self.forward_resblocks_0 = ResidualBlocksWithInputConv(m, 1)
        self.forward_resblocks_1 = ResidualBlocksWithInputConv(m, 1)
        self.forward_resblocks_2 = ResidualBlocksWithInputConv(m, 1)
        self.forward_resblocks_3 = ResidualBlocksWithInputConv(last if cfg.hr_dcn else m, 1)

        self.downsample = PixelUnShufflePackV2(m, 4, 3)
        up_ch = cfg.keep_channels if cfg.variant == "v18" else m
        self.upsample = PixelShufflePack(up_ch, 2, 3)
        self.upsample_post = PixelShufflePack(last, 4, 3)

        self.conv_last = Conv(1 if cfg.y_only else 3, name="conv_last")

    # ---------------- per-frame pieces ----------------

    def encode_frame(self, lr: jax.Array, fv: jax.Array, mk: jax.Array):
        """Per-frame encoders + fovea blend. lr (N,h,w,3); fv/mk at 8x."""
        s = self.cfg.scale
        lr_up = upsample(lr, s)
        mkf = mk.astype(lr.dtype)
        blend = fv * mkf + lr_up * (1.0 - mkf)
        x_lr = self.encoder_lr(lr)
        x_hr = self.encoder_hr(jnp.concatenate([blend, lr_up], axis=-1))
        return x_lr, x_hr

    def compute_flow(self, lr_cur: jax.Array, lr_prev: jax.Array) -> jax.Array:
        return self.spynet(lr_cur, lr_prev)

    def init_state(self, batch: int, h: int, w: int, dtype=jnp.float32) -> State:
        cfg = self.cfg
        s = cfg.scale
        state: State = {
            "hr": jnp.zeros((batch, h * s, w * s, cfg.last_channels), dtype)
        }
        if cfg.variant == "v18":
            sc = cfg.state_channels
            state["lv"] = tuple(
                jnp.zeros((batch, h * 2, w * 2, sc), dtype) for _ in range(3)
            )
        return state

    def _reconstruct(self, y: jax.Array, x_hr: jax.Array, mk: jax.Array, lr: jax.Array):
        """Fovea texture blend + conv_last + bilinear-8x base residual."""
        cfg = self.cfg
        mkf = mk.astype(y.dtype)
        blended = self.conv_tttf(jnp.concatenate([y, x_hr], axis=-1))
        y = mkf * blended + (1.0 - mkf) * y
        y = lrelu(y)
        base = upsample(rgb2y(lr) if cfg.y_only else lr, cfg.scale)
        return y, self.conv_last(y) + base

    def step0(self, lr, x_lr, x_hr, mk):
        """First frame: zero states, no warping (the reference's i==0 branch)."""
        cfg = self.cfg
        n, h, w, _ = lr.shape
        m, last = cfg.mid_channels, cfg.last_channels
        z_lv3 = jnp.zeros((n, h * 2, w * 2, m), lr.dtype)
        z_hr = jnp.zeros((n, h * cfg.scale, w * cfg.scale, last), lr.dtype)
        feat_prop_lv0 = self.upsample(x_lr)

        if cfg.variant == "v18":
            sc = cfg.state_channels
            z_lv = jnp.zeros((n, h * 2, w * 2, sc), lr.dtype)
            x, lvs = feat_prop_lv0, []
            for rb in (self.forward_resblocks_0, self.forward_resblocks_1, self.forward_resblocks_2):
                x = rb(jnp.concatenate([x, z_lv3, z_lv], axis=-1))
                chunks = jnp.split(x, 4, axis=-1)
                lvs.append(jnp.concatenate(chunks[cfg.split_ratio:], axis=-1))
                x = jnp.concatenate(chunks[: cfg.split_ratio], axis=-1)
            x = lrelu(self.upsample_post(x))
            y = self.forward_resblocks_3(jnp.concatenate([x, z_hr], axis=-1))
            y, out = self._reconstruct(y, x_hr, mk, lr)
            state = {"hr": y, "lv": tuple(lvs)}
            return state, out

        reps = 3 if cfg.variant == "v15" else 2
        x = feat_prop_lv0
        for rb in (self.forward_resblocks_0, self.forward_resblocks_1, self.forward_resblocks_2):
            x = rb(jnp.concatenate([x] + [z_lv3] * (reps - 1), axis=-1))
        if cfg.hr_dcn:
            x = lrelu(self.upsample_post(x))
            y = self.forward_resblocks_3(jnp.concatenate([x] + [z_hr] * (reps - 1), axis=-1))
        else:
            y = self.forward_resblocks_3(jnp.concatenate([x] + [z_lv3] * (reps - 1), axis=-1))
            y = lrelu(self.upsample_post(y))
        y, out = self._reconstruct(y, x_hr, mk, lr)
        return {"hr": y}, out

    def step(self, state: State, lr, x_lr, x_hr, mk, flow, fg=None):
        """One recurrent step (the reference's i>0 branch).

        fg: optional (N, 8h, 8w, 1) regional-computation gate multiplying
        trunk features before resblocks 1-3 (streaming CRFP_test semantics).
        """
        cfg = self.cfg
        feat_prop_lv0 = self.upsample(x_lr)
        flow_lv3 = upsample(flow, 2) * 2.0
        flow_lv0 = upsample(flow, cfg.scale) * float(cfg.scale)
        hr_state = state["hr"]

        fg_lv3 = fg_lv0 = None
        if fg is not None:
            fg_lv3 = fg.astype(lr.dtype)
            fg_lv0 = resize_bilinear(fg_lv3, (fg.shape[1] // 4, fg.shape[2] // 4))

        if cfg.variant == "v18":
            lv3_state = self.downsample(hr_state)
            lv3_warped = flow_warp(lv3_state, flow_lv3)
            hr_warped = flow_warp(hr_state, flow_lv0)
            f0, f1, f2 = state["lv"]
            mixed = flow_warp(jnp.concatenate([f0, f1, f2], axis=-1), flow_lv3)
            f0, f1, f2 = jnp.split(mixed, 3, axis=-1)

            offset = None
            lvs = []
            x = jnp.concatenate([feat_prop_lv0, f0], axis=-1)
            for idx, (dcn, rb, f) in enumerate((
                (self.dcn_0, self.forward_resblocks_0, f0),
                (self.dcn_1, self.forward_resblocks_1, f1),
                (self.dcn_2, self.forward_resblocks_2, f2),
            )):
                if idx > 0:
                    x = jnp.concatenate([x, f], axis=-1)
                aligned, offset_feat = dcn(x, lv3_state, lv3_warped, flow_lv3,
                                           offset if cfg.offset_prop else None)
                offset = offset_feat
                x = jnp.concatenate([x, aligned], axis=-1)
                if fg_lv0 is not None and idx > 0:
                    x = x * fg_lv0
                x = rb(x)
                chunks = jnp.split(x, 4, axis=-1)
                lvs.append(jnp.concatenate(chunks[cfg.split_ratio:], axis=-1))
                x = jnp.concatenate(chunks[: cfg.split_ratio], axis=-1)

            x = lrelu(self.upsample_post(x))
            aligned, _ = self.dcn_3(x, hr_state, hr_warped, flow_lv0,
                                    offset if cfg.offset_prop else None)
            y = jnp.concatenate([x, aligned], axis=-1)
            if fg_lv3 is not None:
                y = y * fg_lv3
            y = self.forward_resblocks_3(y)
            y, out = self._reconstruct(y, x_hr, mk, lr)
            return {"hr": y, "lv": tuple(lvs)}, out

        # ---- v13 / v15 ----
        if cfg.hr_dcn:
            hr_warped = flow_warp(hr_state, flow_lv0)
            lv3_warped = self.downsample(hr_warped)
            lv3_state = self.downsample(hr_state)
        else:
            lv3_state = self.downsample(hr_state)
            lv3_warped = flow_warp(lv3_state, flow_lv3)

        three_way = cfg.variant == "v15"
        offset = None
        x = feat_prop_lv0
        for idx, (dcn, rb) in enumerate((
            (self.dcn_0, self.forward_resblocks_0),
            (self.dcn_1, self.forward_resblocks_1),
            (self.dcn_2, self.forward_resblocks_2),
        )):
            aligned, offset_feat = dcn(x, lv3_state, lv3_warped, flow_lv3,
                                       offset if (cfg.offset_prop and idx > 0) else None)
            offset = offset_feat
            parts = [x, aligned] + ([lv3_warped] if three_way else [])
            x = jnp.concatenate(parts, axis=-1)
            if fg_lv0 is not None and idx > 0:
                x = x * fg_lv0
            x = rb(x)

        if cfg.hr_dcn:
            x = lrelu(self.upsample_post(x))
            aligned, _ = self.dcn_3(x, hr_state, hr_warped, flow_lv0,
                                    offset if cfg.offset_prop else None)
            parts = [x, aligned] + ([hr_warped] if three_way else [])
            y = jnp.concatenate(parts, axis=-1)
            if fg_lv3 is not None:
                y = y * fg_lv3
            y = self.forward_resblocks_3(y)
        else:
            aligned, _ = self.dcn_3(x, lv3_state, lv3_warped, flow_lv3,
                                    offset if cfg.offset_prop else None)
            parts = [x, aligned] + ([lv3_warped] if three_way else [])
            y = jnp.concatenate(parts, axis=-1)
            if fg_lv0 is not None:
                y = y * fg_lv0
            y = self.forward_resblocks_3(y)
            y = lrelu(self.upsample_post(y))
        y, out = self._reconstruct(y, x_hr, mk, lr)
        return {"hr": y}, out

    # ---------------- batch forward ----------------

    def _scan_step(self, carry, xs):
        state = carry
        lr, x_lr, x_hr, mk, flow = xs
        state, out = self.step(state, lr, x_lr, x_hr, mk, flow)
        return state, out

    def __call__(self, lrs: jax.Array, fvs: jax.Array, mks: jax.Array) -> jax.Array:
        """Batch forward over a clip: (B,T,h,w,3) -> (B,T,8h,8w,C_out)."""
        b, t, h, w, c = lrs.shape

        # flow from each frame to its predecessor, all pairs in one batch
        prev = lrs[:, :-1].reshape(b * (t - 1), h, w, c)
        cur = lrs[:, 1:].reshape(b * (t - 1), h, w, c)
        flows = self.compute_flow(cur, prev).reshape(b, t - 1, h, w, 2)

        # per-frame encoders over all frames at once
        s = self.cfg.scale
        lr_flat = lrs.reshape(b * t, h, w, c)
        fv_flat = fvs.reshape(b * t, h * s, w * s, c)
        mk_flat = mks.reshape(b * t, h * s, w * s, 1)
        x_lr, x_hr = self.encode_frame(lr_flat, fv_flat, mk_flat)
        x_lr = x_lr.reshape(b, t, *x_lr.shape[1:])
        x_hr = x_hr.reshape(b, t, *x_hr.shape[1:])

        state, out0 = self.step0(lrs[:, 0], x_lr[:, 0], x_hr[:, 0], mks[:, 0])

        def tm(x):  # time-major
            return jnp.moveaxis(x[:, 1:], 1, 0)

        xs = (tm(lrs), tm(x_lr), tm(x_hr), tm(mks), jnp.moveaxis(flows, 1, 0))

        body = CRFP._scan_step
        if self.cfg.remat:
            body = nn.remat(body, prevent_cse=False)
        scan = nn.scan(
            body,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=0,
            out_axes=0,
        )
        _, outs = scan(self, state, xs)
        return jnp.concatenate([out0[:, None], jnp.moveaxis(outs, 0, 1)], axis=1)

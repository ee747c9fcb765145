"""The CRFP recurrent foveated-VSR trunk, one module for every variant.

The reference maintains three parallel 2.6k-9.3k-line files (CRFP.py /
CRFP_test.py / CRFP_runtime.py) with near-identical math for batch
training, stateful streaming and latency benchmarking, times six
architecture variants. Here there is ONE parameterized trunk with an
explicit per-frame ``step`` (plus a ``step0`` for the cold start); the
batch forward is ``step0`` + ``nn.scan(step)`` over time, and streaming
applies the same ``step`` with a host-held state pytree — eliminating the
triple maintenance while keeping the math of each variant exact:

- 'v13'        == CRFP_simple       (/root/reference/model/CRFP.py:816-1099)
- 'v15'        == CRFP              (/root/reference/model/CRFP.py:1101-1386)
- 'v18'        == CRFP_DSV          (/root/reference/model/CRFP.py:1387-1706,
                  the trained model, main.py:34) with the channel-split
                  persistent state (split_ratio)
- 'v18_cra'    == CRFP_DSV_CRA      (/root/reference/model/CRFP.py:2314-2665):
                  v18 + LTE pyramid encoder + per-level texture blends
- 'no_dcn'     == CRFP_simple_noDCN (/root/reference/model/CRFP.py:2000-2312):
                  DCN stages replaced by plain conv blocks (hr_dcn=False is
                  the reference's only working branch)
- 'basic_fvsr' == BasicFVSR / MRCF_simple_v0
                  (/root/reference/model/CRFP.py:1708-1998,
                  /root/reference/model/CRFP_test.py:862-1181): fovea
                  blended once at the input feature, four parallel states
                  (hr_dcn=False is the reference's only working branch)

The streaming counterparts MRCF_simple_* (/root/reference/model/CRFP_test.py)
are the same step with state carried by the caller plus optional
regional-DCN ``fg`` gating (/root/reference/model/CRFP_test.py:2347-2389).

Inputs are NHWC: lrs (B,T,h,w,3), fvs (B,T,8h,8w,3), mks (B,T,8h,8w,1);
output (B,T,8h,8w,3) (or 1 channel for y_only).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from crfp_tpu.nn.align import DCNAlign, PlainAlign
from crfp_tpu.nn.flow import FNet, SPyNet
from crfp_tpu.nn.layers import (
    Conv,
    ConvS2D,
    PixelShufflePack,
    PixelUnShufflePackV2,
    ResidualBlocksWithInputConv,
    lrelu,
)
from crfp_tpu.nn.lte import LTESimpleHR, LTESimpleHRPS, LTESimpleHRSingle, LTESimpleLR
from crfp_tpu.ops.color import rgb2y
from crfp_tpu.ops.shuffle import pixel_shuffle, pixel_unshuffle
from crfp_tpu.ops.resize import resize_bilinear, upsample, upsample_s2d
from crfp_tpu.ops.warp import flow_warp

State = dict[str, Any]

VARIANTS = ("v13", "v15", "v18", "v18_cra", "no_dcn", "basic_fvsr")


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    variant: str = "v18"
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
    # gather-free windowed DCN for the 1/4-res alignment stages: clamps
    # sample displacements to +-dcn_window pixels and runs the bilinear
    # sampling as MXU interpolation matrices (the Pallas kernel on TPU,
    # the XLA lax.map form elsewhere — docs/PERF.md). None = exact gathers.
    dcn_window: int | None = None
    # same trade for the HR-level dcn_3 (repeat mode). The flow there is
    # at 8x resolution, so its displacement budget should be ~4x the
    # 1/4-res stages' (e.g. 32 when dcn_window=8). None = exact gathers.
    dcn_window_hr: int | None = None
    # run the full-resolution tail (encoder_hr, resblocks_3, conv_tttf,
    # conv_last, fovea blends, HR state) in space-to-depth(4) layout:
    # numerically exact (ConvS2D), same parameters, but C=48-64 instead of
    # 1-6 so TPU HBM tile padding stops inflating every HR pass ~32x
    # (docs/PERF.md). Supported for the v13/v15/v18 trunks (hr_dcn=True).
    hr_s2d: bool = False
    # run the 1/4-res lv3 trunk (upsample, DCN stages 0-2, resblocks 0-2,
    # the lv level states and their warps) in space-to-depth(2) layout:
    # C=32-72 pads 2-4x in HBM tiles at the native grid; s2d(2) fills the
    # lanes (docs/PERF.md round-3 lever 1). Numerically exact, same
    # parameters. Requires hr_s2d (the lv3/HR boundaries fold into the
    # existing s2d machinery) and dcn_window (the windowed kernel takes
    # s2d operands directly; the exact gather path would round-trip).
    lv3_s2d: bool = False
    # per-cell anchored windows for the HR-level windowed ops (dcn_3 +
    # the HR state warp): each kernel grid cell's source window follows
    # the cell's quantized mean displacement instead of sitting at the
    # cell corner, cutting the ±dcn_window_hr halo to residual size
    # (~2-3.5x less kernel work) while RAISING the effective displacement
    # range for cell-coherent motion (crfp_tpu/ops/pallas/dcn.py).
    # The 1/4-res stages keep plain windows (their ±8 halo is already
    # quantum-sized).
    dcn_anchor: bool = False
    # attach the anchored Mosaic backward (anchor_vjp) to the anchored
    # windowed ops, so you train exactly what you deploy — at
    # backward-sized (fullgrad) tile geometry, which also changes the
    # resolved band/xtile of the FORWARD cell grid. Training entry points
    # set this (config.model_config in train dispatch, train_procedural
    # --dcn_anchor); inference instantiations — the runtime models,
    # bench.py, deploy_gate — keep it False so they measure the fast
    # forward-only anchored geometry actually shipped (ADVICE r4).
    dcn_anchor_vjp: bool = False
    # fused-prep windowed kernel for the 1/4-res alignment stages
    # (dcn_0/1/2): the offset/mask head outputs feed the Mosaic kernel in
    # their dense conv layout and the per-query data is built in VMEM,
    # removing the XLA-side cellwise transposes (~0.5 ms/stage at the
    # runtime shapes — docs/PERF.md levers 2-3). INFERENCE-ONLY (no VJP)
    # and TPU-backend only (ignored elsewhere). Requires dcn_window;
    # mutually exclusive with lv3_s2d (the fused kernel takes the native
    # r=1 layout).
    dcn_fused: bool = False
    # runtime models only: the step returns the output frame in s2d(4)
    # layout and the caller finishes with ops.pallas.emit.emit_frame_nhwc
    # jitted as its OWN tiny program — the Mosaic interleave replaces the
    # step's final 1080p transpose+reshape relayout pair, and keeping the
    # kernel out of the step program preserves XLA's space-to-batch conv
    # rewrites (docs/PERF.md round-3). Requires hr_s2d.
    emit_s2d: bool = False

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

    @property
    def is_dsv(self) -> bool:
        return self.variant in ("v18", "v18_cra")


class CRFP(nn.Module):
    cfg: ModelConfig

    def setup(self):
        cfg = self.cfg
        assert cfg.variant in VARIANTS, cfg.variant
        if cfg.is_dsv:
            assert cfg.hr_dcn, "the DSV trunk always runs the HR-level DCN"
        if cfg.hr_s2d:
            assert cfg.variant in ("v13", "v15", "v18"), (
                "hr_s2d is implemented for the v13/v15/v18 trunks")
            assert cfg.hr_dcn, "hr_s2d requires the HR-level cascade (hr_dcn)"
        if cfg.lv3_s2d:
            assert cfg.hr_s2d, "lv3_s2d builds on the hr_s2d tail"
            assert cfg.dcn_window is not None, (
                "lv3_s2d requires the windowed DCN (s2d kernel operands)")
        if cfg.dcn_anchor_vjp:
            assert cfg.dcn_anchor, "dcn_anchor_vjp trains the anchored path"
        if cfg.dcn_fused:
            assert cfg.dcn_window is not None, (
                "dcn_fused is a windowed-kernel dispatch mode")
            assert not cfg.lv3_s2d, (
                "the fused-prep kernel takes the native r=1 layout")
        assert not cfg.emit_s2d, (
            "emit_s2d is a runtime-model deployment knob (the batch trunk "
            "emits whole clips; its output relayout amortizes over T)")
        if cfg.variant in ("no_dcn", "basic_fvsr"):
            # the reference's hr_dcn=True branches of these models reference
            # undefined locals (CRFP.py:1895-1938, 2245-2247) — only the
            # hr_dcn=False path ever ran
            assert not cfg.hr_dcn, f"{cfg.variant} only supports hr_dcn=False"
        m, last = cfg.mid_channels, cfg.last_channels
        dg, dk, mag = cfg.deform_groups, cfg.dcn_kernel, cfg.max_residue_magnitude

        self.spynet = FNet() if cfg.flow_net == "fnet" else SPyNet()

        if cfg.variant == "no_dcn":
            self.dcn_0 = PlainAlign(m)
            self.dcn_1 = PlainAlign(m)
            self.dcn_2 = PlainAlign(m)
            self.dcn_3 = PlainAlign(m)
        else:
            t2 = dict(s2d=cfg.lv3_s2d, s2d_r=2,  # lv3 trunk stages
                      fused_prep=cfg.dcn_fused)
            self.dcn_0 = DCNAlign(m, dg, dk, mag, window=cfg.dcn_window, **t2)
            self.dcn_1 = DCNAlign(m, dg, dk, mag, pre_offset=cfg.offset_prop,
                                  window=cfg.dcn_window, **t2)
            self.dcn_2 = DCNAlign(m, dg, dk, mag, pre_offset=cfg.offset_prop,
                                  window=cfg.dcn_window, **t2)
            if cfg.hr_dcn:
                self.dcn_3 = DCNAlign(
                    last, 1, dk, mag, repeat=True, pre_offset=cfg.offset_prop,
                    interpolate="pixelshuffle", window=cfg.dcn_window_hr,
                    s2d=cfg.hr_s2d, anchor=cfg.dcn_anchor, anchor_vjp=cfg.dcn_anchor_vjp,
                    pre_offset_s2d=2 if cfg.lv3_s2d else 1,
                )
            else:
                self.dcn_3 = DCNAlign(m, dg, dk, mag, pre_offset=cfg.offset_prop,
                                      window=cfg.dcn_window)

        self.encoder_lr = LTESimpleLR(m)
        if cfg.variant == "basic_fvsr":
            self.encoder_hr = LTESimpleHR(m)
            self.conv_tttf = Conv(m, name="conv_tttf")
        elif cfg.variant == "v18_cra":
            self.encoder_hr = LTESimpleHRPS(last)
            self.conv_tttf = Conv(last, name="conv_tttf")
            self.conv_tttf_0 = Conv(m, name="conv_tttf_0")
            self.conv_tttf_1 = Conv(m, name="conv_tttf_1")
            self.conv_tttf_2 = Conv(m, name="conv_tttf_2")
        else:
            self.encoder_hr = LTESimpleHRSingle(last, s2d=cfg.hr_s2d)
            if cfg.hr_s2d:
                self.conv_tttf = ConvS2D(last, name="conv_tttf")
            else:
                self.conv_tttf = Conv(last, name="conv_tttf")

        rb2 = dict(s2d=cfg.lv3_s2d, s2d_r=2)
        self.forward_resblocks_0 = ResidualBlocksWithInputConv(m, 1, **rb2)
        self.forward_resblocks_1 = ResidualBlocksWithInputConv(m, 1, **rb2)
        self.forward_resblocks_2 = ResidualBlocksWithInputConv(m, 1, **rb2)
        self.forward_resblocks_3 = ResidualBlocksWithInputConv(
            last if cfg.hr_dcn else m, 1, s2d=cfg.hr_s2d)

        self.downsample = PixelUnShufflePackV2(m, 4, 3)
        up_ch = cfg.keep_channels if cfg.is_dsv else m
        self.upsample = PixelShufflePack(up_ch, 2, 3)
        self.upsample_post = PixelShufflePack(last, 4, 3)

        if cfg.hr_s2d:
            self.conv_last = ConvS2D(1 if cfg.y_only else 3, name="conv_last")
        else:
            self.conv_last = Conv(1 if cfg.y_only else 3, name="conv_last")

    # ---------------- per-frame pieces ----------------

    def encode_frame(self, lr: jax.Array, fv: jax.Array, mk: jax.Array):
        """Per-frame encoders + fovea blend. lr (N,h,w,3); fv/mk at 8x."""
        cfg = self.cfg
        s = cfg.scale
        lr_up = upsample(lr, s)
        mkf = mk.astype(lr.dtype)
        x_lr = self.encoder_lr(lr)
        if cfg.hr_s2d:
            # all HR elementwise + the encoder run in s2d(4); s2d commutes
            # with c-major concat and elementwise math, so this is exact.
            # The 1-channel HR mask becomes 16 phase channels; tiling it
            # C times aligns it with the c-major (c*16 + phase) layout.
            fv_s, mk_s, up_s = (pixel_unshuffle(a, 4) for a in (fv, mkf, lr_up))
            mk3 = jnp.tile(mk_s, (1, 1, 1, 3))
            blend = fv_s * mk3 + up_s * (1.0 - mk3)
            hr_in = jnp.concatenate([blend, up_s], axis=-1)
            return x_lr, self.encoder_hr(hr_in)
        blend = fv * mkf + lr_up * (1.0 - mkf)
        hr_in = jnp.concatenate([blend, lr_up], axis=-1)
        if cfg.variant == "basic_fvsr":
            x_hr, _, _ = self.encoder_hr(hr_in)  # quarter-res, mid channels
        elif cfg.variant == "v18_cra":
            x_hr = self.encoder_hr(hr_in)  # 4-tuple (lv0, lv1, lv2, lv3)
        else:
            x_hr = self.encoder_hr(hr_in)
        return x_lr, x_hr

    def compute_flow(self, lr_cur: jax.Array, lr_prev: jax.Array) -> jax.Array:
        return self.spynet(lr_cur, lr_prev)

    def init_state(self, batch: int, h: int, w: int, dtype=jnp.float32) -> State:
        cfg = self.cfg
        s = cfg.scale
        if cfg.variant == "basic_fvsr":
            z = jnp.zeros((batch, h * 2, w * 2, cfg.mid_channels), dtype)
            return {"p": (z, z, z, z)}
        if cfg.hr_s2d:
            state: State = {
                "hr": jnp.zeros((batch, h * 2, w * 2, cfg.last_channels * 16), dtype)
            }
        else:
            state = {
                "hr": jnp.zeros((batch, h * s, w * s, cfg.last_channels), dtype)
            }
        if cfg.is_dsv:
            sc = cfg.state_channels
            if cfg.lv3_s2d:
                # lv level states live in s2d(2) layout of (2h, 2w, sc)
                state["lv"] = tuple(
                    jnp.zeros((batch, h, w, sc * 4), dtype) for _ in range(3)
                )
            else:
                state["lv"] = tuple(
                    jnp.zeros((batch, h * 2, w * 2, sc), dtype) for _ in range(3)
                )
        return state

    def _base(self, lr: jax.Array) -> jax.Array:
        cfg = self.cfg
        return upsample(rgb2y(lr) if cfg.y_only else lr, cfg.scale)

    def _warp_hr(self, hr_state: jax.Array, flow_lv0: jax.Array) -> jax.Array:
        """HR-state warp. With dcn_window_hr set, displacements are clamped
        to the window and the warp runs gather-free: the Pallas
        interpolation-matrix kernel on TPU (21 ms -> ~3 ms at 720p,
        docs/PERF.md), an exactly-equivalent clipped-flow gather warp
        elsewhere."""
        from crfp_tpu.ops.pallas.warp import flow_warp_maybe_windowed

        return flow_warp_maybe_windowed(hr_state, flow_lv0, self.cfg.dcn_window_hr,
                                        anchor=self.cfg.dcn_anchor,
                                        anchor_vjp=self.cfg.dcn_anchor_vjp)

    def _warp_hr_s2d(self, hr_state_s2d: jax.Array, flow_s2d: jax.Array) -> jax.Array:
        """HR-state warp with state AND flow in s2d(4) layout (the hr_s2d
        tail): same sampling semantics, but the windowed kernel folds the
        s2d relayouts into its prep/post transposes."""
        from crfp_tpu.ops.pallas.warp import flow_warp_maybe_windowed_s2d

        return flow_warp_maybe_windowed_s2d(
            hr_state_s2d, flow_s2d, self.cfg.dcn_window_hr,
            anchor=self.cfg.dcn_anchor, anchor_vjp=self.cfg.dcn_anchor_vjp)

    def _reconstruct(self, y: jax.Array, x_hr: jax.Array, mk: jax.Array, lr: jax.Array):
        """Fovea texture blend + conv_last + bilinear-8x base residual."""
        mkf = mk.astype(y.dtype)
        if self.cfg.hr_s2d:
            mkf = jnp.tile(pixel_unshuffle(mkf, 4), (1, 1, 1, y.shape[-1] // 16))
        blended = self.conv_tttf(jnp.concatenate([y, x_hr], axis=-1))
        y = mkf * blended + (1.0 - mkf) * y
        y = lrelu(y)
        out = self.conv_last(y)
        if self.cfg.hr_s2d:
            # bilinear base emitted straight in s2d(4) and added dense:
            # the full-res (OH,OW,C<=3) base frame (42x lane padding) is
            # never materialized and only the summed frame pays the one
            # unavoidable output relayout
            cfg = self.cfg
            base = upsample_s2d(rgb2y(lr) if cfg.y_only else lr, cfg.scale, 4)
            return y, pixel_shuffle(out + base, 4)
        return y, out + self._base(lr)

    def _cra_blend(self, x, x_hr_lv, mk_lv2, idx):
        blend = getattr(self, f"conv_tttf_{idx}")(jnp.concatenate([x, x_hr_lv], axis=-1))
        return mk_lv2 * blend + (1.0 - mk_lv2) * x

    def _dsv_chunk(self, x):
        chunks = jnp.split(x, 4, axis=-1)
        keep = jnp.concatenate(chunks[: self.cfg.split_ratio], axis=-1)
        carry = jnp.concatenate(chunks[self.cfg.split_ratio :], axis=-1)
        return keep, carry

    def step0(self, lr, x_lr, x_hr, mk):
        """First frame: zero states, no warping (the reference's i==0 branch)."""
        cfg = self.cfg
        n, h, w, _ = lr.shape
        m, last = cfg.mid_channels, cfg.last_channels
        if cfg.lv3_s2d:
            z_lv3 = jnp.zeros((n, h, w, m * 4), lr.dtype)
        else:
            z_lv3 = jnp.zeros((n, h * 2, w * 2, m), lr.dtype)
        if cfg.hr_s2d:
            z_hr = jnp.zeros((n, h * 2, w * 2, last * 16), lr.dtype)
        else:
            z_hr = jnp.zeros((n, h * cfg.scale, w * cfg.scale, last), lr.dtype)
        # with lv3_s2d the conv output (h, w, up_ch*4) IS the s2d(2) trunk
        # layout of the 2x-upsampled feature
        feat_prop_lv0 = self.upsample(x_lr, keep_depth=cfg.lv3_s2d)

        if cfg.variant == "basic_fvsr":
            mk_lv2 = resize_bilinear(mk.astype(lr.dtype), (h * 2, w * 2))
            blended = self.conv_tttf(jnp.concatenate([feat_prop_lv0, x_hr], axis=-1))
            lv0 = mk_lv2 * blended + (1.0 - mk_lv2) * feat_prop_lv0
            ps = []
            x = lv0
            for rb in (self.forward_resblocks_0, self.forward_resblocks_1,
                       self.forward_resblocks_2, self.forward_resblocks_3):
                x = rb(jnp.concatenate([x, z_lv3], axis=-1))
                ps.append(x)
            y = lrelu(self.upsample_post(ps[3]))
            out = self.conv_last(y) + self._base(lr)
            return {"p": tuple(ps)}, out

        if cfg.is_dsv:
            cra = cfg.variant == "v18_cra"
            if cra:
                x_hr_lv0, x_hr_lv1, x_hr_lv2, x_hr_lv3 = x_hr
                mk_lv2 = resize_bilinear(mk.astype(lr.dtype), (h * 2, w * 2))
            else:
                x_hr_lv3 = x_hr
            sc = cfg.state_channels
            if cfg.lv3_s2d:
                z_lv = jnp.zeros((n, h, w, sc * 4), lr.dtype)
            else:
                z_lv = jnp.zeros((n, h * 2, w * 2, sc), lr.dtype)
            x, lvs = feat_prop_lv0, []
            for idx, rb in enumerate((self.forward_resblocks_0, self.forward_resblocks_1,
                                      self.forward_resblocks_2)):
                x = rb(jnp.concatenate([x, z_lv3, z_lv], axis=-1))
                if cra:
                    x = self._cra_blend(x, (x_hr_lv0, x_hr_lv1, x_hr_lv2)[idx], mk_lv2, idx)
                x, carry = self._dsv_chunk(x)
                lvs.append(carry)
            x = lrelu(self.upsample_post(x, keep_depth=cfg.hr_s2d,
                                         in_s2d=2 if cfg.lv3_s2d else 1))
            y = self.forward_resblocks_3(jnp.concatenate([x, z_hr], axis=-1))
            y, out = self._reconstruct(y, x_hr_lv3, mk, lr)
            return {"hr": y, "lv": tuple(lvs)}, out

        # v13 / v15 / no_dcn
        reps = 3 if cfg.variant == "v15" else 2
        x = feat_prop_lv0
        for rb in (self.forward_resblocks_0, self.forward_resblocks_1, self.forward_resblocks_2):
            x = rb(jnp.concatenate([x] + [z_lv3] * (reps - 1), axis=-1))
        if cfg.hr_dcn:
            x = lrelu(self.upsample_post(x, keep_depth=cfg.hr_s2d,
                                         in_s2d=2 if cfg.lv3_s2d else 1))
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
        n, h, w, _ = lr.shape
        feat_prop_lv0 = self.upsample(x_lr, keep_depth=cfg.lv3_s2d)
        flow_lv3 = upsample(flow, 2) * 2.0
        if cfg.lv3_s2d:
            # the whole 1/4-res trunk runs in s2d(2); its flow operand is
            # the c-major pixel_unshuffle of the (dx, dy) field
            flow_lv3 = pixel_unshuffle(flow_lv3, 2)

        fg_lv3 = fg_lv0 = None
        if fg is not None:
            fg_lv3 = fg.astype(lr.dtype)
            fg_lv0 = resize_bilinear(fg_lv3, (fg.shape[1] // 4, fg.shape[2] // 4))
            if cfg.lv3_s2d:
                fg_lv0 = pixel_unshuffle(fg_lv0, 2)  # (n,h,w,4), tile at use

        if cfg.variant == "basic_fvsr":
            mk_lv2 = resize_bilinear(mk.astype(lr.dtype), (h * 2, w * 2))
            blended = self.conv_tttf(jnp.concatenate([feat_prop_lv0, x_hr], axis=-1))
            lv0 = mk_lv2 * blended + (1.0 - mk_lv2) * feat_prop_lv0
            p0, p1, p2, p3 = state["p"]
            mixed = flow_warp(jnp.concatenate([p0, p1, p2, p3], axis=-1), flow_lv3)
            p0w, p1w, p2w, p3w = jnp.split(mixed, 4, axis=-1)

            offset = None
            a, offset_feat = self.dcn_0(lv0, p0, p0w, flow_lv3)
            offset = offset_feat
            p0n = self.forward_resblocks_0(jnp.concatenate([lv0, a], axis=-1))
            a, offset_feat = self.dcn_1(p0n, p1, p1w, flow_lv3,
                                        offset if cfg.offset_prop else None)
            offset = offset_feat
            p1n = self.forward_resblocks_1(jnp.concatenate([p0n, a], axis=-1))
            a, offset_feat = self.dcn_2(p1n, p2, p2w, flow_lv3,
                                        offset if cfg.offset_prop else None)
            offset = offset_feat
            p2n = self.forward_resblocks_2(jnp.concatenate([p1n, a], axis=-1))
            a, _ = self.dcn_3(p2n, p3, p3w, flow_lv3,
                              offset if cfg.offset_prop else None)
            p3n = self.forward_resblocks_3(jnp.concatenate([p2n, a], axis=-1))
            y = lrelu(self.upsample_post(p3n))
            out = self.conv_last(y) + self._base(lr)
            return {"p": (p0n, p1n, p2n, p3n)}, out

        flow_lv0 = upsample(flow, cfg.scale) * float(cfg.scale)
        hr_state = state["hr"]

        if cfg.is_dsv:
            cra = cfg.variant == "v18_cra"
            if cra:
                x_hr_lv0, x_hr_lv1, x_hr_lv2, x_hr_lv3 = x_hr
                mk_lv2 = resize_bilinear(mk.astype(lr.dtype), (h * 2, w * 2))
            else:
                x_hr_lv3 = x_hr
            if cfg.hr_s2d:
                # the HR state, flow, warp and dcn_3 all stay in s2d(4):
                # the kernels sample at full resolution but fold every
                # relayout into their prep/post transposes, so no
                # pixel_shuffle round trips are materialized
                flow_s2d = upsample_s2d(flow, cfg.scale, 4) * float(cfg.scale)
                # (the full-res flow_lv0 is dead in this branch and DCE'd)
                lv3_state = self.downsample(hr_state, pre_shuffled=True,
                                            out_s2d=2 if cfg.lv3_s2d else 1)
                hr_warped = self._warp_hr_s2d(hr_state, flow_s2d)
            else:
                lv3_state = self.downsample(hr_state)
                hr_warped = self._warp_hr(hr_state, flow_lv0)
            # the 1/4-res state warps share the trunk DCN's displacement
            # budget: with dcn_window set they ride the windowed kernel
            # instead of XLA gathers (docs/PERF.md)
            from crfp_tpu.ops.pallas.warp import (
                flow_warp_maybe_windowed,
                flow_warp_maybe_windowed_s2d,
            )

            if cfg.lv3_s2d:
                # everything (states, flow) is s2d(2); c-major concat of
                # s2d tensors IS the s2d of the concat, so the 3-state
                # bundle warps in one kernel call exactly as natively
                warp_lv3 = lambda a: flow_warp_maybe_windowed_s2d(  # noqa: E731
                    a, flow_lv3, cfg.dcn_window, r=2)
            else:
                warp_lv3 = lambda a: flow_warp_maybe_windowed(  # noqa: E731
                    a, flow_lv3, cfg.dcn_window)
            lv3_warped = warp_lv3(lv3_state)
            f0, f1, f2 = state["lv"]
            mixed = warp_lv3(jnp.concatenate([f0, f1, f2], axis=-1))
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
                    if cfg.lv3_s2d:
                        x = x * jnp.tile(fg_lv0, (1, 1, 1, x.shape[-1] // 4))
                    else:
                        x = x * fg_lv0
                x = rb(x)
                if cra:
                    x = self._cra_blend(x, (x_hr_lv0, x_hr_lv1, x_hr_lv2)[idx], mk_lv2, idx)
                x, carry = self._dsv_chunk(x)
                lvs.append(carry)

            x = lrelu(self.upsample_post(x, keep_depth=cfg.hr_s2d,
                                         in_s2d=2 if cfg.lv3_s2d else 1))
            if cfg.hr_s2d:
                # every dcn_3 operand (incl. the sampled state) is s2d
                aligned, _ = self.dcn_3(x, hr_state, hr_warped, flow_s2d,
                                        offset if cfg.offset_prop else None)
            else:
                aligned, _ = self.dcn_3(x, hr_state, hr_warped, flow_lv0,
                                        offset if cfg.offset_prop else None)
            y = jnp.concatenate([x, aligned], axis=-1)
            if fg_lv3 is not None:
                if cfg.hr_s2d:
                    fg_s = pixel_unshuffle(fg_lv3, 4)
                    y = y * jnp.tile(fg_s, (1, 1, 1, y.shape[-1] // 16))
                else:
                    y = y * fg_lv3
            y = self.forward_resblocks_3(y)
            y, out = self._reconstruct(y, x_hr_lv3, mk, lr)
            return {"hr": y, "lv": tuple(lvs)}, out

        if cfg.variant == "no_dcn":
            lv3_state = self.downsample(hr_state)
            lv3_warped = flow_warp(lv3_state, flow_lv3)
            x = feat_prop_lv0
            for idx, (blk, rb) in enumerate((
                (self.dcn_0, self.forward_resblocks_0),
                (self.dcn_1, self.forward_resblocks_1),
                (self.dcn_2, self.forward_resblocks_2),
            )):
                a = blk(jnp.concatenate([x, lv3_warped, flow_lv3], axis=-1))
                x = jnp.concatenate([x, a], axis=-1)
                if fg_lv0 is not None and idx > 0:
                    x = x * fg_lv0
                x = rb(x)
            a = self.dcn_3(jnp.concatenate([x, lv3_warped, flow_lv3], axis=-1))
            y = jnp.concatenate([x, a], axis=-1)
            if fg_lv0 is not None:
                y = y * fg_lv0
            y = self.forward_resblocks_3(y)
            y = lrelu(self.upsample_post(y))
            y, out = self._reconstruct(y, x_hr, mk, lr)
            return {"hr": y}, out

        # ---- v13 / v15 ----
        if cfg.hr_dcn:
            if cfg.hr_s2d:
                # state lives in s2d(4), exactly as in the DSV branch above
                o2 = 2 if cfg.lv3_s2d else 1
                flow_s2d = upsample_s2d(flow, cfg.scale, 4) * float(cfg.scale)
                # (the full-res flow_lv0 is dead in this branch and DCE'd)
                hr_warped = self._warp_hr_s2d(hr_state, flow_s2d)
                lv3_warped = self.downsample(hr_warped, pre_shuffled=True,
                                             out_s2d=o2)
                lv3_state = self.downsample(hr_state, pre_shuffled=True,
                                            out_s2d=o2)
            else:
                hr_warped = self._warp_hr(hr_state, flow_lv0)
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
                if cfg.lv3_s2d:
                    x = x * jnp.tile(fg_lv0, (1, 1, 1, x.shape[-1] // 4))
                else:
                    x = x * fg_lv0
            x = rb(x)

        if cfg.hr_dcn:
            x = lrelu(self.upsample_post(x, keep_depth=cfg.hr_s2d,
                                         in_s2d=2 if cfg.lv3_s2d else 1))
            if cfg.hr_s2d:
                aligned, _ = self.dcn_3(x, hr_state, hr_warped, flow_s2d,
                                        offset if cfg.offset_prop else None)
            else:
                aligned, _ = self.dcn_3(x, hr_state, hr_warped, flow_lv0,
                                        offset if cfg.offset_prop else None)
            parts = [x, aligned] + ([hr_warped] if three_way else [])
            y = jnp.concatenate(parts, axis=-1)
            if fg_lv3 is not None:
                if cfg.hr_s2d:
                    fg_s = pixel_unshuffle(fg_lv3, 4)
                    y = y * jnp.tile(fg_s, (1, 1, 1, y.shape[-1] // 16))
                else:
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

        def unflat(a):
            return a.reshape(b, t, *a.shape[1:])

        x_lr = unflat(x_lr)
        x_hr = jax.tree.map(unflat, x_hr)

        def at(tree, i):
            return jax.tree.map(lambda a: a[:, i], tree)

        state, out0 = self.step0(lrs[:, 0], x_lr[:, 0], at(x_hr, 0), mks[:, 0])

        def tm(tree):  # time-major tail frames
            return jax.tree.map(lambda a: jnp.moveaxis(a[:, 1:], 1, 0), tree)

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

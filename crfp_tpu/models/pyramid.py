"""First-generation full-pyramid runtime models (MRCF_x8 / MRCF_CRA_x8).

Port of the reference's gen-1 latency models, the one surface round 4
consolidated away (/root/reference/model/CRFP_runtime.py:1556-2335
``MRCF_x8`` and :2336-3418 ``MRCF_CRA_x8``): a 4-level ladder at
1x/2x/4x/8x LR resolution where ONLY the 8x feature ``feat_prop_lv3`` is
recurrent state — each step re-derives lv2/lv1/lv0 by cascaded 0.5x
bilinear downsampling (:2608-2610), warps every level by the (unscaled,
bilinearly upsampled) flow pyramid (:2603-2606 — the reference upsamples
flow WITHOUT rescaling its magnitudes; replicated faithfully), runs a
per-level inline DCN (dcn_pre -> [lrelu conv lrelu conv lrelu] ->
zero-init offset/mask heads, offsets ``10*tanh(.) + flipped flow``
broadcast per tap, identity-init DCN weight, :1142-1146) sampling the
UNWARPED level state, then resblocks over concat(carry-in, aligned) and a
PixelShufflePack 2x to the next level.

Texture injection differs between the two:

- ``MRCF_x8`` (cra=False): the fovea is mask-blended into the INPUT
  stream (``fvs*mk + bilinear8x(lr)*(1-mk)``, :1732), the 3-level
  ``LTE_simple_hr`` encodes the full frame, and only lv3 gets a
  ``conv_tttf`` blend under the full-resolution mask (:1834-1838).
  Deformable groups (16, 16, 4, 1) across levels (:1610-1627).
- ``MRCF_CRA_x8`` (cra=True): cross-resolution attention — ``fvs`` is the
  fovea PATCH, encoded together with the matching top-left crop of the
  upsampled LR (:2670), and every level lv1/lv2/lv3 gets its pyramid
  texture CORNER-PATCHED in place (:2725-2727, :2772-2774, :2812-2814 —
  the runtime models pin the fovea at the top-left ROI, so the mask
  degenerates to a rectangle and the blend to an in-place patch, here a
  ``dynamic_update_slice``). One deformable group at every level
  (:2384-2394).

The reference computes flows in BOTH temporal directions but uses only
the forward flows (:1684-1696); only those are computed here. The
``MRCF_x4``/``MRCF_CRA_x4`` pair (:820-1555) is ``CRFPPyramidX4`` below:
the same 4-level ladder compressed to 1x/1x/2x/4x (lv0 and lv1 share the
LR resolution — no upsample after lv0, flow_lv1 = flow_lv0, the state
pyramid stops downsampling at lv1, and lv1's warped state aliases lv0's,
:990-1000), with a 4x head. Unlike the x8 pair, BOTH x4 variants
mask-blend the fovea into the input stream; the "CRA" x4 differs only by
injecting ``conv_tttf_lv{1,2,3}`` mask blends at every level (under the
downsampled mask pyramid, :1423-1446) where plain x4 injects at lv3 only
(:1091-1095).

TPU notes: the recurrence unrolls over the t frames (the bench protocol's
t=5; the cold-start step is structurally different, so an unroll keeps
the trace simple); the per-level DCN dispatches to the windowed Pallas
kernel when ``dcn_window`` is set (same displacement-clamp trade as the
v-series) and to the exact gather formulation otherwise (the parity
configuration the mirror test pins).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from crfp_tpu.nn.align import _identity_kernel_init, _windowed_dcn
from crfp_tpu.nn.flow import SPyNet
from crfp_tpu.nn.layers import (
    Conv,
    PixelShufflePack,
    ResidualBlocksWithInputConv,
    lrelu,
)
from crfp_tpu.nn.lte import LTESimpleHR, LTESimpleLR
from crfp_tpu.ops.dcn import deform_conv2d
from crfp_tpu.ops.resize import upsample
from crfp_tpu.ops.warp import flow_warp


class PyramidLevelAlign(nn.Module):
    """One level's inline DCN alignment (CRFP_runtime.py:1730-1745 per
    level): dcn_pre conv -> lrelu/conv/lrelu/conv/lrelu block ->
    zero-init heads -> modulated deformable conv over the level state.
    Parameter names mirror the reference's ``*_lv{k}`` flat naming so the
    torch converter maps them directly."""

    mid_channels: int
    deform_groups: int
    level: int
    max_residue_magnitude: float = 10.0
    window: int | None = None

    @nn.compact
    def __call__(self, cur, state, warped, flow):
        m, g, k = self.mid_channels, self.deform_groups, 3
        k2 = k * k
        lv = f"lv{self.level}"
        feat = jnp.concatenate([cur, warped, flow], axis=-1)
        feat = Conv(m, name=f"dcn_pre_{lv}")(feat)
        feat = lrelu(feat)
        feat = lrelu(Conv(m, name=f"dcn_block_{lv}_conv1")(feat))
        feat = lrelu(Conv(m, name=f"dcn_block_{lv}_conv2")(feat))

        zero = nn.initializers.zeros
        raw = Conv(g * 2 * k2, kernel_init=zero, bias_init=zero,
                   name=f"dcn_offset_{lv}")(feat)
        n, h, w, _ = raw.shape
        raw = raw.reshape(n, h, w, g, k2, 2)
        mag = self.max_residue_magnitude
        # packed (g, tap, (y, x)) + flow (dx, dy) flipped, broadcast per
        # tap (CRFP_runtime.py:1735-1737)
        off_y = mag * jnp.tanh(raw[..., 0]) + flow[..., 1][..., None, None]
        off_x = mag * jnp.tanh(raw[..., 1]) + flow[..., 0][..., None, None]
        off = jnp.stack([off_y, off_x], axis=-1)
        mask = Conv(g * k2, kernel_init=zero, bias_init=zero,
                    name=f"dcn_mask_{lv}")(feat)
        mask = jax.nn.sigmoid(mask).reshape(n, h, w, g, k2)

        weight = self.param(f"dcn_weight_{lv}", _identity_kernel_init, (k, k, m, m))
        bias = self.param(f"dcn_bias_{lv}", nn.initializers.zeros, (m,))
        if self.window is not None:
            return _windowed_dcn(state, off, mask, weight, bias, self.window)
        return deform_conv2d(state, off, mask, weight, bias)


class CRFPPyramidX8(nn.Module):
    """Batch forward over (n, t, h, w, c) NHWC clips, 8x output.

    cra=False: ``__call__(lrs, fvs, mks)`` (MRCF_x8, full-frame fovea mask).
    cra=True:  ``__call__(lrs, fvs)`` (MRCF_CRA_x8, top-left fovea patch).
    """

    mid_channels: int = 64
    cra: bool = False
    dg_num: int = 16
    max_residue_magnitude: float = 10.0
    dcn_window: int | None = None

    def setup(self):
        m = self.mid_channels
        dgs = (1, 1, 1, 1) if self.cra else (
            self.dg_num, self.dg_num, self.dg_num // 4, self.dg_num // 16)
        self.spynet = SPyNet()
        self.aligns = [
            PyramidLevelAlign(m, dgs[k], k, self.max_residue_magnitude,
                              window=self.dcn_window, name=f"align_lv{k}")
            for k in range(4)
        ]
        self.resblocks = [
            ResidualBlocksWithInputConv(m, b, name=f"forward_resblocks_lv{k}")
            for k, b in enumerate((3, 3, 1, 1))
        ]
        self.upsamples = [
            PixelShufflePack(m, 2, 3, name=f"upsample{k}") for k in range(3)
        ]
        self.encoder_lr = LTESimpleLR(m)
        self.encoder_hr = LTESimpleHR(m)
        if self.cra:
            self.conv_tttf_lv1 = Conv(m, name="conv_tttf_lv1")
            self.conv_tttf_lv2 = Conv(m, name="conv_tttf_lv2")
        self.conv_tttf_lv3 = Conv(m, name="conv_tttf_lv3")
        self.conv_hr_lv3 = Conv(m, name="conv_hr_lv3")
        self.conv_last_lv3 = Conv(3, name="conv_last_lv3")

    # ---- per-level texture injection ------------------------------------
    def _inject(self, k: int, x, x_hr, mk):
        """cra: corner-patch conv_tttf(concat(corner, x_hr)); x8: lv3-only
        full-frame mask blend."""
        if self.cra:
            ph, pw = x_hr.shape[1:3]
            corner = x[:, :ph, :pw]
            tttf = getattr(self, f"conv_tttf_lv{k}")
            patched = tttf(jnp.concatenate([corner, x_hr], axis=-1))
            return jax.lax.dynamic_update_slice(x, patched, (0, 0, 0, 0))
        if k != 3:
            return x
        blended = self.conv_tttf_lv3(jnp.concatenate([x, x_hr], axis=-1))
        return mk * blended + (1.0 - mk) * x

    def _ladder(self, curs, states, warpeds, flows, x_hrs, mks):
        """One timestep's 4-level cascade (the i>0 branch). curs[0] is the
        LR feature; levels feed their upsampled output forward."""
        cur = curs
        out_lv3 = None
        for k in range(4):
            aligned = self.aligns[k](cur, states[k], warpeds[k], flows[k])
            x = self.resblocks[k](jnp.concatenate([cur, aligned], axis=-1))
            if k >= 1:
                x = self._inject(k, x, x_hrs[k], mks[k])
            if k < 3:
                cur = lrelu(self.upsamples[k](x))
            else:
                out_lv3 = x
        return out_lv3

    def _ladder0(self, x_lr, x_hrs, mks, shapes):
        """Cold start (i=0, CRFP_runtime.py:2840-2900): zero states, no
        flow/DCN — resblocks over concat(carry, zeros) only."""
        cur = x_lr
        out_lv3 = None
        for k in range(4):
            zeros = jnp.zeros(shapes[k], cur.dtype)
            x = self.resblocks[k](jnp.concatenate([cur, zeros], axis=-1))
            if k >= 1:
                x = self._inject(k, x, x_hrs[k], mks[k])
            if k < 3:
                cur = lrelu(self.upsamples[k](x))
            else:
                out_lv3 = x
        return out_lv3

    def __call__(self, lrs, fvs, mks=None):
        n, t, h, w, _ = lrs.shape
        m = self.mid_channels
        assert self.cra == (mks is None), (
            "MRCF_x8 takes (lrs, fvs, mks); MRCF_CRA_x8 takes (lrs, fvs)")

        flat = lrs.reshape(n * t, h, w, 3)
        # forward flows only (the backward direction is computed-but-unused
        # in the reference, CRFP_runtime.py:1684-1696)
        flows = self.spynet(
            lrs[:, 1:].reshape(n * (t - 1), h, w, 3),
            lrs[:, :-1].reshape(n * (t - 1), h, w, 3),
        ).reshape(n, t - 1, h, w, 2)

        # three CASCADED 2x upsamples (not one 8x: align_corners=False
        # bilinear composes differently, CRFP_runtime.py:1725-1727)
        lrs_lv3 = upsample(upsample(upsample(flat, 2), 2), 2)
        x_lr = self.encoder_lr(flat).reshape(n, t, h, w, m)

        if self.cra:
            ph, pw = fvs.shape[2:4]
            enc_in = jnp.concatenate(
                [fvs.reshape(n * t, ph, pw, 3), lrs_lv3[:, :ph, :pw]], axis=-1)
        else:
            fvb = fvs * mks + lrs_lv3.reshape(n, t, 8 * h, 8 * w, 3) * (1.0 - mks)
            enc_in = jnp.concatenate(
                [fvb.reshape(n * t, 8 * h, 8 * w, 3), lrs_lv3], axis=-1)
        x_hr_lv1, x_hr_lv2, x_hr_lv3 = self.encoder_hr(enc_in)
        seq = lambda a: a.reshape((n, t) + a.shape[1:])  # noqa: E731
        x_hrs = (None, seq(x_hr_lv1), seq(x_hr_lv2), seq(x_hr_lv3))

        if self.cra:
            mk_pyr = (None, None, None, None)
        else:
            mk3 = mks.reshape(n * t, 8 * h, 8 * w, 1)
            mk2 = upsample(mk3, 0.5)
            mk1 = upsample(mk2, 0.5)
            mk_pyr = (None, seq(mk1), seq(mk2), seq(mk3))

        shapes = [(n, h * 2**k, w * 2**k, m) for k in range(4)]

        def frame_in(i):
            return (
                x_lr[:, i],
                tuple(None if x is None else x[:, i] for x in x_hrs),
                tuple(None if mk is None else mk[:, i] for mk in mk_pyr),
            )

        def emit(lv3, lr_i):
            out = lrelu(self.conv_hr_lv3(lv3))
            out = self.conv_last_lv3(out)
            return out + upsample(lr_i, 8)

        cur0, hr0, mk0 = frame_in(0)
        lv3 = self._ladder0(cur0, hr0, mk0, shapes)
        outs = [emit(lv3, lrs[:, 0])]

        for i in range(1, t):
            cur_i, hr_i, mk_i = frame_in(i)
            flow0 = flows[:, i - 1]
            flow1 = upsample(flow0, 2)
            flow2 = upsample(flow1, 2)
            flow3 = upsample(flow2, 2)
            fl = (flow0, flow1, flow2, flow3)
            # lv2..lv0 re-derived from the lv3 state by cascaded 0.5x
            st3 = lv3
            st2 = upsample(st3, 0.5)
            st1 = upsample(st2, 0.5)
            st0 = upsample(st1, 0.5)
            states = (st0, st1, st2, st3)
            warpeds = tuple(flow_warp(s, f) for s, f in zip(states, fl))
            lv3 = self._ladder(cur_i, states, warpeds, fl, hr_i, mk_i)
            outs.append(emit(lv3, lrs[:, i]))

        return jnp.stack(outs, axis=1)


class CRFPPyramidX4(nn.Module):
    """Gen-1 4x pyramid pair (MRCF_x4 / MRCF_CRA_x4,
    /root/reference/model/CRFP_runtime.py:820-1176 / :1177-1555).

    Both variants: ``__call__(lrs, fvs, mks)`` with a full-frame 4x fovea
    mask — the fovea is blended into the input stream (:991 in x4,
    :1355 in CRA_x4). Level resolutions 1x/1x/2x/4x: no upsample after
    lv0 (bare lrelu, :1053), ``upsample1``/``upsample2`` after lv1/lv2,
    flow_lv1 = flow_lv0 and the lv1 warped state aliases lv0's
    (:1026-1033), the recurrent lv3 state re-derives lv2/lv1 by cascaded
    0.5x and lv0 = lv1 (:1028-1030). Emission adds a SINGLE 4x bilinear
    base (:1114, not cascaded 2x). cra=True injects ``conv_tttf_lv{k}``
    mask blends at lv1/lv2/lv3 between the resblocks and the upsample
    (:1423-1446); cra=False injects at lv3 only (:1091-1095). Deformable
    groups (16, 16, 4, 1) in both (:1240-1250)."""

    mid_channels: int = 64
    cra: bool = False
    dg_num: int = 16
    max_residue_magnitude: float = 10.0
    dcn_window: int | None = None

    def setup(self):
        m = self.mid_channels
        dgs = (self.dg_num, self.dg_num, self.dg_num // 4, self.dg_num // 16)
        self.spynet = SPyNet()
        self.aligns = [
            PyramidLevelAlign(m, dgs[k], k, self.max_residue_magnitude,
                              window=self.dcn_window, name=f"align_lv{k}")
            for k in range(4)
        ]
        self.resblocks = [
            ResidualBlocksWithInputConv(m, b, name=f"forward_resblocks_lv{k}")
            for k, b in enumerate((3, 3, 1, 1))
        ]
        # the reference x4 has upsamples after lv1/lv2 only, named 1 and 2
        self.upsamples = {
            k: PixelShufflePack(m, 2, 3, name=f"upsample{k}") for k in (1, 2)
        }
        self.encoder_lr = LTESimpleLR(m)
        self.encoder_hr = LTESimpleHR(m)
        if self.cra:
            self.conv_tttf_lv1 = Conv(m, name="conv_tttf_lv1")
            self.conv_tttf_lv2 = Conv(m, name="conv_tttf_lv2")
        self.conv_tttf_lv3 = Conv(m, name="conv_tttf_lv3")
        self.conv_hr_lv3 = Conv(m, name="conv_hr_lv3")
        self.conv_last_lv3 = Conv(3, name="conv_last_lv3")

    def _inject(self, k: int, x, x_hr, mk):
        """cra: mask blend at lv1/2/3; plain: lv3 only."""
        if k != 3 and not self.cra:
            return x
        tttf = getattr(self, f"conv_tttf_lv{k}")
        blended = tttf(jnp.concatenate([x, x_hr], axis=-1))
        return mk * blended + (1.0 - mk) * x

    def _level_tail(self, k: int, x, x_hr, mk):
        """Post-resblock per-level plumbing: inject, then upsample/lrelu."""
        if k >= 1:
            x = self._inject(k, x, x_hr, mk)
        if k == 0:
            return lrelu(x)
        if k in (1, 2):
            return lrelu(self.upsamples[k](x))
        return x

    def __call__(self, lrs, fvs, mks):
        n, t, h, w, _ = lrs.shape
        m = self.mid_channels

        flat = lrs.reshape(n * t, h, w, 3)
        flows = self.spynet(
            lrs[:, 1:].reshape(n * (t - 1), h, w, 3),
            lrs[:, :-1].reshape(n * (t - 1), h, w, 3),
        ).reshape(n, t - 1, h, w, 2)

        # two cascaded 2x upsamples to the 4x base (CRFP_runtime.py:986-988)
        lrs_lv3 = upsample(upsample(flat, 2), 2)
        x_lr = self.encoder_lr(flat).reshape(n, t, h, w, m)

        fvb = fvs * mks + lrs_lv3.reshape(n, t, 4 * h, 4 * w, 3) * (1.0 - mks)
        enc_in = jnp.concatenate(
            [fvb.reshape(n * t, 4 * h, 4 * w, 3), lrs_lv3], axis=-1)
        x_hr_lv1, x_hr_lv2, x_hr_lv3 = self.encoder_hr(enc_in)
        seq = lambda a: a.reshape((n, t) + a.shape[1:])  # noqa: E731
        x_hrs = (None, seq(x_hr_lv1), seq(x_hr_lv2), seq(x_hr_lv3))

        mk3 = mks.reshape(n * t, 4 * h, 4 * w, 1)
        mk2 = upsample(mk3, 0.5)
        mk1 = upsample(mk2, 0.5)
        mk_pyr = (None, seq(mk1), seq(mk2), seq(mk3))

        # level shapes: 1x / 1x / 2x / 4x
        scales = (1, 1, 2, 4)
        shapes = [(n, h * s, w * s, m) for s in scales]

        def frame_in(i):
            return (
                x_lr[:, i],
                tuple(None if x is None else x[:, i] for x in x_hrs),
                tuple(None if mk is None else mk[:, i] for mk in mk_pyr),
            )

        def emit(lv3, lr_i):
            out = lrelu(self.conv_hr_lv3(lv3))
            out = self.conv_last_lv3(out)
            return out + upsample(lr_i, 4)

        # cold start: zero states, no flow/DCN
        cur0, hr0, mk0 = frame_in(0)
        cur = cur0
        lv3 = None
        for k in range(4):
            zeros = jnp.zeros(shapes[k], cur.dtype)
            x = self.resblocks[k](jnp.concatenate([cur, zeros], axis=-1))
            x = self._level_tail(k, x, hr0[k], mk0[k])
            if k < 3:
                cur = x
            else:
                lv3 = x
        outs = [emit(lv3, lrs[:, 0])]

        for i in range(1, t):
            cur_i, hr_i, mk_i = frame_in(i)
            flow0 = flows[:, i - 1]
            flow1 = flow0  # lv1 shares the LR resolution (:1023)
            flow2 = upsample(flow1, 2)
            flow3 = upsample(flow2, 2)
            fl = (flow0, flow1, flow2, flow3)
            st3 = lv3
            st2 = upsample(st3, 0.5)
            st1 = upsample(st2, 0.5)
            st0 = st1  # lv0 state aliases lv1's (:1030)
            states = (st0, st1, st2, st3)
            w0 = flow_warp(st0, flow0)
            warpeds = (w0, w0, flow_warp(st2, flow2), flow_warp(st3, flow3))
            cur = cur_i
            for k in range(4):
                aligned = self.aligns[k](cur, states[k], warpeds[k], fl[k])
                x = self.resblocks[k](jnp.concatenate([cur, aligned], axis=-1))
                x = self._level_tail(k, x, hr_i[k], mk_i[k])
                if k < 3:
                    cur = x
                else:
                    lv3 = x
            outs.append(emit(lv3, lrs[:, i]))

        return jnp.stack(outs, axis=1)

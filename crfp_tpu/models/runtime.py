"""Latency-oriented v18 trunk with static regional-computation (warp_size).

Replicates the reference's benchmark model MRCF_simple_v18 in
CRFP_runtime.py:8364-8664: flow is estimated only on the warp_size/8 crop
of the LR frame (:8492), the DCN/alignment cascade runs on ROI crops
anchored at the top-left, the per-level DSV carries live at ROI/4
resolution (:8562-8592), the keep-path of the cascade reuses the original
upsampled feature at each level (the reference drops the chunked keep,
:8563), and only the final resblock stitches the ROI back into the full
frame via the two-input-conv block (ResidualBlocksWithInputConv_v2,
:464-556). The fovea patch is blended into the top-left corner in place
(:8638-8641).

TPU-native: warp_size is a static Python tuple, so every crop is a static
slice and the in-place patches are ``lax.dynamic_update_slice`` — one
compiled program per warp_size, as SURVEY.md §5.7 prescribes.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from crfp_tpu.models.crfp import ModelConfig
from crfp_tpu.nn.align import DCNAlign
from crfp_tpu.nn.flow import FNet
from crfp_tpu.nn.layers import (
    Conv,
    ConvS2D,
    PixelShufflePack,
    PixelUnShufflePackV2,
    ResidualBlockNoBN,
    ResidualBlocksWithInputConv,
    lrelu,
)
from crfp_tpu.nn.lte import LTESimpleHRSingle, LTESimpleLR
from crfp_tpu.ops.resize import upsample, upsample_s2d
from crfp_tpu.ops.shuffle import pixel_shuffle, pixel_unshuffle
from crfp_tpu.ops.warp import flow_warp

State = dict[str, Any]


class ResidualBlocksWithInputConvV2(nn.Module):
    """Two input convs; the ROI result of conv1 is patched into the
    full-frame result of conv2 before the residual blocks.

    ``s2d``: evaluate in space-to-depth(4) layout (ConvS2D; the stitch
    coordinates are block-aligned because warp_size is a multiple of 4)."""

    out_channels: int
    num_blocks: int = 1
    s2d: bool = False
    s2d_r: int = 4

    @nn.compact
    def __call__(self, feat_roi: jax.Array, feat_full: jax.Array | None = None) -> jax.Array:
        if self.s2d:
            conv_cls = lambda feats, **kw: ConvS2D(feats, r=self.s2d_r, **kw)  # noqa: E731
        else:
            conv_cls = Conv
        o1 = conv_cls(self.out_channels, name="conv1")(feat_roi)
        if feat_full is not None and feat_full.shape[1:3] != feat_roi.shape[1:3]:
            full = conv_cls(self.out_channels, name="conv2")(feat_full)
            x = jax.lax.dynamic_update_slice(full, o1, (0, 0, 0, 0))
        else:
            # same-size "stitch" fully overwrites conv2's output, so conv2
            # is dead compute (the reference still runs it; we skip it)
            x = o1
        x = lrelu(x)
        for i in range(self.num_blocks):
            x = ResidualBlockNoBN(self.out_channels, s2d=self.s2d, s2d_r=self.s2d_r,
                                  name=f"block{i}")(x)
        return x


class CRFPRuntimeV18(nn.Module):
    """Streaming step API: init is implicit (state=None -> cold start)."""

    cfg: ModelConfig
    warp_size: tuple[int, int] = (720, 720)
    nofv: bool = False  # MRCF_simple_v18_nofv: drop the HR/fovea branch
                        # entirely (/root/reference/model/CRFP_runtime.py:8684-8830)

    def setup(self):
        cfg = self.cfg
        if cfg.lv3_s2d:
            assert cfg.hr_s2d and cfg.dcn_window is not None
            assert all(v % 8 == 0 for v in self.warp_size), (
                "lv3_s2d ROI crops must be s2d(2)-block-aligned at 1/4 res")
        if cfg.emit_s2d:
            assert cfg.hr_s2d, "emit_s2d emits the hr_s2d tail's s2d frame"
        m, last = cfg.mid_channels, cfg.last_channels
        dg, dk, mag = cfg.deform_groups, cfg.dcn_kernel, cfg.max_residue_magnitude
        self.spynet = FNet()
        t2 = dict(s2d=cfg.lv3_s2d, s2d_r=2,  # 1/4-res trunk stages
                  fused_prep=cfg.dcn_fused)
        self.dcn_0 = DCNAlign(m, dg, dk, mag, window=cfg.dcn_window, **t2)
        self.dcn_1 = DCNAlign(m, dg, dk, mag, pre_offset=cfg.offset_prop,
                              window=cfg.dcn_window, **t2)
        self.dcn_2 = DCNAlign(m, dg, dk, mag, pre_offset=cfg.offset_prop,
                              window=cfg.dcn_window, **t2)
        self.dcn_3 = DCNAlign(last, 1, dk, mag, repeat=True, pre_offset=cfg.offset_prop,
                              interpolate="pixelshuffle", window=cfg.dcn_window_hr,
                              s2d=cfg.hr_s2d, anchor=cfg.dcn_anchor,
                              pre_offset_s2d=2 if cfg.lv3_s2d else 1)
        self.encoder_lr = LTESimpleLR(m)
        self.encoder_hr = LTESimpleHRSingle(last)
        s2 = cfg.hr_s2d
        if s2:
            self.conv_tttf = ConvS2D(last, name="conv_tttf")
            self.conv_last = ConvS2D(1 if cfg.y_only else 3, name="conv_last")
        else:
            self.conv_tttf = Conv(last, name="conv_tttf")
            self.conv_last = Conv(1 if cfg.y_only else 3, name="conv_last")
        # cold-start resblocks (plain) and steady-state stitching resblocks
        self.forward_resblocks_0_ = ResidualBlocksWithInputConv(m, 1)
        self.forward_resblocks_1_ = ResidualBlocksWithInputConv(m, 1)
        self.forward_resblocks_2_ = ResidualBlocksWithInputConv(m, 1)
        self.forward_resblocks_3_ = ResidualBlocksWithInputConv(last, 1, s2d=s2)
        rb2 = dict(s2d=cfg.lv3_s2d, s2d_r=2)
        self.forward_resblocks_0 = ResidualBlocksWithInputConvV2(m, 1, **rb2)
        self.forward_resblocks_1 = ResidualBlocksWithInputConvV2(m, 1, **rb2)
        self.forward_resblocks_2 = ResidualBlocksWithInputConvV2(m, 1, **rb2)
        self.forward_resblocks_3 = ResidualBlocksWithInputConvV2(last, 1, s2d=s2)
        self.downsample = PixelUnShufflePackV2(m, 4, 3)
        self.upsample = PixelShufflePack(cfg.keep_channels, 2, 3)
        self.upsample_post = PixelShufflePack(last, 4, 3)

    def encode(self, lr: jax.Array, fv: jax.Array):
        x_lr = self.encoder_lr(lr)
        if self.nofv:
            return x_lr, None
        x_hr = self.encoder_hr(jnp.concatenate([fv, fv], axis=-1))
        if self.cfg.hr_s2d:
            x_hr = pixel_unshuffle(x_hr, 4)
        return x_lr, x_hr

    def compute_flow(self, lr_cur: jax.Array, lr_prev: jax.Array) -> jax.Array:
        wph, wpw = self.warp_size
        return self.spynet(
            lr_cur[:, : wph // 8, : wpw // 8], lr_prev[:, : wph // 8, : wpw // 8]
        )

    def step0(self, lr, x_lr, x_hr):
        cfg = self.cfg
        wph, wpw = self.warp_size
        sr = cfg.split_ratio
        feat_prop_lv0 = self.upsample(x_lr)  # keep_ch @ 2h x 2w

        lvs = []
        x = feat_prop_lv0
        for rb in (self.forward_resblocks_0_, self.forward_resblocks_1_,
                   self.forward_resblocks_2_):
            full = rb(x)
            chunks = jnp.split(full, 4, axis=-1)
            lv = jnp.concatenate(chunks[sr:], axis=-1)[:, : wph // 4, : wpw // 4]
            if cfg.lv3_s2d:
                # steady state runs the 1/4-res trunk in s2d(2); the cold
                # start stays native (one frame per clip) and hands over
                # s2d-layout states
                lv = pixel_unshuffle(lv, 2)
            lvs.append(lv)
            x = jnp.concatenate(chunks[:sr], axis=-1)
        x = lrelu(self.upsample_post(x, keep_depth=cfg.hr_s2d))
        lv3 = self.forward_resblocks_3_(x)
        lv3, out = self._finish(lv3, x_hr, lr)
        hr = lv3[:, : wph // 4, : wpw // 4] if cfg.hr_s2d else lv3[:, :wph, :wpw]
        return {"hr": hr, "lv": tuple(lvs)}, out

    def step(self, state: State, lr, pre_lr, x_lr, x_hr):
        cfg = self.cfg
        wph, wpw = self.warp_size
        sr = cfg.split_ratio
        flow = self.compute_flow(lr, pre_lr)
        # with lv3_s2d the conv output (h, w, keep*4) IS the s2d(2) layout
        # of the 2x-upsampled full-frame feature
        feat_prop_lv0 = self.upsample(x_lr, keep_depth=cfg.lv3_s2d)

        flow_lv3 = upsample(flow, 2) * 2.0
        flow_lv0 = upsample(flow, cfg.scale) * float(cfg.scale)
        if cfg.lv3_s2d:
            flow_lv3 = pixel_unshuffle(flow_lv3, 2)

        hr_state = state["hr"]  # last @ ROI (s2d layout when cfg.hr_s2d)
        from crfp_tpu.ops.pallas.warp import (
            flow_warp_maybe_windowed,
            flow_warp_maybe_windowed_s2d,
        )

        if cfg.hr_s2d:
            # state/flow/warp/dcn_3 all stay in s2d(4); the kernels fold
            # the relayouts into their prep/post transposes
            flow_s2d = upsample_s2d(flow, cfg.scale, 4) * float(cfg.scale)
            hr_warped = flow_warp_maybe_windowed_s2d(
                hr_state, flow_s2d, cfg.dcn_window_hr, anchor=cfg.dcn_anchor)
            o2 = 2 if cfg.lv3_s2d else 1
            lv3_warped = self.downsample(hr_warped, pre_shuffled=True, out_s2d=o2)
            lv3_state = self.downsample(hr_state, pre_shuffled=True, out_s2d=o2)
        else:
            hr_warped = flow_warp_maybe_windowed(
                hr_state, flow_lv0, cfg.dcn_window_hr, anchor=cfg.dcn_anchor)
            lv3_warped = self.downsample(hr_warped)
            lv3_state = self.downsample(hr_state)
        f0, f1, f2 = state["lv"]
        # shares the trunk DCN's displacement budget (docs/PERF.md)
        if cfg.lv3_s2d:
            mixed = flow_warp_maybe_windowed_s2d(
                jnp.concatenate([f0, f1, f2], axis=-1), flow_lv3,
                cfg.dcn_window, r=2)
        else:
            mixed = flow_warp_maybe_windowed(
                jnp.concatenate([f0, f1, f2], axis=-1), flow_lv3, cfg.dcn_window)
        f0, f1, f2 = jnp.split(mixed, 3, axis=-1)

        if cfg.lv3_s2d:
            roi_lv0 = feat_prop_lv0[:, : wph // 8, : wpw // 8]
        else:
            roi_lv0 = feat_prop_lv0[:, : wph // 4, : wpw // 4]
        offset = None
        lvs = []
        for dcn, rb, f in (
            (self.dcn_0, self.forward_resblocks_0, f0),
            (self.dcn_1, self.forward_resblocks_1, f1),
            (self.dcn_2, self.forward_resblocks_2, f2),
        ):
            feat_temp = jnp.concatenate([roi_lv0, f], axis=-1)
            aligned, offset_feat = dcn(feat_temp, lv3_state, lv3_warped, flow_lv3,
                                       offset if cfg.offset_prop else None)
            offset = offset_feat
            full = rb(jnp.concatenate([feat_temp, aligned], axis=-1), feat_temp)
            chunks = jnp.split(full, 4, axis=-1)
            lvs.append(jnp.concatenate(chunks[sr:], axis=-1))

        full_lv3 = lrelu(self.upsample_post(feat_prop_lv0, keep_depth=cfg.hr_s2d,
                                            in_s2d=2 if cfg.lv3_s2d else 1))
        if cfg.hr_s2d:
            roi = full_lv3[:, : wph // 4, : wpw // 4]
            aligned, _ = self.dcn_3(roi, hr_state, hr_warped, flow_s2d,
                                    offset if cfg.offset_prop else None)
        else:
            roi = full_lv3[:, :wph, :wpw]
            aligned, _ = self.dcn_3(roi, hr_state, hr_warped,
                                    flow_lv0, offset if cfg.offset_prop else None)
        lv3 = self.forward_resblocks_3(
            jnp.concatenate([roi, aligned], axis=-1), full_lv3
        )
        lv3, out = self._finish(lv3, x_hr, lr)
        hr = lv3[:, : wph // 4, : wpw // 4] if cfg.hr_s2d else lv3[:, :wph, :wpw]
        return {"hr": hr, "lv": tuple(lvs)}, out

    def _finish(self, lv3, x_hr, lr):
        """Patch the fovea blend into the top-left corner, reconstruct.
        In hr_s2d mode every tensor here is in s2d(4) layout (the fovea
        corner is block-aligned: fovea sizes are multiples of 4)."""
        if x_hr is not None:
            fh, fw = x_hr.shape[1:3]
            corner = lv3[:, :fh, :fw]
            blended = self.conv_tttf(jnp.concatenate([corner, x_hr], axis=-1))
            lv3 = jax.lax.dynamic_update_slice(lv3, blended, (0, 0, 0, 0))
        lv3 = lrelu(lv3)
        out = self.conv_last(lv3)
        if self.cfg.hr_s2d:
            # bilinear base emitted straight in s2d(4) and added dense, so
            # only the summed frame pays the one unavoidable output
            # relayout. With emit_s2d the frame is returned in s2d layout
            # and the CALLER runs ops.pallas.emit.emit_frame_nhwc as a
            # separate program — an in-step pallas_call would make XLA's
            # space-to-batch pass roll back the whole HR conv chain
            # (measured net loss; docs/PERF.md round-3).
            out = out + upsample_s2d(lr, self.cfg.scale, 4)
            if self.cfg.emit_s2d:
                return lv3, out
            return lv3, pixel_shuffle(out, 4)
        return lv3, out + upsample(lr, self.cfg.scale)


class CRFPRuntimeSimple(nn.Module):
    """Runtime (warp_size ROI) counterpart of the v13/v15 trunks.

    Mirrors MRCF_simple_v13 / MRCF_simple_v15
    (/root/reference/model/CRFP_runtime.py:7446-8052, 8053-8363): no DSV
    channel-split state — the only recurrent state is the HR feature at
    the ROI. Each alignment level's DCN consumes the ORIGINAL upsampled
    feature ROI (levels chain only through offset propagation, the
    reference's quirk), every steady-state resblock stitches its ROI
    result into a full-frame conv of the upsampled feature, and v15 adds
    the warped state as a third concat input (:8249 vs :7631).

    Divergence note: the reference's stitching ``ResidualBlocksWithInputConv``
    sizes its full-frame conv at ``in_channels // 3`` (CRFP_runtime.py:481),
    which only type-checks for the v15 3-way concat; for v13 the 2-way
    concat makes that conv unusable (latent bug). Here the full-frame conv
    is sized by its actual input (ResidualBlocksWithInputConvV2).
    """

    cfg: ModelConfig
    warp_size: tuple[int, int] = (720, 720)

    def setup(self):
        cfg = self.cfg
        assert cfg.variant in ("v13", "v15"), cfg.variant
        if cfg.emit_s2d:
            assert cfg.hr_s2d, "emit_s2d emits the hr_s2d tail's s2d frame"
        m, last = cfg.mid_channels, cfg.last_channels
        dg, dk, mag = cfg.deform_groups, cfg.dcn_kernel, cfg.max_residue_magnitude
        self.spynet = FNet()
        t2 = dict(fused_prep=cfg.dcn_fused)
        self.dcn_0 = DCNAlign(m, dg, dk, mag, window=cfg.dcn_window, **t2)
        self.dcn_1 = DCNAlign(m, dg, dk, mag, pre_offset=cfg.offset_prop,
                              window=cfg.dcn_window, **t2)
        self.dcn_2 = DCNAlign(m, dg, dk, mag, pre_offset=cfg.offset_prop,
                              window=cfg.dcn_window, **t2)
        self.dcn_3 = DCNAlign(last, 1, dk, mag, repeat=True, pre_offset=cfg.offset_prop,
                              interpolate="pixelshuffle", window=cfg.dcn_window_hr,
                              s2d=cfg.hr_s2d, anchor=cfg.dcn_anchor)
        self.encoder_lr = LTESimpleLR(m)
        self.encoder_hr = LTESimpleHRSingle(last)
        s2 = cfg.hr_s2d
        if s2:
            self.conv_tttf = ConvS2D(last, name="conv_tttf")
            self.conv_last = ConvS2D(1 if cfg.y_only else 3, name="conv_last")
        else:
            self.conv_tttf = Conv(last, name="conv_tttf")
            self.conv_last = Conv(1 if cfg.y_only else 3, name="conv_last")
        self.forward_resblocks_0_ = ResidualBlocksWithInputConv(m, 1)
        self.forward_resblocks_1_ = ResidualBlocksWithInputConv(m, 1)
        self.forward_resblocks_2_ = ResidualBlocksWithInputConv(m, 1)
        self.forward_resblocks_3_ = ResidualBlocksWithInputConv(last, 1, s2d=s2)
        self.forward_resblocks_0 = ResidualBlocksWithInputConvV2(m, 1)
        self.forward_resblocks_1 = ResidualBlocksWithInputConvV2(m, 1)
        self.forward_resblocks_2 = ResidualBlocksWithInputConvV2(m, 1)
        self.forward_resblocks_3 = ResidualBlocksWithInputConvV2(last, 1, s2d=s2)
        self.downsample = PixelUnShufflePackV2(m, 4, 3)
        self.upsample = PixelShufflePack(m, 2, 3)
        self.upsample_post = PixelShufflePack(last, 4, 3)

    def encode(self, lr: jax.Array, fv: jax.Array):
        x_lr = self.encoder_lr(lr)
        x_hr = self.encoder_hr(jnp.concatenate([fv, fv], axis=-1))
        if self.cfg.hr_s2d:
            x_hr = pixel_unshuffle(x_hr, 4)
        return x_lr, x_hr

    def compute_flow(self, lr_cur: jax.Array, lr_prev: jax.Array) -> jax.Array:
        wph, wpw = self.warp_size
        return self.spynet(
            lr_cur[:, : wph // 8, : wpw // 8], lr_prev[:, : wph // 8, : wpw // 8]
        )

    def _finish(self, lv3, x_hr, lr):
        """In hr_s2d mode every tensor here is in s2d(4) layout (fovea
        sizes are multiples of 4, so the corner stays block-aligned)."""
        if x_hr is not None:
            fh, fw = x_hr.shape[1:3]
            corner = lv3[:, :fh, :fw]
            blended = self.conv_tttf(jnp.concatenate([corner, x_hr], axis=-1))
            lv3 = jax.lax.dynamic_update_slice(lv3, blended, (0, 0, 0, 0))
        lv3 = lrelu(lv3)
        out = self.conv_last(lv3)
        if self.cfg.hr_s2d:
            # bilinear base emitted straight in s2d(4) and added dense, so
            # only the summed frame pays the one unavoidable output
            # relayout. With emit_s2d the frame is returned in s2d layout
            # and the CALLER runs ops.pallas.emit.emit_frame_nhwc as a
            # separate program — an in-step pallas_call would make XLA's
            # space-to-batch pass roll back the whole HR conv chain
            # (measured net loss; docs/PERF.md round-3).
            out = out + upsample_s2d(lr, self.cfg.scale, 4)
            if self.cfg.emit_s2d:
                return lv3, out
            return lv3, pixel_shuffle(out, 4)
        return lv3, out + upsample(lr, self.cfg.scale)

    def _roi(self, lv3):
        wph, wpw = self.warp_size
        return lv3[:, : wph // 4, : wpw // 4] if self.cfg.hr_s2d else lv3[:, :wph, :wpw]

    def step0(self, lr, x_lr, x_hr):
        x = self.upsample(x_lr)
        x = self.forward_resblocks_0_(x)
        x = self.forward_resblocks_1_(x)
        x = self.forward_resblocks_2_(x)
        x = lrelu(self.upsample_post(x, keep_depth=self.cfg.hr_s2d))
        lv3 = self.forward_resblocks_3_(x)
        lv3, out = self._finish(lv3, x_hr, lr)
        return {"hr": self._roi(lv3)}, out

    def step(self, state: State, lr, pre_lr, x_lr, x_hr):
        cfg = self.cfg
        wph, wpw = self.warp_size
        three_way = cfg.variant == "v15"
        flow = self.compute_flow(lr, pre_lr)
        feat_prop_lv0 = self.upsample(x_lr)  # mid @ 2h x 2w, full frame

        flow_lv3 = upsample(flow, 2) * 2.0
        flow_lv0 = upsample(flow, cfg.scale) * float(cfg.scale)

        hr_state = state["hr"]  # last @ ROI (s2d layout when cfg.hr_s2d)
        from crfp_tpu.ops.pallas.warp import (
            flow_warp_maybe_windowed,
            flow_warp_maybe_windowed_s2d,
        )

        if cfg.hr_s2d:
            flow_s2d = upsample_s2d(flow, cfg.scale, 4) * float(cfg.scale)
            hr_warped = flow_warp_maybe_windowed_s2d(
                hr_state, flow_s2d, cfg.dcn_window_hr, anchor=cfg.dcn_anchor)
            lv3_warped = self.downsample(hr_warped, pre_shuffled=True)
            lv3_state = self.downsample(hr_state, pre_shuffled=True)
        else:
            hr_warped = flow_warp_maybe_windowed(
                hr_state, flow_lv0, cfg.dcn_window_hr, anchor=cfg.dcn_anchor)
            lv3_warped = self.downsample(hr_warped)
            lv3_state = self.downsample(hr_state)

        roi_lv0 = feat_prop_lv0[:, : wph // 4, : wpw // 4]
        offset = None
        x = roi_lv0
        for dcn, rb in (
            (self.dcn_0, self.forward_resblocks_0),
            (self.dcn_1, self.forward_resblocks_1),
            (self.dcn_2, self.forward_resblocks_2),
        ):
            aligned, offset_feat = dcn(roi_lv0, lv3_state, lv3_warped, flow_lv3,
                                       offset if cfg.offset_prop else None)
            offset = offset_feat
            parts = [roi_lv0, aligned] + ([lv3_warped] if three_way else [])
            x = rb(jnp.concatenate(parts, axis=-1), feat_prop_lv0)

        full_lv3 = lrelu(self.upsample_post(x, keep_depth=cfg.hr_s2d))
        roi_lv3 = self._roi(full_lv3)
        if cfg.hr_s2d:
            aligned, _ = self.dcn_3(roi_lv3, hr_state, hr_warped, flow_s2d,
                                    offset if cfg.offset_prop else None)
        else:
            aligned, _ = self.dcn_3(roi_lv3, hr_state, hr_warped, flow_lv0,
                                    offset if cfg.offset_prop else None)
        parts3 = [roi_lv3, aligned] + ([hr_warped] if three_way else [])
        lv3 = self.forward_resblocks_3(jnp.concatenate(parts3, axis=-1), full_lv3)
        lv3, out = self._finish(lv3, x_hr, lr)
        return {"hr": self._roi(lv3)}, out


def runtime_params_from_batch(batch_params, init_params):
    """Adapt a batch-trunk (models/crfp.py) checkpoint onto the runtime
    models' parameter tree (a non-strict merge, like the reference's
    checkpoint load, /root/reference/trainer.py:193-199 — but with the
    renames resolved instead of dropped).

    The runtime trunk splits each of the batch trunk's four
    ``forward_resblocks_i`` into a cold-start copy (``..._i_`` — its
    input conv has a smaller arity, so only its residual blocks can take
    the trained weights; the input conv keeps its init, and it only runs
    on frame 0) and a steady-state ROI-stitching V2 block whose two input
    convs (ROI conv1, full-frame conv2) both take the batch block's
    single trained ``input_conv``. Everything else maps name-for-name.
    ``init_params``: the runtime model's init tree (supplies the
    runtime-only leaves). Returns (params, n_unmapped).
    tests/test_runtime_model.py pins exact coverage."""
    import re

    import flax

    flat = flax.traverse_util.flatten_dict(batch_params, sep="/")
    mapped = {}
    rb_input = re.compile(r"^(params/forward_resblocks_)(\d)(/)input_conv(/.*)$")
    rb_any = re.compile(r"^(params/forward_resblocks_)(\d)(/.*)$")
    for k, v in flat.items():
        m = rb_input.match(k)
        if m:
            pre, i, _, rest = m.groups()
            mapped[f"{pre}{i}/conv1{rest}"] = v
            mapped[f"{pre}{i}/conv2{rest}"] = v
            mapped[f"{pre}{i}_/input_conv{rest}"] = v
            continue
        m = rb_any.match(k)
        if m:
            pre, i, rest = m.groups()
            mapped[k] = v
            mapped[f"{pre}{i}_{rest}"] = v
            continue
        mapped[k] = v

    out = dict(flax.traverse_util.flatten_dict(init_params, sep="/"))
    n_unmapped = 0
    for k in out:
        v = mapped.get(k)
        if v is not None and tuple(v.shape) == tuple(out[k].shape):
            out[k] = v
        else:
            n_unmapped += 1
    return flax.traverse_util.unflatten_dict(out, sep="/"), n_unmapped

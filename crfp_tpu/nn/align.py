"""Flow-guided deformable alignment unit (the reference's DCN_module).

Mirrors /root/reference/model/CRFP.py:281-370: concat(cur, warped_prev,
flow) -> 2-conv block -> zero-init offset head (``max_mag * tanh``) +
zero-init sigmoid mask head; the offset residual is added to the flipped
flow broadcast per tap; the DCN weight is identity-initialized. ``repeat``
mode emits one (dy,dx) pair broadcast to all k^2 taps (used by the HR-level
dcn_3 with one deformable group, /root/reference/model/CRFP.py:341-347).
``pre_offset`` fuses the previous stage's offset feature, optionally
PixelShuffle-upsampled x4 and doubled when crossing resolutions
(/root/reference/model/CRFP.py:333-336).

Offsets are handed to :func:`crfp_tpu.ops.dcn.deform_conv2d` in structured
(N,H,W,G,K2,2) form — the packed-channel torch layouts are documented in
crfp_tpu/ops/dcn.py and in the weight converter.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from crfp_tpu.nn.layers import Conv, ConvS2D, PixelShufflePack, lrelu
from crfp_tpu.ops.shuffle import pixel_shuffle
from crfp_tpu.ops.dcn import deform_conv2d, deform_conv2d_shared_offset
from crfp_tpu.ops.resize import upsample as bilinear_upsample


def _windowed_dcn(x, off, mask, weight, bias, window: int, shared: bool = False,
                  shared_mask: bool = False, s2d: int = 1,
                  anchor: bool = False, anchor_vjp: bool = False):
    """Windowed-DCN dispatch: the Mosaic kernel on TPU (differentiable via
    its custom VJP), the XLA lax.map interpolation-matrix form elsewhere
    (same math, same clamping — tests compare the two).

    ``shared``: repeat mode — ``off`` is (N,H,W,G,1,2), broadcast to every
    tap (the Pallas kernel exploits the shared fractional parts).
    ``shared_mask``: one mask per (pixel, group) broadcast to every tap.
    ``s2d``: every per-pixel operand and the output in space-to-depth(r)
    layout (see crfp_tpu/ops/pallas/dcn.py). ``anchor``: per-cell anchored
    windows — TPU kernel only; the CPU/XLA fallback keeps the plain
    ±window clamp, which the anchored kernel is exact-or-better than for
    cell-coherent motion. ``anchor_vjp``: make the anchored op trainable
    (the anchored Mosaic backward; see deform_conv2d_pallas_vjp) — costs
    backward-sized tile geometry, so leave False for pure inference."""
    if jax.default_backend() == "tpu":
        from crfp_tpu.ops.pallas.dcn import deform_conv2d_pallas_vjp

        # band 32 -> P=1024 queries/grid-cell: the MXU stages run ~1.15x
        # faster than at P=512 (round-3 tile sweep, docs/PERF.md). The
        # shared-tap HR shape measured indifferent UNANCHORED (~4.0 ms at
        # every geometry) but prefers band 32 once anchoring shrinks the
        # halo (3.34 vs 3.58 ms standalone, anchored sweep). f32 (the
        # training path) stays at band 8: its Mosaic stack peaks run
        # ~2.2x over the static estimate at the small-cpg training shapes
        # (observed 16.11M vs 7.3M est at mid=16), which the VMEM guard
        # cannot reliably predict.
        band = 32 if (x.dtype == jnp.bfloat16 and (not shared or anchor)) else 8
        return deform_conv2d_pallas_vjp(
            x, off, mask, weight, bias, max_displacement=window,
            shared_taps=shared, shared_mask=shared_mask, s2d=s2d,
            band=band, anchor=anchor, anchor_vjp=anchor_vjp,
        )
    from crfp_tpu.ops.dcn_windowed import deform_conv2d_windowed

    k2 = weight.shape[0] * weight.shape[1]
    if s2d > 1:
        from crfp_tpu.ops.pallas.dcn import _s2d_to_logical
        from crfp_tpu.ops.shuffle import pixel_unshuffle

        x, off, mask = _s2d_to_logical(shared, k2, s2d, x, off, mask)
        if shared:
            off = jnp.broadcast_to(off, off.shape[:4] + (k2, 2))
        if shared_mask:
            mask = jnp.broadcast_to(mask, mask.shape[:4] + (k2,))
        out = deform_conv2d_windowed(
            x, off, mask, weight, bias, max_displacement=window)
        return pixel_unshuffle(out, s2d)
    if shared:
        off = jnp.broadcast_to(off, off.shape[:4] + (k2, 2))
    if shared_mask:
        mask = jnp.broadcast_to(mask, mask.shape[:4] + (k2,))
    return deform_conv2d_windowed(x, off, mask, weight, bias, max_displacement=window)


def _identity_kernel_init(key, shape, dtype=jnp.float32):
    kh, kw, cin, cout = shape
    w = jnp.zeros(shape, dtype)
    idx = jnp.arange(min(cin, cout))
    return w.at[kh // 2, kw // 2, idx, idx].set(1.0)


class PlainAlign(nn.Module):
    """The no-DCN ablation block: two convs + lrelu over concat(cur,
    warped, flow) (/root/reference/model/CRFP.py:2029-2052)."""

    mid_channels: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = lrelu(Conv(self.mid_channels, name="conv1")(x))
        x = lrelu(Conv(self.mid_channels, name="conv2")(x))
        return x


class DCNAlign(nn.Module):
    mid_channels: int
    deform_groups: int = 8
    kernel: int = 3
    max_residue_magnitude: float = 10.0
    repeat: bool = False
    pre_offset: bool = False
    interpolate: str = "none"  # 'none' | 'bilinear' | 'pixelshuffle'
    offset_only: bool = False
    # when set, use the gather-free windowed DCN (displacements clamped to
    # +-window; docs/PERF.md) instead of the exact gather formulation
    window: int | None = None
    # compute the feature block + offset/mask heads in space-to-depth(r)
    # layout (ConvS2D; numerically exact, same params). EVERY input
    # (cur_x, pre_x, pre_x_aligned, flow — flow s2d of (dx, dy)) then
    # arrives in s2d(r) layout and ``aligned`` is returned in s2d(r): the
    # windowed kernel samples at full resolution but folds the relayouts
    # into its prep/post transposes (ops/pallas/dcn.py). Repeat mode uses
    # r=4 (the HR dcn_3 tail); non-repeat uses r=2 (the lv3_s2d trunk)
    # and requires ``window`` (the exact-gather fallback would round-trip
    # the relayout it exists to avoid).
    s2d: bool = False
    s2d_r: int = 4
    # layout of the incoming pre_offset_feat when it differs from this
    # stage's own (dcn_3 consumes the s2d(2) lv3 trunk's offset feature
    # through its PixelShufflePack: 1 = native grid, 2 = s2d(2))
    pre_offset_s2d: int = 1
    # per-cell anchored windows for the windowed kernel (see
    # ModelConfig.dcn_anchor)
    anchor: bool = False
    # attach the anchored custom VJP (trainable anchored windows; costs
    # backward-sized tile geometry — the batch/training trunk sets this,
    # the runtime models keep the fast inference path)
    anchor_vjp: bool = False
    # fused-prep windowed kernel (inference-only, TPU backend only): the
    # offset/mask head outputs feed the Mosaic kernel in their dense conv
    # layout and the per-query data is built in VMEM, removing the ~5
    # XLA-side cellwise transposes per stage (docs/PERF.md levers 2-3).
    # Ignored off-TPU and whenever the structured path is required
    # (repeat/s2d modes, training). See ModelConfig.dcn_fused.
    fused_prep: bool = False

    @nn.compact
    def __call__(
        self,
        cur_x: jax.Array,
        pre_x: jax.Array,
        pre_x_aligned: jax.Array,
        flow: jax.Array,
        pre_offset_feat: jax.Array | None = None,
    ) -> tuple[jax.Array, jax.Array]:
        """Returns (aligned pre_x, offset feature for propagation).

        flow is NHWC with channels (dx, dy) at the resolution of cur_x.
        """
        m = self.mid_channels
        g = self.deform_groups
        k = self.kernel
        k2 = k * k
        if self.repeat:
            assert g == 1, "repeat mode is only well-defined for one deform group"
        r = self.s2d_r
        r2 = r * r
        if self.s2d and not self.repeat:
            assert self.window is not None, (
                "non-repeat s2d DCNAlign requires the windowed kernel")
        if self.s2d:
            conv_cls = lambda feats, **kw: ConvS2D(feats, r=r, **kw)  # noqa: E731
        else:
            conv_cls = Conv

        feat = jnp.concatenate([cur_x, pre_x_aligned, flow], axis=-1)
        feat = lrelu(conv_cls(m, name="dcn_block_conv1")(feat))
        feat = lrelu(conv_cls(m, name="dcn_block_conv2")(feat))

        if pre_offset_feat is not None:
            assert self.pre_offset
            if self.interpolate == "pixelshuffle":
                # in s2d mode the PixelShufflePack's conv output IS the
                # s2d(4) layout of the upsampled feature (keep_depth);
                # pre_offset_s2d=2 additionally accepts the incoming
                # feature in the lv3_s2d trunk's s2d(2) layout
                pre_offset_feat = PixelShufflePack(m, 4, 3, name="upsample")(
                    pre_offset_feat, keep_depth=self.s2d,
                    in_s2d=self.pre_offset_s2d) * 2.0
            elif self.interpolate == "bilinear":
                pre_offset_feat = bilinear_upsample(pre_offset_feat, 4) * 2.0
            feat = lrelu(
                conv_cls(m, name="conv_fuse")(jnp.concatenate([feat, pre_offset_feat], axis=-1))
            )

        zero = nn.initializers.zeros
        if self.repeat:
            raw = conv_cls(g * 2, kernel_init=zero, bias_init=zero, name="dcn_offset")(feat)
            # per-component 10*tanh: splitting BEFORE the tanh gives each
            # tanh a single consumer chain (the kernel prep's ly or lx
            # side), so XLA fuses it into the prep transpose instead of
            # materializing the packed offset tensor — tanh counts as
            # "expensive" to the fusion heuristic and is never duplicated
            # across the two consumers (round-3 device trace: 4 standalone
            # tanh_multiply passes, ~0.24 ms each). Same math either way.
            mag = self.max_residue_magnitude
            if self.s2d and self.window is not None:
                # keep EVERYTHING in s2d: offsets/mask stay in phase layout
                # and the kernel consumes/produces s2d directly (its prep
                # transposes absorb the relayout). raw s2d channels:
                # [y x r2 phases | x x r2]; flow s2d: [dx x r2 | dy x r2].
                off_y = mag * jnp.tanh(raw[..., :r2]) + flow[..., r2:2 * r2]
                off_x = mag * jnp.tanh(raw[..., r2:]) + flow[..., :r2]
                off = jnp.stack([off_y, off_x], axis=-2)[:, :, :, None, None]
                mask = conv_cls(g, kernel_init=zero, bias_init=zero, name="dcn_mask")(feat)
                mask = jax.nn.sigmoid(mask)[:, :, :, None, None, :]  # (n,hs,ws,1,1,r2)
                weight = self.param("dcn_weight", _identity_kernel_init, (k, k, m, m))
                bias = self.param("dcn_bias", nn.initializers.zeros, (m,))
                aligned = _windowed_dcn(
                    pre_x, off, mask, weight, bias, self.window,
                    shared=True, shared_mask=True, s2d=r, anchor=self.anchor, anchor_vjp=self.anchor_vjp,
                )
                return aligned, feat
            if self.s2d:
                # exact-gather fallback: shuffle up to the full-res layout
                # (correctness path; the windowed kernel above is the TPU
                # deployment path)
                off_y = mag * jnp.tanh(raw[..., :r2]) + flow[..., r2:2 * r2]
                off_x = mag * jnp.tanh(raw[..., r2:]) + flow[..., :r2]
                off_hr = pixel_shuffle(jnp.concatenate([off_y, off_x], axis=-1), r)
                n, h, w, _ = off_hr.shape
                off = off_hr.reshape(n, h, w, 1, 2)
            else:
                n, h, w, _ = feat.shape
                # torch packs repeat offsets as [y*g..., x*g...]; g == 1 here
                off_y = mag * jnp.tanh(raw[..., :g]) + flow[..., 1][..., None]
                off_x = mag * jnp.tanh(raw[..., g:]) + flow[..., 0][..., None]
                off = jnp.stack([off_y, off_x], axis=-1)  # (n,h,w,g,2)
            if self.offset_only:
                assert not self.s2d
                mask = Conv(g * k2, kernel_init=zero, bias_init=zero, name="dcn_mask")(feat)
                mask = jax.nn.sigmoid(mask).reshape(n, h, w, g, k2)
            else:
                mask = conv_cls(g, kernel_init=zero, bias_init=zero, name="dcn_mask")(feat)
                mask = jax.nn.sigmoid(mask)
                if self.s2d:
                    mask = pixel_shuffle(mask, r)
                mask = mask[:, :, :, :, None]
            weight = self.param("dcn_weight", _identity_kernel_init, (k, k, m, m))
            bias = self.param("dcn_bias", nn.initializers.zeros, (m,))
            if self.window is not None:
                # windowed MXU kernel, shared-tap + shared-mask mode
                # (displacements clamped to +-window)
                aligned = _windowed_dcn(
                    pre_x, off[:, :, :, :, None, :], mask, weight, bias,
                    self.window, shared=True, shared_mask=True,
                    anchor=self.anchor, anchor_vjp=self.anchor_vjp,
                )
            else:
                # all taps share one offset -> 4x4-patch gather fast path
                # (deform_conv2d_shared_offset: 16 corner gathers, not 36)
                pre_full = pixel_shuffle(pre_x, r) if self.s2d else pre_x
                aligned = deform_conv2d_shared_offset(
                    pre_full, off[:, :, :, 0, :],
                    jnp.broadcast_to(mask, mask.shape[:4] + (k2,))[:, :, :, 0, :],
                    weight, bias
                )
                if self.s2d:
                    from crfp_tpu.ops.shuffle import pixel_unshuffle

                    aligned = pixel_unshuffle(aligned, r)
            return aligned, feat
        else:
            n, h, w, _ = feat.shape
            raw = conv_cls(g * 2 * k2, kernel_init=zero, bias_init=zero,
                           name="dcn_offset")(feat)
            mask = conv_cls(g * k2, kernel_init=zero, bias_init=zero,
                            name="dcn_mask")(feat)
            mask = jax.nn.sigmoid(mask)
            if (self.fused_prep and self.window is not None and not self.s2d
                    and jax.default_backend() == "tpu"
                    and pre_x.dtype == jnp.bfloat16):
                # bf16 only: the f32 geometry floor exceeds the Mosaic
                # stack at the model shapes (ops/pallas/dcn.py guard)
                # fused-prep dispatch: hand the head outputs to the kernel
                # in their dense conv layout — channel ((g*k2 + k)*2 + c)
                # for offsets, (g*k2 + k) for the mask — with tanh + flow
                # + clip fused into the conv epilogues by XLA. Same math
                # as the structured path below up to f32 reassociation.
                mag = self.max_residue_magnitude
                flow_t = jnp.tile(flow[..., ::-1], (1, 1, 1, g * k2))
                offc = jnp.clip(
                    mag * jnp.tanh(raw) + flow_t,
                    -float(self.window), float(self.window))
                weight = self.param(
                    "dcn_weight", _identity_kernel_init, (k, k, m, m))
                bias = self.param("dcn_bias", nn.initializers.zeros, (m,))
                from crfp_tpu.ops.pallas.dcn import deform_conv2d_pallas_fusedprep

                band = 32 if pre_x.dtype == jnp.bfloat16 else 8
                aligned = deform_conv2d_pallas_fusedprep(
                    pre_x, offc, mask, weight, bias,
                    max_displacement=self.window, band=band)
                return aligned, feat
            # per-component 10*tanh (single consumer per tanh -> it fuses
            # into the kernel prep; see the repeat branch note)
            mag = self.max_residue_magnitude
            if self.s2d:
                # ConvS2D output is c-major (channel = c*r^2 + phase), and
                # the logical channels enumerate (g, k2, 2) exactly as in
                # the native-grid reshape below, so the kernel's s2d
                # operand shapes fall straight out. flow s2d channels:
                # [dx x r2 | dy x r2].
                raw = raw.reshape(n, h, w, g, k2, 2, r2)
                off_y = mag * jnp.tanh(raw[..., 0, :]) + flow[..., r2:2 * r2][:, :, :, None, None, :]
                off_x = mag * jnp.tanh(raw[..., 1, :]) + flow[..., :r2][:, :, :, None, None, :]
                off = jnp.stack([off_y, off_x], axis=-2)
                mask = mask.reshape(n, h, w, g, k2, r2)
            else:
                raw = raw.reshape(n, h, w, g, k2, 2)
                off_y = mag * jnp.tanh(raw[..., 0]) + flow[..., 1][..., None, None]
                off_x = mag * jnp.tanh(raw[..., 1]) + flow[..., 0][..., None, None]
                off = jnp.stack([off_y, off_x], axis=-1)
                mask = mask.reshape(n, h, w, g, k2)

        weight = self.param("dcn_weight", _identity_kernel_init, (k, k, m, m))
        bias = self.param("dcn_bias", nn.initializers.zeros, (m,))
        if self.window is not None:
            aligned = _windowed_dcn(pre_x, off, mask, weight, bias, self.window,
                                    s2d=r if self.s2d else 1,
                                    anchor=self.anchor,
                                    anchor_vjp=self.anchor_vjp)
        else:
            aligned = deform_conv2d(pre_x, off, mask, weight, bias)
        return aligned, feat

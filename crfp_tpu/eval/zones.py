"""4-zone streaming evaluation: whole / fovea / outskirt / past-fovea.

Replicates /root/reference/test_video.py:303-379:
- gaze position per frame: ``x = sigma*randn + W/2, y = sigma*randn + H/2``
  (the Gaussian eye-tracker noise model, test_video.py:309-310);
- fovea mask: fv_size^2 window at the gaze (clipped slice semantics);
- outskirt: the fovea mask dilated 10x by a 3x3 kernel, minus the mask;
- past: union of the last 3 outskirt masks;
- regional-DCN gate fg: dcn_size^2 window centered on the fovea.
"""

from __future__ import annotations

import dataclasses

import numpy as np
from scipy import ndimage


@dataclasses.dataclass
class ZoneMasks:
    fovea: np.ndarray  # (H, W, 1) float
    mask: np.ndarray  # model input mask (zeros before fv_start)
    outskirt: np.ndarray
    fg: np.ndarray  # regional-computation gate
    top_left: tuple[int, int]


def zone_masks_step(
    h: int,
    w: int,
    gaze_yx: tuple[float, float],
    fv_size: int,
    active: bool = True,
    regional_dcn: bool = False,
    dcn_size: int = 720,
) -> ZoneMasks:
    cy = int(gaze_yx[0]) - fv_size // 2
    cx = int(gaze_yx[1]) - fv_size // 2
    mask = np.zeros((h, w, 1), np.float32)
    if active:
        y0, x0 = max(cy, 0), max(cx, 0)
        mask[y0 : cy + fv_size, x0 : cx + fv_size] = 1.0
    mk_fv = mask.copy()
    y0, x0 = max(cy, 0), max(cx, 0)
    mk_fv[y0 : cy + fv_size, x0 : cx + fv_size] = 1.0

    dil = ndimage.binary_dilation(mk_fv[..., 0] > 0, np.ones((3, 3), bool), iterations=10)
    outskirt = (dil & ~(mask[..., 0] > 0)).astype(np.float32)[..., None]

    if regional_dcn:
        fg = np.zeros((h, w, 1), np.float32)
        st_x = max(cx + fv_size // 2 - dcn_size // 2, 0)
        ed_x = min(cx + fv_size // 2 + dcn_size // 2, w)
        st_y = max(cy + fv_size // 2 - dcn_size // 2, 0)
        ed_y = min(cy + fv_size // 2 + dcn_size // 2, h)
        fg[st_y:ed_y, st_x:ed_x] = 1.0
    else:
        fg = np.ones((h, w, 1), np.float32)
    return ZoneMasks(fovea=mk_fv, mask=mask, outskirt=outskirt, fg=fg, top_left=(cy, cx))


def _rect_bounds(c0: int, size: int, n: int) -> tuple[int, int]:
    """Clipped-Python-slice bounds of ``arr[max(c0,0) : c0+size]`` along an
    axis of length ``n`` (the reference's mask-painting idiom,
    /root/reference/test_video.py:316-321): negative stops wrap like
    Python slices do."""
    start = max(c0, 0)
    stop = c0 + size
    if stop < 0:
        stop = n + stop
    return start, max(min(stop, n), start)


class OnChipZoneEval:
    """4-zone masked PSNR/SSIM evaluated in ONE jitted program per frame.

    The host-side :class:`StreamingZoneEval` uploads four (H, W, 1) masks
    and runs eight metric dispatches per frame — ~8 tunnel round-trips on
    the axon backend. Here the masks are *reconstructed on device* from
    scalar rectangle bounds (the fovea zone is always a clipped rectangle
    and its 10x-dilated ring is the same rectangle expanded by 10 px and
    clipped — exact for rectangles, tests/test_eval.py), and all four
    zones' PSNR+SSIM come back from a single dispatch. SSIM uses the
    fused Pallas kernel on TPU when the width is lane-aligned
    (crfp_tpu/ops/pallas/ssim.py), so the whole frame eval is on-chip
    (VERDICT r3 next-step 7).

    Zone semantics replicate /root/reference/test_video.py:303-379 (see
    :func:`zone_masks_step`): whole / fovea / outskirt (fovea dilated 10x
    by a 3x3 kernel, minus the model-input mask) / past (union of the
    last 3 outskirts). ``update`` returns nothing; ``summary`` matches
    StreamingZoneEval's dict shape.
    """

    MAX_PAST = 3

    def __init__(self, fv_size: int):
        import jax
        import jax.numpy as jnp

        from crfp_tpu.ops.metrics import masked_psnr, masked_ssim

        self.fv_size = fv_size
        self._past: list[np.ndarray] = []  # (4,) int32 outskirt rects y0,y1,x0,x1
        self._inner: list[np.ndarray] = []  # matching model-input-mask rects
        self.results: dict[str, list[float]] = {
            f"{m}_{z}": []
            for z in ("whole", "fovea", "outskirt", "past")
            for m in ("psnr", "ssim")
        }

        def rect_mask(h, w, r):
            ys = jnp.arange(h)[:, None]
            xs = jnp.arange(w)[None, :]
            m = (ys >= r[0]) & (ys < r[1]) & (xs >= r[2]) & (xs < r[3])
            return m[None, :, :, None].astype(jnp.float32)

        def metrics(sr, gt, fv_r, ring_r, inner_r, past_r, past_i, n_past):
            h, w = sr.shape[1:3]
            fovea = rect_mask(h, w, fv_r)
            outskirt = rect_mask(h, w, ring_r) * (1.0 - rect_mask(h, w, inner_r))
            past = jnp.zeros_like(fovea)
            for j in range(self.MAX_PAST):
                live = (j < n_past).astype(jnp.float32)
                past = jnp.maximum(
                    past,
                    live * rect_mask(h, w, past_r[j])
                    * (1.0 - rect_mask(h, w, past_i[j])),
                )
            ones = jnp.ones_like(fovea)
            out = []
            for m in (ones, fovea, outskirt, past):
                # an all-zero mask (e.g. 'past' on a clip's first frame)
                # would make the masked mean 0/0 NaN on device even though
                # the host discards it — substitute ones so jax_debug_nans
                # stays clean (ADVICE r4)
                nz = m.sum() > 0
                safe = jnp.where(nz, m, ones)
                out.append(jnp.where(nz, masked_psnr(sr, gt, safe), 0.0))
                out.append(jnp.where(nz, masked_ssim(sr, gt, safe), 0.0))
            return jnp.stack(out)

        self._metrics = jax.jit(metrics)

    def _rects(self, zones: ZoneMasks, h: int, w: int):
        cy, cx = zones.top_left
        f = self.fv_size
        y0, y1 = _rect_bounds(cy, f, h)
        x0, x1 = _rect_bounds(cx, f, w)
        fv_r = np.array([y0, y1, x0, x1], np.int32)
        # dilation of the clipped fovea rect by 10 iterations of 3x3: the
        # rect expanded 10 px per side (empty rects stay empty)
        if y1 > y0 and x1 > x0:
            ring = np.array([max(y0 - 10, 0), min(y1 + 10, h),
                             max(x0 - 10, 0), min(x1 + 10, w)], np.int32)
        else:
            ring = np.zeros((4,), np.int32)
        # the subtracted model-input mask (zeros when inactive)
        inner = fv_r if zones.mask.any() else np.zeros((4,), np.int32)
        return fv_r, ring, inner

    def update(self, sr, gt, zones: ZoneMasks) -> None:
        """sr/gt: (1, H, W, 3) device or host arrays in [0,1]."""
        h, w = zones.fovea.shape[:2]
        fv_r, ring, inner = self._rects(zones, h, w)
        n_past = len(self._past)
        pad = [np.zeros((4,), np.int32)] * (self.MAX_PAST - n_past)
        past_r = np.stack(self._past + pad)
        past_i = np.stack(self._inner + pad)
        vals = np.asarray(
            self._metrics(sr, gt, fv_r, ring, inner, past_r, past_i, n_past)
        )
        for i, z in enumerate(("whole", "fovea", "outskirt", "past")):
            if z == "past" and n_past == 0:
                continue
            self.results[f"psnr_{z}"].append(float(vals[2 * i]))
            self.results[f"ssim_{z}"].append(float(vals[2 * i + 1]))
        self._past.append(ring)
        self._inner.append(inner)
        if len(self._past) > self.MAX_PAST:
            self._past.pop(0)
            self._inner.pop(0)

    def new_clip(self) -> None:
        self._past.clear()
        self._inner.clear()

    def summary(self) -> dict[str, float]:
        return {k: float(np.mean(v)) if v else float("nan") for k, v in self.results.items()}


class StreamingZoneEval:
    """Accumulates 4-zone PSNR/SSIM over a streamed clip."""

    def __init__(self):
        import jax

        from crfp_tpu.ops.metrics import masked_psnr, masked_ssim

        self._metric = jax.jit(
            lambda s, h, m: (masked_psnr(s, h, m), masked_ssim(s, h, m))
        )
        self.results: dict[str, list[float]] = {
            f"{m}_{z}": []
            for z in ("whole", "fovea", "outskirt", "past")
            for m in ("psnr", "ssim")
        }
        self._past: list[np.ndarray] = []

    def update(self, sr: np.ndarray, gt: np.ndarray, zones: ZoneMasks) -> None:
        """sr/gt: (1, H, W, 3) in [0,1]."""
        ones = np.ones_like(zones.fovea)[None]
        pairs = [("whole", ones), ("fovea", zones.fovea[None]), ("outskirt", zones.outskirt[None])]
        if self._past:
            past = np.clip(np.sum(np.stack(self._past), axis=0), 0, 1)[None]
            pairs.append(("past", past))
        for name, m in pairs:
            p, s = self._metric(sr, gt, m)
            self.results[f"psnr_{name}"].append(float(p))
            self.results[f"ssim_{name}"].append(float(s))
        self._past.append(zones.outskirt)
        if len(self._past) > 3:
            self._past.pop(0)

    def new_clip(self) -> None:
        self._past.clear()

    def summary(self) -> dict[str, float]:
        return {k: float(np.mean(v)) if v else float("nan") for k, v in self.results.items()}

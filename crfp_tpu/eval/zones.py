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

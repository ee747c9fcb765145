"""REDS dataset readers (host side, numpy NHWC).

Mirrors /root/reference/dataset/reds.py:228-513:
- TrainSet: every REDS train+val clip except held-out {train 000,011,015,020}
  and {val 000,001,006,017}; sliding windows of N_frames; pre-downsampled LR
  from the ``_sharp_BI_x8`` (scale 8) / ``_sharp_BI`` (scale 4) trees;
  PIL-bicubic LR_sr; aligned random crop; Nanascan fovea; /255; paired
  h/v flips p=0.5.
- EvalSet: val clips 000/001/006/017, Evenscan.
- TestSet: train clips 000/011/015/020 (= REDS4), Evenscan.

Samples are dicts of float32 NHWC arrays keyed like the reference
('LR', 'LR_sr', 'HR', 'Ref', 'Ref_sp' [+ 'FV_sp']).
"""

from __future__ import annotations

import os

import numpy as np
import PIL.Image

from crfp_tpu.data.fovea import fovea_generator

_TRAIN_HELDOUT = ("000", "011", "015", "020")
_VAL_HELDOUT = ("000", "001", "006", "017")


def _lr_root(dataset_dir: str, scale: int) -> str:
    if scale == 8:
        return dataset_dir.replace("_sharp", "_sharp_BI_x8")
    if scale == 4:
        return dataset_dir.replace("_sharp", "_sharp_BI")
    raise ValueError(f"unsupported scale {scale}")


def _load(path: str) -> np.ndarray:
    return np.array(PIL.Image.open(path))


def _windows(dir_list: list[str], n_frames: int) -> list[list[str]]:
    out = []
    for d in dir_list:
        files = sorted(os.listdir(d))
        for i in range(0, len(files) - n_frames + 1):
            out.append([os.path.join(d, f) for f in files[i : i + n_frames]])
    return out


def _to_float(stacked: np.ndarray) -> np.ndarray:
    return stacked.astype(np.float32) / 255.0


class _RedsBase:
    def __init__(self, args):
        self.args = args
        self.scale = args.scale
        self.gt_size = args.GT_size
        self.fv_size = args.FV_size
        self.n_frames = args.N_frames

    def _load_window(self, gt_files, lr_files):
        gt = [_load(f) for f in gt_files]
        h, w, _ = gt[0].shape
        lr = [_load(f) for f in lr_files]
        from crfp_tpu import native

        if native.native_available():
            # C++ OpenMP bicubic over the whole window (PIL byte-parity)
            lr_sr = list(native.resize_bicubic_u8(np.stack(lr), h, w))
        else:
            lr_sr = [
                np.array(PIL.Image.fromarray(im).resize((w, h), PIL.Image.BICUBIC))
                for im in lr
            ]
        return gt, lr, lr_sr


class TrainSet(_RedsBase):
    def __init__(self, args, rng: np.random.Generator | None = None):
        super().__init__(args)
        self.rng = rng or np.random.default_rng()
        root = args.dataset_dir
        lroot = _lr_root(root, self.scale)

        def clips(base, sub, heldout):
            p = os.path.join(base, sub)
            return sorted(
                os.path.join(p, n) for n in os.listdir(p) if n not in heldout
            )

        gt_dirs = clips(root, "train/train/train_sharp", _TRAIN_HELDOUT) + clips(
            root, "val/val/val_sharp", _VAL_HELDOUT
        )
        lr_dirs = clips(lroot, "train/train/train_sharp", _TRAIN_HELDOUT) + clips(
            lroot, "val/val/val_sharp", _VAL_HELDOUT
        )
        self.gt_windows = _windows(gt_dirs, self.n_frames)
        self.lr_windows = _windows(lr_dirs, self.n_frames)

    def __len__(self):
        return len(self.gt_windows)

    def __getitem__(self, index):
        gt, lr, lr_sr = self._load_window(self.gt_windows[index], self.lr_windows[index])
        lr_size = self.gt_size // self.scale

        h, w, _ = lr[0].shape
        rnd_h = int(self.rng.integers(0, max(0, h - lr_size) + 1))
        rnd_w = int(self.rng.integers(0, max(0, w - lr_size) + 1))
        lr = [v[rnd_h : rnd_h + lr_size, rnd_w : rnd_w + lr_size] for v in lr]
        rh, rw = rnd_h * self.scale, rnd_w * self.scale
        gt = [v[rh : rh + self.gt_size, rw : rw + self.gt_size] for v in gt]
        lr_sr = [v[rh : rh + self.gt_size, rw : rw + self.gt_size] for v in lr_sr]

        gt = np.stack(gt)
        ref, ref_sp, _ = fovea_generator(
            gt, method="Nanascan", fv_hw=(self.fv_size, self.fv_size), rng=self.rng
        )
        sample = {
            "LR": _to_float(np.stack(lr)),
            "LR_sr": _to_float(np.stack(lr_sr)),
            "HR": _to_float(gt),
            "Ref": _to_float(ref),
            "Ref_sp": ref_sp.astype(np.float32),
        }
        if self.rng.random() < 0.5:  # hflip
            sample = {k: v[:, :, ::-1].copy() for k, v in sample.items()}
        if self.rng.random() < 0.5:  # vflip
            sample = {k: v[:, ::-1].copy() for k, v in sample.items()}
        return sample


class _FixedSet(_RedsBase):
    sub: str
    clips_names: tuple[str, ...]

    def __init__(self, args):
        super().__init__(args)
        root = args.dataset_dir
        lroot = _lr_root(root, self.scale)
        gt_dirs = sorted(os.path.join(root, self.sub, n) for n in self.clips_names)
        lr_dirs = sorted(os.path.join(lroot, self.sub, n) for n in self.clips_names)
        self.gt_windows = _windows(gt_dirs, self.n_frames)
        self.lr_windows = _windows(lr_dirs, self.n_frames)

    def __len__(self):
        return len(self.gt_windows)

    def __getitem__(self, index):
        gt, lr, lr_sr = self._load_window(self.gt_windows[index], self.lr_windows[index])
        gt = np.stack(gt)
        ref, ref_sp, fv_sp = fovea_generator(
            gt, method="Evenscan", fv_hw=(self.fv_size, self.fv_size)
        )
        return {
            "LR": _to_float(np.stack(lr)),
            "LR_sr": _to_float(np.stack(lr_sr)),
            "HR": _to_float(gt),
            "Ref": _to_float(ref),
            "Ref_sp": ref_sp.astype(np.float32),
            "FV_sp": fv_sp,
        }


class EvalSet(_FixedSet):
    sub = "val/val/val_sharp"
    clips_names = _VAL_HELDOUT


class TestSet(_FixedSet):
    sub = "train/train/train_sharp"
    clips_names = _TRAIN_HELDOUT

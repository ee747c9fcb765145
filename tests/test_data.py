"""Data pipeline: fovea scan parity vs the reference oracle, dataset IO,
loader batching, determinism."""

import os
import sys
import types

import numpy as np
import PIL.Image
import pytest

from crfp_tpu.data.fovea import fovea_generator
from crfp_tpu.data.loader import Loader


def _reference_fovea():
    """Import the reference fovea_generator with a torchvision stub."""
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.transforms = types.ModuleType("torchvision.transforms")
        tv.transforms.functional = types.ModuleType("torchvision.transforms.functional")
        tv.transforms.Compose = lambda x: x
        tv.transforms.ToTensor = object
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tv.transforms
        sys.modules["torchvision.transforms.functional"] = tv.transforms.functional
    sys.path.insert(0, "/root/reference")
    try:
        import importlib

        mod = importlib.import_module("dataset.reds")
        return mod.fovea_generator
    finally:
        sys.path.remove("/root/reference")


@pytest.mark.parametrize("method", ["Hscan", "Vscan", "Cscan", "Zscan", "Evenscan", "DemoHscan"])
@pytest.mark.parametrize("shape", [(15, 256, 256), (5, 180, 320)])
def test_deterministic_scans_match_reference(method, shape):
    ref_fn = _reference_fovea()
    t, h, w = shape
    rng = np.random.default_rng(0)
    gt = rng.uniform(0, 1, (t, h, w, 3)).astype(np.float32)

    fv, mk, sp = fovea_generator(gt, method=method, fv_hw=(64, 64))
    ref_fv, ref_mk, ref_sp = ref_fn(list(gt), method=method, FV_HW=(64, 64))

    np.testing.assert_array_equal(np.asarray(sp), np.asarray(ref_sp)[: len(sp)])
    np.testing.assert_allclose(fv, np.stack(ref_fv), atol=0)
    np.testing.assert_allclose(mk, np.stack(ref_mk), atol=0)


@pytest.mark.parametrize("method", ["Rscan", "Nanascan"])
def test_random_scans_deterministic_under_seed(method):
    gt = np.zeros((7, 128, 128, 3), np.float32)
    _, _, sp1 = fovea_generator(gt, method=method, fv_hw=(32, 32), rng=np.random.default_rng(42))
    _, _, sp2 = fovea_generator(gt, method=method, fv_hw=(32, 32), rng=np.random.default_rng(42))
    np.testing.assert_array_equal(sp1, sp2)
    # coords must keep the fovea inside the frame
    assert sp1.min() >= 0
    assert (sp1[:, 0] + 32 <= 128).all() and (sp1[:, 1] + 32 <= 128).all()


def test_nanascan_vimeo_grid():
    gt = np.zeros((7, 256, 256, 3), np.float32)
    _, mk, sp = fovea_generator(
        gt, method="Nanascan", fv_hw=(64, 64), rng=np.random.default_rng(0),
        nanascan_grid="vimeo7",
    )
    assert len(set(map(tuple, sp.tolist()))) == 7  # all 7 grid points used once
    assert mk.sum() == 7 * 64 * 64


def _make_fake_reds(root, n_clips=2, n_frames=4, gt_hw=(64, 96), scale=8):
    rng = np.random.default_rng(0)
    for split, sub, names in [
        ("train", "train/train/train_sharp", ["000", "011", "015", "020", "021", "022"]),
        ("val", "val/val/val_sharp", ["000", "001", "006", "017", "018"]),
    ]:
        for name in names:
            gt_dir = os.path.join(root, "REDS_sharp", sub, name)
            lr_dir = os.path.join(root, "REDS_sharp_BI_x8", sub, name)
            os.makedirs(gt_dir, exist_ok=True)
            os.makedirs(lr_dir, exist_ok=True)
            for i in range(n_frames):
                gt = rng.integers(0, 255, (*gt_hw, 3), np.uint8)
                PIL.Image.fromarray(gt).save(os.path.join(gt_dir, f"{i:08d}.png"))
                lr = gt[:: scale, :: scale]
                PIL.Image.fromarray(lr).save(os.path.join(lr_dir, f"{i:08d}.png"))


class _Args:
    scale = 8
    GT_size = 32
    FV_size = 16
    N_frames = 2
    batch_size = 2
    num_workers = 2
    dataset = "Reds"


def test_reds_trainset_and_loader(tmp_path):
    _make_fake_reds(str(tmp_path))
    args = _Args()
    args.dataset_dir = str(tmp_path / "REDS_sharp")

    from crfp_tpu.data import reds

    ds = reds.TrainSet(args, rng=np.random.default_rng(0))
    # (6-4 train) + (5-4 val) clips = 3 clips x 3 windows of 2 frames
    assert len(ds) == 9
    s = ds[0]
    assert s["LR"].shape == (2, 4, 4, 3)
    assert s["HR"].shape == (2, 32, 32, 3)
    assert s["Ref"].shape == (2, 32, 32, 3)
    assert s["Ref_sp"].shape == (2, 32, 32, 1)
    assert s["HR"].max() <= 1.0 and s["HR"].min() >= 0.0
    # fovea patch equals GT under the mask
    np.testing.assert_allclose(s["Ref"], s["HR"] * s["Ref_sp"], atol=1e-6)

    loader = Loader(ds, batch_size=2, shuffle=True, num_workers=2)
    batches = list(loader)
    assert len(batches) == 4
    assert batches[0]["LR"].shape == (2, 2, 4, 4, 3)

    test_ds = reds.TestSet(args)
    assert len(test_ds) == 4 * 3  # REDS4 clips x windows
    t0 = test_ds[0]
    assert "FV_sp" in t0

"""Weight converter parity: torch mirrors of the reference modules vs the
converted flax modules must agree numerically."""

import jax
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from crfp_tpu.tools.convert_torch import convert_state_dict

torch.manual_seed(0)


# ---- torch mirrors of the reference blocks (structure + names) ----


class TorchFNet(nn.Module):
    # /root/reference/model/CRFP.py:743-814
    def __init__(self, in_nc=3):
        super().__init__()
        def enc(cin, cout):
            return nn.Sequential(
                nn.Conv2d(cin, cout, 3, 1, 1), nn.ReLU(True),
                nn.Conv2d(cout, cout, 3, 1, 1), nn.ReLU(True), nn.AvgPool2d(2, 2))
        def dec(cin, cout):
            return nn.Sequential(
                nn.Conv2d(cin, cout, 3, 1, 1), nn.ReLU(True),
                nn.Conv2d(cout, cout, 3, 1, 1), nn.ReLU(True),
                nn.Upsample(scale_factor=2, mode="bilinear", align_corners=False))
        self.encoder1 = enc(2 * in_nc, 32)
        self.encoder2 = enc(32, 64)
        self.encoder3 = enc(64, 128)
        self.decoder1 = dec(128, 256)
        self.decoder2 = dec(256, 128)
        self.decoder3 = dec(128, 64)
        self.flow = nn.Sequential(
            nn.Conv2d(64, 32, 3, 1, 1), nn.ReLU(True), nn.Conv2d(32, 2, 3, 1, 1))

    def forward(self, x1, x2):
        _, _, h, w = x1.size()
        out = self.encoder1(torch.cat([x1, x2], dim=1))
        out = self.encoder2(out)
        out = self.encoder3(out)
        out = self.decoder1(out)
        out = self.decoder2(out)
        out = self.decoder3(out)
        out = torch.tanh(self.flow(out)) * 256
        return F.interpolate(out, size=(h, w), mode="bilinear", align_corners=False)


class TorchResBlocks(nn.Module):
    # /root/reference/model/CRFP.py:433-552 (num_blocks=1)
    def __init__(self, cin, cout):
        super().__init__()
        block = nn.Module()
        block.conv1 = nn.Conv2d(cout, cout, 3, 1, 1)
        block.conv2 = nn.Conv2d(cout, cout, 3, 1, 1)
        blocks = nn.Sequential()
        inner = nn.Sequential()
        inner.add_module("0", block)
        self.main = nn.Sequential(
            nn.Conv2d(cin, cout, 3, 1, 1), nn.LeakyReLU(0.1, True), inner)

    def forward(self, x):
        x = F.leaky_relu(self.main[0](x), 0.1)
        b = self.main[2][0]
        return x + b.conv2(F.relu(b.conv1(x)))


def _pixel_unshuffle_ref(x, f):
    c = x.shape[1]
    kernel = torch.zeros(f * f * c, 1, f, f)
    for y in range(f):
        for xx in range(f):
            kernel[xx + y * f :: f * f, 0, y, xx] = 1
    return F.conv2d(x, kernel, stride=f, groups=c)


class TorchPixelShufflePack(nn.Module):
    def __init__(self, cin, cout, s, k):
        super().__init__()
        self.s = s
        self.upsample_conv = nn.Conv2d(cin, cout * s * s, k, padding=(k - 1) // 2)

    def forward(self, x):
        return F.pixel_shuffle(self.upsample_conv(x), self.s)


class TorchPixelUnShufflePackV2(nn.Module):
    def __init__(self, cin, cout, s, k):
        super().__init__()
        self.s = s
        self.downsample_conv = nn.Conv2d(cin * s * s, cout, k, padding=(k - 1) // 2)

    def forward(self, x):
        return self.downsample_conv(_pixel_unshuffle_ref(x, self.s))


def _nhwc(t):
    return t.detach().permute(0, 2, 3, 1).numpy()


def _nchw(a):
    return torch.from_numpy(np.ascontiguousarray(np.transpose(a, (0, 3, 1, 2))))


def test_fnet_conversion_parity():
    from crfp_tpu.nn.flow import FNet

    tm = TorchFNet()
    sd = {f"spynet.{k}": v for k, v in tm.state_dict().items()}
    params = convert_state_dict(sd)
    params = {"params": params["params"]["spynet"]}

    rng = np.random.default_rng(0)
    x1 = rng.uniform(0, 1, (1, 16, 24, 3)).astype(np.float32)
    x2 = rng.uniform(0, 1, (1, 16, 24, 3)).astype(np.float32)
    with torch.no_grad():
        want = _nhwc(tm(_nchw(x1), _nchw(x2)))
    got = np.asarray(FNet().apply(params, x1, x2))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_resblocks_conversion_parity():
    from crfp_tpu.nn.layers import ResidualBlocksWithInputConv

    tm = TorchResBlocks(8, 16)
    sd = {f"forward_resblocks_0.{k}": v for k, v in tm.state_dict().items()}
    params = convert_state_dict(sd)
    params = {"params": params["params"]["forward_resblocks_0"]}

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 6, 7, 8)).astype(np.float32)
    with torch.no_grad():
        want = _nhwc(tm(_nchw(x)))
    got = np.asarray(ResidualBlocksWithInputConv(16, 1).apply(params, x))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_shuffle_pack_conversion_parity():
    from crfp_tpu.nn.layers import PixelShufflePack, PixelUnShufflePackV2

    tm = TorchPixelShufflePack(8, 4, 2, 3)
    sd = {f"upsample.{k}": v for k, v in tm.state_dict().items()}
    params = {"params": convert_state_dict(sd)["params"]["upsample"]}
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 5, 6, 8)).astype(np.float32)
    with torch.no_grad():
        want = _nhwc(tm(_nchw(x)))
    got = np.asarray(PixelShufflePack(4, 2, 3).apply(params, x))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)

    tm2 = TorchPixelUnShufflePackV2(4, 32, 4, 3)
    sd2 = {f"downsample.{k}": v for k, v in tm2.state_dict().items()}
    params2 = {"params": convert_state_dict(sd2)["params"]["downsample"]}
    x2 = rng.standard_normal((1, 8, 8, 4)).astype(np.float32)
    with torch.no_grad():
        want2 = _nhwc(tm2(_nchw(x2)))
    got2 = np.asarray(PixelUnShufflePackV2(32, 4, 3).apply(params2, x2))
    np.testing.assert_allclose(got2, want2, atol=1e-5, rtol=1e-5)


def test_lte_conversion_parity():
    from crfp_tpu.nn.lte import LTESimpleHRSingle

    class TorchLTE(nn.Module):  # /root/reference/model/LTE.py:100-117
        def __init__(self, mid):
            super().__init__()
            self.slice1 = nn.Sequential(
                nn.Conv2d(6, mid, 3, 1, 1), nn.LeakyReLU(0.1, True),
                nn.Conv2d(mid, mid, 3, 1, 1), nn.LeakyReLU(0.1, True))

        def forward(self, x):
            return self.slice1(x)

    tm = TorchLTE(4)
    sd = {f"encoder_hr.{k}": v for k, v in tm.state_dict().items()}
    params = {"params": convert_state_dict(sd)["params"]["encoder_hr"]}
    rng = np.random.default_rng(3)
    x = rng.uniform(0, 1, (1, 8, 8, 6)).astype(np.float32)
    with torch.no_grad():
        want = _nhwc(tm(_nchw(x)))
    got = np.asarray(LTESimpleHRSingle(4).apply(params, x))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_params_io_npz_orbax_roundtrip(tmp_path):
    """One artifact drives every consumer: npz -> load_params -> orbax
    CheckpointManager save -> load_params again must be bit-identical
    (VERDICT r4 weak #4: three formats, no interop test)."""
    import jax.numpy as jnp

    from crfp_tpu.utils.params_io import load_params, save_params_npz

    params = {
        "params": {
            "conv": {"kernel": np.arange(12, dtype=np.float32).reshape(2, 2, 3),
                     "bias": np.zeros((3,), np.float32)},
            "spynet": {"w": np.full((4,), 0.5, np.float32)},
        }
    }
    npz = str(tmp_path / "a.npz")
    save_params_npz(params, npz)
    loaded = load_params(npz)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b), params, loaded)

    # through the training CheckpointManager (the orbax format)
    import optax
    from flax.training.train_state import TrainState

    from crfp_tpu.train.checkpoint import CheckpointManager

    state = TrainState.create(
        apply_fn=lambda *a: None,
        params=jax.tree.map(jnp.asarray, loaded),
        tx=optax.sgd(1e-3),
    )
    mgr = CheckpointManager(str(tmp_path / "orbax"))
    mgr.save(7, state)
    mgr.close()

    # manager root (latest step) and the explicit step dir both load
    for p in (str(tmp_path / "orbax"), str(tmp_path / "orbax" / "7")):
        again = load_params(p)
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            params, again,
        )

    # and back to npz
    npz2 = str(tmp_path / "b.npz")
    save_params_npz(load_params(str(tmp_path / "orbax")), npz2)
    again = load_params(npz2)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b), params, again)

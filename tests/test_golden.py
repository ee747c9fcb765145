"""End-to-end golden-number agreement (GOLDEN.md, BASELINE configs 1-2):
the torch-mirror pipeline and the crfp_tpu stack, sharing weights through
the converter and each scored by its own masked-metric implementation,
must produce the same PSNR/SSIM to the 0.05 dB budget."""

import sys

sys.path.insert(0, "tests")


def test_config1_spynet_warp_golden_agreement():
    from mint_golden import golden_config1

    c1 = golden_config1(t=4, h=12, w=16)
    for tp, jp in zip(c1["torch"]["psnr"], c1["jax"]["psnr"]):
        assert abs(tp - jp) < 0.05, (tp, jp)
    for ts, js in zip(c1["torch"]["ssim"], c1["jax"]["ssim"]):
        assert abs(ts - js) < 1e-3, (ts, js)


def test_config2_v18_foveated_golden_agreement():
    from mint_golden import golden_config2

    c2 = golden_config2(t=3, h=12, w=16, mid=16)
    for zone in ("whole", "fovea"):
        tp, ts = c2["torch"][zone]
        jp, js = c2["jax"][zone]
        assert abs(tp - jp) < 0.05, (zone, tp, jp)
        assert abs(ts - js) < 1e-3, (zone, ts, js)

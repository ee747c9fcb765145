from crfp_tpu.nn.layers import (
    Conv,
    PixelShufflePack,
    PixelUnShufflePackV2,
    ResidualBlockNoBN,
    ResidualBlocksWithInputConv,
    lrelu,
)
from crfp_tpu.nn.flow import FNet, SPyNet
from crfp_tpu.nn.lte import LTESimpleLR, LTESimpleHRSingle, LTESimpleHRPS
from crfp_tpu.nn.align import DCNAlign

__all__ = [
    "Conv",
    "PixelShufflePack",
    "PixelUnShufflePackV2",
    "ResidualBlockNoBN",
    "ResidualBlocksWithInputConv",
    "lrelu",
    "FNet",
    "SPyNet",
    "LTESimpleLR",
    "LTESimpleHRSingle",
    "LTESimpleHRPS",
    "DCNAlign",
]

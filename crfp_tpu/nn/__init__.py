from crfp_tpu.nn.layers import (
    Conv,
    PixelShufflePack,
    PixelUnShufflePackV2,
    ResidualBlockNoBN,
    ResidualBlocksWithInputConv,
    lrelu,
)
from crfp_tpu.nn.flow import FNet, SPyNet
from crfp_tpu.nn.lte import LTESimpleLR, LTESimpleHR, LTESimpleHRSingle, LTESimpleHRPS
from crfp_tpu.nn.align import DCNAlign, PlainAlign
from crfp_tpu.nn.pcd import PCDAlign

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
    "LTESimpleHR",
    "LTESimpleHRSingle",
    "LTESimpleHRPS",
    "DCNAlign",
    "PlainAlign",
    "PCDAlign",
]

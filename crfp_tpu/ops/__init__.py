from crfp_tpu.ops.resize import resize_bilinear, upsample, avg_pool_2x
from crfp_tpu.ops.shuffle import pixel_shuffle, pixel_unshuffle
from crfp_tpu.ops.warp import flow_warp
from crfp_tpu.ops.dcn import deform_conv2d
from crfp_tpu.ops.color import rgb2y, bgr2ycbcr_y
from crfp_tpu.ops.metrics import masked_psnr, masked_ssim, psnr_and_ssim

__all__ = [
    "resize_bilinear",
    "upsample",
    "avg_pool_2x",
    "pixel_shuffle",
    "pixel_unshuffle",
    "flow_warp",
    "deform_conv2d",
    "rgb2y",
    "bgr2ycbcr_y",
    "masked_psnr",
    "masked_ssim",
    "psnr_and_ssim",
]

from crfp_tpu.ops.pallas.warp import flow_warp_pallas
from crfp_tpu.ops.pallas.dcn import deform_conv2d_pallas
from crfp_tpu.ops.pallas.ssim import ssim_map_pallas, masked_ssim_pallas

__all__ = ["flow_warp_pallas", "deform_conv2d_pallas", "ssim_map_pallas", "masked_ssim_pallas"]

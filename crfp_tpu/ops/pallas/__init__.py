from crfp_tpu.ops.pallas.warp import flow_warp_pallas
from crfp_tpu.ops.pallas.dcn import deform_conv2d_pallas

__all__ = ["flow_warp_pallas", "deform_conv2d_pallas"]

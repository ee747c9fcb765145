"""Pallas DCN: intentionally delegated to the XLA formulation.

See docs/PERF.md: XLA fuses the bilinear gathers into the mask-multiply
and MXU contraction (the 9x sampled tensor never hits HBM), and Mosaic
has no vector gather, so an in-kernel gather would scalarize. The
TPU-native DCN is crfp_tpu.ops.dcn.deform_conv2d (+ the shared-offset
4x4-patch variant for repeat mode).
"""

from crfp_tpu.ops.dcn import deform_conv2d as deform_conv2d_pallas

__all__ = ["deform_conv2d_pallas"]

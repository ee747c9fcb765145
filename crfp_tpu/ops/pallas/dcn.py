"""Pallas DCN: currently delegated to the XLA gather formulation.

Mosaic has no vector gather in this environment, so an in-kernel gather
would scalarize. The DCN is gather-bound at ~10-30 ns per XLA gather
slice (true-sync measurement, docs/PERF.md); crfp_tpu.ops.dcn minimizes
slice count (patch gathers, the shared-offset 4x4 path, tap
accumulation). The interpolation-matrix MXU kernel that removes the
gathers entirely is specified in docs/PERF.md (Roadmap) and will live
here.
"""

from crfp_tpu.ops.dcn import deform_conv2d as deform_conv2d_pallas

__all__ = ["deform_conv2d_pallas"]

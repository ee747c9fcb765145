"""Pallas flow-warp: currently delegated to the XLA gather formulation.

Mosaic rejects vector gathers inside kernels in this environment, so a
Pallas kernel would have to scalarize the gather. XLA's gather runs at
~10-30 ns per slice (true-sync measurement, docs/PERF.md) — slow in
absolute terms but still the best available path for unbounded
displacements; crfp_tpu.ops.warp provides the slice-count-minimized
formulations (bilinear_sample_patch). The planned interpolation-matrix
MXU kernel (docs/PERF.md Roadmap) will replace this alias for bounded
displacements.
"""

from crfp_tpu.ops.warp import flow_warp as flow_warp_pallas

__all__ = ["flow_warp_pallas"]

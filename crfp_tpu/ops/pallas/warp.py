"""Pallas flow-warp: intentionally delegated to the XLA formulation.

Measured on the target chip (docs/PERF.md): XLA's native gather executes
the bilinear warp at ~220 G samples/s (HBM roofline for 4-corner reads),
and Mosaic rejects vector gathers inside kernels in this environment — a
hand-written kernel would have to scalarize the gather and regress by
orders of magnitude. The TPU-native implementation of this op IS
crfp_tpu.ops.warp.flow_warp; this alias exists so kernel-level callers
have a stable import point if a Mosaic gather primitive lands later.
"""

from crfp_tpu.ops.warp import flow_warp as flow_warp_pallas

__all__ = ["flow_warp_pallas"]

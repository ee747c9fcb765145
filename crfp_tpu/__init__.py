"""CRFP-TPU: TPU-native foveated video super-resolution framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the CRFP
reference (Cross-Resolution Flow Propagation for Foveated Video
Super-Resolution, WACV 2023): recurrent 8x foveated video SR with
flow-guided deformable-convolution alignment, LTE texture transfer and
PixelShuffle reconstruction — designed TPU-first (NHWC layouts, lax.scan
recurrence, static shapes, MXU-friendly separable resizes, Pallas kernels
for the gather-heavy ops, jax.sharding data parallelism).
"""

__version__ = "0.1.0"

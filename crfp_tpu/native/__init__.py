"""ctypes bindings + lazy build for the native preprocessing library."""

from crfp_tpu.native.bindings import (
    native_available,
    resize_bicubic_u8,
    crop_normalize_flip_f32,
    fill_fovea_f32,
)

__all__ = [
    "native_available",
    "resize_bicubic_u8",
    "crop_normalize_flip_f32",
    "fill_fovea_f32",
]

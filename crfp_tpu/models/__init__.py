from crfp_tpu.models.crfp import CRFP, ModelConfig
from crfp_tpu.models.pyramid import CRFPPyramidX8
from crfp_tpu.models.runtime import CRFPRuntimeSimple, CRFPRuntimeV18
from crfp_tpu.models.streaming import StreamingRunner

__all__ = [
    "CRFP",
    "ModelConfig",
    "StreamingRunner",
    "CRFPPyramidX8",
    "CRFPRuntimeSimple",
    "CRFPRuntimeV18",
]

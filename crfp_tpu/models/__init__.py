from crfp_tpu.models.crfp import CRFP, ModelConfig
from crfp_tpu.models.streaming import StreamingRunner

__all__ = ["CRFP", "ModelConfig", "StreamingRunner"]

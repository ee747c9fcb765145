from crfp_tpu.data.fovea import fovea_generator
from crfp_tpu.data.loader import Loader, get_dataloader

__all__ = ["fovea_generator", "Loader", "get_dataloader"]

from crfp_tpu.eval.evaluator import evaluate_clips, EvalResult
from crfp_tpu.eval.zones import ZoneMasks, zone_masks_step, StreamingZoneEval
from crfp_tpu.eval.foveated import foveated_metric, batch_psnr, batch_ssim

__all__ = [
    "evaluate_clips",
    "EvalResult",
    "ZoneMasks",
    "zone_masks_step",
    "StreamingZoneEval",
    "foveated_metric",
    "batch_psnr",
    "batch_ssim",
]

from crfp_tpu.bench.runtime import PRESETS, run_runtime_bench

__all__ = ["PRESETS", "run_runtime_bench"]

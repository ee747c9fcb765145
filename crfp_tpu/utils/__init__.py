from crfp_tpu.utils.logging import Logger, mk_exp_dir, MetricsWriter

__all__ = ["Logger", "mk_exp_dir", "MetricsWriter"]

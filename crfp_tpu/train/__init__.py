from crfp_tpu.train.schedule import cosine_restart_schedule
from crfp_tpu.train.loop import (
    TrainConfig,
    TrainState,
    charbonnier_loss,
    create_train_state,
    make_train_step,
)

__all__ = [
    "cosine_restart_schedule",
    "TrainConfig",
    "TrainState",
    "charbonnier_loss",
    "create_train_state",
    "make_train_step",
]

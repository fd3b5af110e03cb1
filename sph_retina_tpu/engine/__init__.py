from .train import (
    TrainState,
    build_optimizer,
    create_train_state,
    make_train_step,
    shard_batch,
    step_lr_schedule,
)

__all__ = [
    "TrainState",
    "build_optimizer",
    "create_train_state",
    "make_train_step",
    "shard_batch",
    "step_lr_schedule",
]

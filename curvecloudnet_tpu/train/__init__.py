"""Training runtime: train state, jitted steps, schedulers, mesh parallelism."""

from .trainer import (
    Batch,
    LossConfig,
    TrainState,
    bn_momentum_for_epoch,
    build_train_step,
    create_train_state,
    make_eval_step,
    make_schedule,
    make_train_step,
)

__all__ = [
    "Batch",
    "LossConfig",
    "TrainState",
    "bn_momentum_for_epoch",
    "build_train_step",
    "create_train_state",
    "make_eval_step",
    "make_schedule",
    "make_train_step",
]

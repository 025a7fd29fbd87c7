"""Training: jitted steps, schedules, loop with early-stop/checkpoint/logging."""

from adunet.train.state import TrainState, create_train_state
from adunet.train.schedules import cosine_decay_schedule, make_optimizer
from adunet.train.sr import (
    make_sr_train_step,
    make_sr_eval_step,
    make_sr_val_step,
    make_vanilla_sr_train_step,
    make_vanilla_sr_val_step,
    make_sr_device_cache_train_step,
    sr_loss_and_metrics,
    DATA_LR_SHRINK,
)
from adunet.train.seg import make_seg_train_step, make_seg_eval_step, metric_finalizers_of
from adunet.train.joint import make_joint_train_step, make_joint_eval_step
from adunet.train.loop import fit, repeat, FitResult, EpochLog
from adunet.train.checkpoint import CheckpointManager

__all__ = [
    "TrainState",
    "create_train_state",
    "cosine_decay_schedule",
    "make_optimizer",
    "make_sr_train_step",
    "make_sr_eval_step",
    "make_sr_val_step",
    "make_vanilla_sr_train_step",
    "make_vanilla_sr_val_step",
    "make_sr_device_cache_train_step",
    "sr_loss_and_metrics",
    "DATA_LR_SHRINK",
    "make_seg_train_step",
    "make_seg_eval_step",
    "metric_finalizers_of",
    "make_joint_train_step",
    "make_joint_eval_step",
    "fit",
    "repeat",
    "FitResult",
    "EpochLog",
    "CheckpointManager",
]

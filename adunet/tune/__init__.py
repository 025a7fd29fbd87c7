"""Hyperparameter tuning: optuna when available, built-in TPE engine otherwise.

adunet.tune.parallel adds what optuna cannot: mesh-parallel trial batches
(vmapped lanes sharded over the device mesh, constant-liar batched asks).
"""

from adunet.tune.parallel import BatchedVanillaSRTuner, group_trials_by
from adunet.tune.search import (
    RandomSampler,
    Study,
    TPESampler,
    Trial,
    TrialPruned,
    create_study,
)

__all__ = [
    "Study",
    "Trial",
    "TrialPruned",
    "TPESampler",
    "RandomSampler",
    "create_study",
    "BatchedVanillaSRTuner",
    "group_trials_by",
]

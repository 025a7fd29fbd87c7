"""Hyperparameter tuning: optuna when available, built-in TPE engine otherwise."""

from adunet.tune.search import (
    RandomSampler,
    Study,
    TPESampler,
    Trial,
    TrialPruned,
    create_study,
)

__all__ = ["Study", "Trial", "TrialPruned", "TPESampler", "RandomSampler", "create_study"]

"""Hyperparameter tuning: optuna when available, built-in TPE-lite fallback."""

from adunet.tune.search import Study, Trial, TrialPruned, create_study

__all__ = ["Study", "Trial", "TrialPruned", "create_study"]

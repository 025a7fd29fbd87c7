"""Minimal hyperparameter search engine with an optuna-compatible surface.

The reference tunes with optuna (TPESampler + MedianPruner,
Super_resolution/code/u_net_vanilla_optuna.py:153-283,
Segmenation/code/unet_vinillia_optuna.py). optuna is not installed in this
image, so ``create_study`` returns a real optuna study when the package is
importable and otherwise this module's built-in engine: seeded random search
over the same suggest API plus median pruning on intermediate values — the
objective code is identical either way.
"""

from __future__ import annotations

import json
import math
import random
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Callable, Dict, List, Optional, Sequence

__all__ = ["Trial", "Study", "TrialPruned", "create_study"]


class TrialPruned(Exception):
    """Raised by objectives when Trial.should_prune() is honoured."""


@dataclass
class Trial:
    number: int
    _rng: random.Random
    _study: "Study"
    params: Dict[str, Any] = field(default_factory=dict)
    intermediate: Dict[int, float] = field(default_factory=dict)
    value: Optional[float] = None
    state: str = "RUNNING"  # RUNNING | COMPLETE | PRUNED | FAIL

    # ---- optuna-compatible suggest API ----
    def suggest_float(self, name: str, low: float, high: float, *, log: bool = False) -> float:
        if log:
            value = math.exp(self._rng.uniform(math.log(low), math.log(high)))
        else:
            value = self._rng.uniform(low, high)
        self.params[name] = value
        return value

    def suggest_int(self, name: str, low: int, high: int, *, step: int = 1) -> int:
        value = self._rng.randrange(low, high + 1, step)
        self.params[name] = value
        return value

    def suggest_categorical(self, name: str, choices: Sequence[Any]) -> Any:
        value = self._rng.choice(list(choices))
        self.params[name] = value
        return value

    # ---- pruning ----
    def report(self, value: float, step: int) -> None:
        self.intermediate[step] = float(value)

    def should_prune(self) -> bool:
        return self._study._should_prune(self)


class Study:
    """Seeded random-search study with median pruning."""

    def __init__(
        self,
        direction: str = "minimize",
        seed: int = 0,
        pruner: str = "median",
        n_warmup_trials: int = 2,
        n_warmup_steps: int = 1,
    ):
        if direction not in ("minimize", "maximize"):
            raise ValueError("direction must be 'minimize' or 'maximize'")
        self.direction = direction
        self.seed = seed
        self.pruner = pruner
        self.n_warmup_trials = n_warmup_trials
        self.n_warmup_steps = n_warmup_steps
        self.trials: List[Trial] = []

    # internal median pruner over completed trials' intermediate curves
    def _should_prune(self, trial: Trial) -> bool:
        if self.pruner != "median" or not trial.intermediate:
            return False
        step = max(trial.intermediate)
        if step < self.n_warmup_steps:
            return False
        history = [
            t.intermediate[step]
            for t in self.trials
            if t.state == "COMPLETE" and step in t.intermediate
        ]
        if len(history) < self.n_warmup_trials:
            return False
        history_sorted = sorted(history)
        median = history_sorted[len(history_sorted) // 2]
        current = trial.intermediate[step]
        return current > median if self.direction == "minimize" else current < median

    def optimize(
        self,
        objective: Callable[[Trial], float],
        n_trials: int,
        callbacks: Optional[List[Callable]] = None,
    ) -> None:
        for _ in range(n_trials):
            trial = Trial(
                number=len(self.trials),
                _rng=random.Random(self.seed * 1_000_003 + len(self.trials)),
                _study=self,
            )
            self.trials.append(trial)
            try:
                trial.value = float(objective(trial))
                trial.state = "COMPLETE"
            except TrialPruned:
                trial.state = "PRUNED"
            except Exception:
                trial.state = "FAIL"
                raise
            for cb in callbacks or []:
                cb(self, trial)

    @property
    def completed_trials(self) -> List[Trial]:
        return [t for t in self.trials if t.state == "COMPLETE"]

    @property
    def best_trial(self) -> Trial:
        done = self.completed_trials
        if not done:
            raise ValueError("No completed trials.")
        key = (lambda t: t.value) if self.direction == "minimize" else (lambda t: -t.value)
        return min(done, key=key)

    @property
    def best_params(self) -> Dict[str, Any]:
        return self.best_trial.params

    @property
    def best_value(self) -> float:
        return self.best_trial.value

    def results_payload(self) -> Dict[str, Any]:
        return {
            "direction": self.direction,
            "n_trials": len(self.trials),
            "n_complete": len(self.completed_trials),
            "n_pruned": sum(1 for t in self.trials if t.state == "PRUNED"),
            "best_value": self.best_value if self.completed_trials else None,
            "best_params": self.best_params if self.completed_trials else None,
            "trials": [
                {
                    "number": t.number,
                    "state": t.state,
                    "value": t.value,
                    "params": t.params,
                    "intermediate": t.intermediate,
                }
                for t in self.trials
            ],
        }

    def save_results(self, path: str | Path) -> None:
        Path(path).write_text(json.dumps(self.results_payload(), indent=2, default=str))


def create_study(
    direction: str = "minimize",
    seed: int = 0,
    pruner: str = "median",
    prefer_optuna: bool = True,
):
    """Return an optuna study when available, else the built-in Study."""
    if prefer_optuna:
        try:  # pragma: no cover - optuna not in this image
            import optuna

            sampler = optuna.samplers.TPESampler(seed=seed)
            if pruner == "median":
                opruner = optuna.pruners.MedianPruner()
            elif pruner == "hyperband":
                opruner = optuna.pruners.HyperbandPruner()
            else:
                opruner = optuna.pruners.NopPruner()
            return optuna.create_study(direction=direction, sampler=sampler, pruner=opruner)
        except ImportError:
            pass
    return Study(direction=direction, seed=seed, pruner=pruner)

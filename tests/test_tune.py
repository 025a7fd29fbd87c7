"""Built-in search engine tests + a tiny seg tuning run through the CLI."""

import json
from pathlib import Path

import numpy as np
import pytest

from adunet.tune import Study, TrialPruned, create_study


def test_study_minimize_quadratic():
    study = Study(direction="minimize", seed=0)

    def objective(trial):
        x = trial.suggest_float("x", -10, 10)
        return (x - 3.0) ** 2

    study.optimize(objective, n_trials=50)
    assert abs(study.best_params["x"] - 3.0) < 2.0
    assert study.best_value < 4.0


def test_study_deterministic():
    def objective(trial):
        return trial.suggest_float("x", 0, 1)

    s1 = Study(seed=7)
    s1.optimize(objective, 5)
    s2 = Study(seed=7)
    s2.optimize(objective, 5)
    assert [t.value for t in s1.trials] == [t.value for t in s2.trials]


def test_median_pruning():
    study = Study(direction="minimize", seed=0, n_warmup_trials=2, n_warmup_steps=0)

    def objective(trial):
        x = trial.suggest_float("x", 0, 1)
        for step in range(3):
            trial.report(x, step)
            if trial.should_prune():
                raise TrialPruned()
        return x

    study.optimize(objective, n_trials=20)
    states = {t.state for t in study.trials}
    assert "PRUNED" in states  # bad trials get cut
    assert study.best_value == min(t.value for t in study.completed_trials)


def test_pruner_warmup_steps_delays_pruning():
    """create_study plumbs the warm-up knobs: with n_warmup_steps=2, no
    trial may be pruned at reported steps 0 or 1 — the guard the fidelity
    study (experiments/round4_sweep/tune_fidelity) showed short-budget
    identity-start SR studies need."""
    from adunet.tune import create_study

    pruned_at = []

    def objective(trial):
        x = trial.suggest_float("x", 0, 1)
        for step in range(4):
            # adversarial curve: terrible early, best-ever late
            trial.report(10.0 - x if step < 3 else -x, step)
            if trial.should_prune():
                pruned_at.append(step)
                raise TrialPruned()
        return -x

    study = create_study(
        direction="minimize", seed=0, prefer_optuna=False,
        pruner_warmup_trials=2, pruner_warmup_steps=2,
    )
    study.optimize(objective, n_trials=12)
    assert all(step >= 2 for step in pruned_at)

    # warm-up 0 on the same curves prunes earlier (the knob is live)
    pruned_at.clear()
    study0 = create_study(
        direction="minimize", seed=0, prefer_optuna=False,
        pruner_warmup_trials=2, pruner_warmup_steps=0,
    )
    study0.optimize(objective, n_trials=12)
    assert pruned_at and min(pruned_at) < 2


def test_results_payload_roundtrip(tmp_path):
    study = Study(seed=1)
    study.optimize(lambda t: t.suggest_float("x", 0, 1), 3)
    path = tmp_path / "results.json"
    study.save_results(path)
    payload = json.loads(path.read_text())
    assert payload["n_trials"] == 3
    assert "best_params" in payload


def test_create_study_fallback():
    s = create_study(direction="maximize", seed=3)
    # optuna is absent in this image -> built-in Study
    assert isinstance(s, Study) or hasattr(s, "optimize")


def test_tpe_beats_random_on_quadratic():
    """The built-in TPE sampler must concentrate samples near the optimum —
    measurably better than random search with the same budget."""

    def objective(trial):
        x = trial.suggest_float("x", -10, 10)
        return (x - 3.0) ** 2

    def best_after(sampler, n=40, seeds=(0, 1, 2, 3, 4)):
        vals = []
        for seed in seeds:
            s = Study(direction="minimize", seed=seed, sampler=sampler)
            s.optimize(objective, n)
            vals.append(s.best_value)
        return sum(vals) / len(vals)

    tpe = best_after("tpe")
    rnd = best_after("random")
    assert tpe < rnd  # average-case win
    assert tpe < 0.2  # and absolutely good


def test_tpe_log_and_categorical_exploitation():
    """TPE concentrates late-trial suggestions near the good region for log
    floats and picks the winning category more often than chance."""

    def objective(trial):
        lr = trial.suggest_float("lr", 1e-5, 1e-1, log=True)
        kind = trial.suggest_categorical("kind", ["a", "b", "c"])
        penalty = 0.0 if kind == "a" else 1.0
        return abs(__import__("math").log10(lr) - (-3.0)) + penalty

    study = Study(direction="minimize", seed=2, sampler="tpe")
    study.optimize(objective, 50)
    late = study.trials[30:]
    kinds = [t.params["kind"] for t in late]
    assert kinds.count("a") > len(kinds) / 2  # exploitation beats 1/3 chance
    assert abs(__import__("math").log10(study.best_params["lr"]) + 3.0) < 0.5


def test_tpe_int_suggest_in_bounds():
    def objective(trial):
        d = trial.suggest_int("d", 3, 5)
        return (d - 4) ** 2

    study = Study(direction="minimize", seed=0, sampler="tpe")
    study.optimize(objective, 20)
    assert all(3 <= t.params["d"] <= 5 for t in study.trials)
    assert study.best_params["d"] == 4


def test_tune_cli_seg(tmp_path):
    """Two 1-epoch trials over a synthetic ISIC set — exercises the whole path."""
    root = tmp_path / "isic"
    for sub in ("ti", "tm", "vi", "vm"):
        (root / sub).mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(4):
        img = rng.random((32, 32, 3), dtype=np.float32)
        mask = (rng.random((32, 32)) > 0.5).astype(np.float32)
        np.save(root / "ti" / f"a{i}.npy", img)
        np.save(root / "tm" / f"a{i}_segmentation.npy", mask)
        np.save(root / "vi" / f"b{i}.npy", img)
        np.save(root / "vm" / f"b{i}_segmentation.npy", mask)

    from adunet.cli.tune import main as tune_main

    results = tmp_path / "results.json"
    tune_main([
        "--workload", "seg",
        "--n-trials", "2",
        "--epochs", "1",
        "--image-size", "32",
        "--base-channels", "4",
        "--train-images", str(root / "ti"),
        "--train-masks", str(root / "tm"),
        "--val-images", str(root / "vi"),
        "--val-masks", str(root / "vm"),
        "--results", str(results),
    ])
    payload = json.loads(results.read_text())
    assert payload["n_trials"] == 2
    assert payload["best_value"] is not None


def test_tune_cli_sr(tmp_path):
    """Two 1-epoch SR trials (vanilla model, combined-loss alpha/beta/gamma
    space — reference u_net_vanilla_optuna.py:160-170) plus the best-config
    retrain that saves a checkpoint."""
    rng = np.random.default_rng(0)
    hr = tmp_path / "hr"
    hr.mkdir()
    for i in range(4):
        np.save(hr / f"x{i}.npy", rng.random((48, 48, 3)).astype(np.float32))

    from adunet.cli.tune import main as tune_main

    results = tmp_path / "sr_results.json"
    tune_main([
        "--workload", "sr",
        "--n-trials", "2",
        "--epochs", "1",
        "--image-size", "32",
        "--sr-base-channels", "4",
        "--high-res-dir", str(hr),
        "--image-suffix", ".npy",
        "--results", str(results),
        "--retrain",
        "--final-epochs", "1",
        "--model-dir", str(tmp_path / "models"),
    ])
    payload = json.loads(results.read_text())
    assert payload["best_value"] is not None
    # reference search space is fully present
    for key in ("lr", "alpha", "beta", "gamma", "batch_size"):
        assert key in payload["best_params"], key
    # retrain saved a best-config model
    assert payload["retrain"]["checkpoint"]
    assert (tmp_path / "models" / "unet_vanilla_tuned_best" / "config.json").exists()


def test_hyperband_pruning_at_rungs():
    """Successive-halving pruner: bad trials die at rung steps (eta^k - 1),
    top-1/eta survive."""
    study = Study(direction="minimize", seed=0, pruner="hyperband",
                  n_warmup_trials=3, n_warmup_steps=1)

    def objective(trial):
        x = trial.suggest_float("x", 0, 1)
        for step in range(9):
            trial.report(x + 0.001 * step, step)
            if trial.should_prune():
                raise TrialPruned()
        return x

    study.optimize(objective, n_trials=30)
    states = [t.state for t in study.trials]
    assert "PRUNED" in states
    # pruned trials stopped exactly at a rung step (2 or 8)
    for t in study.trials:
        if t.state == "PRUNED":
            assert max(t.intermediate) in (2, 8), t.intermediate
    # the best completed trial was never pruned and the study still converges
    assert study.best_value < 0.3


def test_median_pruner_decision_rule_semantics():
    """The median pruner's decision rule, pinned to optuna's documented
    MedianPruner semantics (optuna.pruners.MedianPruner: 'prune if the
    trial's intermediate result is worse than the median of intermediate
    results of previous COMPLETED trials at the same step', with
    n_startup_trials / n_warmup_steps grace periods). Backs the round-4
    pruner-fidelity study (scripts/r4_pruner_fidelity.sh)."""

    def seeded_study(direction):
        study = Study(direction=direction, seed=0, pruner="median",
                      n_warmup_trials=2, n_warmup_steps=1)
        finals = [0.2, 0.4, 0.6]
        for final in finals:
            t = study.ask()
            for step, v in enumerate([final - 0.1, final]):
                t.report(v, step)
            study.tell(t, final)
        return study  # completed history at step 1: [0.2, 0.4, 0.6], median 0.4

    # --- minimize: strictly worse than the median is cut, ties survive ---
    study = seeded_study("minimize")
    probe = study.ask()
    probe.report(0.39, 1)
    assert not probe.should_prune()  # better than median
    probe.report(0.40, 1)
    assert not probe.should_prune()  # equal to median: not strictly worse
    probe.report(0.41, 1)
    assert probe.should_prune()      # strictly worse

    # --- warm-up steps: never prune below n_warmup_steps ---
    early = study.ask()
    early.report(99.0, 0)
    assert not early.should_prune()

    # --- history is completed-trials-only: a PRUNED trial's great value
    #     must not shift the median ---
    study.tell(probe, state="PRUNED")
    ghost = study.ask()
    ghost.report(-100.0, 1)          # would drag the median down if counted
    study.tell(ghost, state="PRUNED")
    probe2 = study.ask()
    probe2.report(0.40, 1)
    assert not probe2.should_prune()  # median still 0.4

    # --- warm-up trials: with < n_warmup_trials completed, never prune ---
    fresh = Study(direction="minimize", seed=0, pruner="median",
                  n_warmup_trials=2, n_warmup_steps=0)
    t0 = fresh.ask()
    t0.report(0.1, 0)
    fresh.tell(t0, 0.1)
    lone = fresh.ask()
    lone.report(99.0, 0)
    assert not lone.should_prune()   # only 1 completed trial at this step

    # --- maximize direction mirrors the comparison ---
    study_max = seeded_study("maximize")
    hi = study_max.ask()
    hi.report(0.41, 1)
    assert not hi.should_prune()
    hi.report(0.40, 1)
    assert not hi.should_prune()
    hi.report(0.39, 1)
    assert hi.should_prune()

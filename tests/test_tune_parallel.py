"""Mesh-parallel trial evaluation (adunet.tune.parallel) + batched asks.

The reference's optuna study is strictly sequential
(Super_resolution/code/u_net_vanilla_optuna.py:331, default n_jobs=1); the
TPU-native tuner evaluates a batch of trials as vmapped lanes sharded over
the device mesh. These tests pin the three claims that make that sound:

1. the ask/tell split of the engine is behavior-identical to optimize();
2. ask_batch's constant-liar bookkeeping never leaks lies into the study;
3. a batched lane reproduces the sequential trial's val-loss curve exactly
   (same data stream, same init, same loss), with or without a mesh.
"""

import json

import jax
import numpy as np
import pytest

from adunet.tune import BatchedVanillaSRTuner, Study, group_trials_by

SEED = 42
IMG = 32
N_IMAGES = 8
BASE_CH = 4


# ------------------------------------------------------------ engine surface


def test_ask_tell_matches_optimize():
    def objective(trial):
        x = trial.suggest_float("x", 0, 1)
        y = trial.suggest_categorical("y", [1, 2, 4])
        return x * y

    ref = Study(seed=11)
    ref.optimize(objective, 6)

    manual = Study(seed=11)
    for _ in range(6):
        t = manual.ask()
        manual.tell(t, objective(t))

    assert [t.params for t in ref.trials] == [t.params for t in manual.trials]
    assert [t.value for t in ref.trials] == [t.value for t in manual.trials]
    assert ref.best_params == manual.best_params


def test_ask_batch_retracts_lies_and_records_params():
    def suggest(trial):
        trial.suggest_float("x", 0, 1)
        trial.suggest_categorical("batch_size", [4, 8])

    study = Study(direction="minimize", seed=3)
    # some real history so the constant-liar path (lie = best_value) engages
    for _ in range(6):
        t = study.ask()
        suggest(t)
        study.tell(t, t.params["x"])
    n_complete = len(study.completed_trials)
    best_before = study.best_value

    asked = study.ask_batch(suggest, 4)
    assert len(asked) == 4
    for t in asked:
        assert t.state == "RUNNING" and t.value is None  # lies retracted
        assert set(t.params) == {"x", "batch_size"}
    # study state untouched by the temporary lies
    assert len(study.completed_trials) == n_complete
    assert study.best_value == best_before

    # telling the asked trials completes them normally
    for t in asked:
        study.tell(t, t.params["x"])
    assert len(study.completed_trials) == n_complete + 4

    with pytest.raises(ValueError):
        study.ask_batch(suggest, 0)


@pytest.mark.parametrize("direction", ["minimize", "maximize"])
def test_ask_batch_lies_are_pessimistic(direction):
    """The constant-liar value must be the WORST completed value (CL-max):
    a pessimistic lie puts the lied params in TPE's bad group, repelling the
    remaining asks; lying with the best value would attract them instead."""
    study = Study(direction=direction, seed=7)
    for v in (0.2, 0.9, 0.5, 0.4, 0.7, 0.3):
        t = study.ask()
        t.suggest_float("x", 0, 1)
        study.tell(t, v)
    worst = 0.9 if direction == "minimize" else 0.2

    observed_lies = []

    def suggest(trial):
        # earlier asks in this batch hold their temporary lie right now
        observed_lies.extend(
            t.value for t in study.trials
            if t.state == "COMPLETE" and t.intermediate == {} and t.value == worst
            and t is not trial and t.number >= 6
        )
        trial.suggest_float("x", 0, 1)

    asked = study.ask_batch(suggest, 3)
    # ask 2 saw ask 1's lie; ask 3 saw asks 1+2 — all pessimistic
    assert observed_lies == [worst] * 3
    for t in asked:
        assert t.state == "RUNNING" and t.value is None


def test_tell_complete_requires_value():
    study = Study(seed=0)
    t = study.ask()
    with pytest.raises(ValueError):
        study.tell(t)
    study.tell(t, state="PRUNED")
    assert t.state == "PRUNED"


def test_group_trials_by_orders_and_groups():
    class T:
        def __init__(self, bs):
            self.params = {"batch_size": bs}

    ts = [T(8), T(4), T(8), T(4), T(16)]
    groups = group_trials_by(ts, "batch_size")
    assert list(groups) == [8, 4, 16]  # insertion order
    assert groups[8] == [ts[0], ts[2]]
    assert groups[4] == [ts[1], ts[3]]


# ------------------------------------------------------- lane == sequential


@pytest.fixture(scope="module")
def sr_corpus():
    rng = np.random.default_rng(SEED)
    hr = rng.random((N_IMAGES, IMG, IMG, 3), dtype=np.float32)
    lr = np.clip(hr + rng.normal(0, 0.05, hr.shape).astype(np.float32), 0, 1)
    tr_idx = np.arange(6)
    va_idx = np.arange(6, 8)
    return lr, hr, tr_idx, va_idx


@pytest.fixture(scope="module")
def perceptual_fn():
    from adunet.losses import make_perceptual_fn

    return make_perceptual_fn(input_size=IMG)


def _sequential_curve(lr_images, hr_images, tr_idx, va_idx, cfg, batch_size,
                      epochs, perceptual_fn):
    """The CLI's sequential run_config (adunet/cli/tune.py), as the oracle:
    per-epoch weighted-mean val loss for one config."""
    import jax.numpy as jnp

    from adunet.data import ArrayDataset
    from adunet.losses import build_losses_and_metrics
    from adunet.models import VanillaSRUNet
    from adunet.train import (
        create_train_state,
        make_optimizer,
        make_vanilla_sr_train_step,
        make_vanilla_sr_val_step,
        repeat,
    )

    train_ds = ArrayDataset(lr_images[tr_idx], hr_images[tr_idx],
                            batch_size=batch_size, shuffle=True, seed=SEED)
    val_ds = ArrayDataset(lr_images[va_idx], hr_images[va_idx],
                          batch_size=batch_size, shuffle=False, seed=SEED)
    model = VanillaSRUNet(base_channels=BASE_CH)
    loss_fn, _ = build_losses_and_metrics(
        "combined", perceptual_fn=perceptual_fn,
        alpha=cfg["alpha"], beta=cfg["beta"], gamma=cfg["gamma"],
    )
    state = create_train_state(
        model, jax.random.key(SEED),
        np.zeros((1, IMG, IMG, 3), np.float32), make_optimizer(cfg["lr"]),
    )
    step = make_vanilla_sr_train_step(model, loss_fn)
    val_step = make_vanilla_sr_val_step(model, loss_fn)
    it = repeat(train_ds)
    curve = []
    for _ in range(epochs):
        for _ in range(train_ds.steps_per_epoch):
            lr_b, hr_b = next(it)
            state, _ = step(state, (jnp.asarray(lr_b), jnp.asarray(hr_b)), None)
        vals, weights = [], []
        for lr_b, hr_b in val_ds:
            out = val_step(state, (jnp.asarray(lr_b), jnp.asarray(hr_b)))
            vals.append(float(np.asarray(out["loss"])))
            weights.append(lr_b.shape[0])
        curve.append(float(np.average(vals, weights=weights)))
    return curve


CONFIGS = [
    {"lr": 3e-3, "alpha": 1.0, "beta": 0.1, "gamma": 0.01},
    {"lr": 5e-4, "alpha": 1.7, "beta": 0.02, "gamma": 0.001},
    {"lr": 1e-3, "alpha": 0.6, "beta": 0.3, "gamma": 0.05},
]


def test_batched_lanes_match_sequential_trials(sr_corpus, perceptual_fn):
    """Every lane of one batched run_group == its sequential trial's curve."""
    lr_images, hr_images, tr_idx, va_idx = sr_corpus
    tuner = BatchedVanillaSRTuner(
        lr_images, hr_images, tr_idx, va_idx,
        base_channels=BASE_CH, seed=SEED, perceptual_fn=perceptual_fn,
    )
    curves = tuner.run_group(CONFIGS, batch_size=4, epochs=2)
    assert len(curves) == len(CONFIGS)
    for cfg, lane_curve in zip(CONFIGS, curves):
        seq = _sequential_curve(lr_images, hr_images, tr_idx, va_idx,
                                cfg, 4, 2, perceptual_fn)
        np.testing.assert_allclose(lane_curve, seq, rtol=2e-4, atol=1e-6)
    # different configs genuinely produce different trajectories (liveness)
    assert abs(curves[0][-1] - curves[1][-1]) > 1e-6


def test_batched_lanes_mesh_matches_unmeshed(sr_corpus, perceptual_fn):
    """Sharding the trial axis over the 8-device mesh changes nothing but
    placement — including the lane padding up to mesh width (3 -> 8)."""
    from adunet.parallel import make_mesh

    lr_images, hr_images, tr_idx, va_idx = sr_corpus
    plain = BatchedVanillaSRTuner(
        lr_images, hr_images, tr_idx, va_idx,
        base_channels=BASE_CH, seed=SEED, perceptual_fn=perceptual_fn,
    ).run_group(CONFIGS, batch_size=4, epochs=1)

    mesh = make_mesh(axis_names=("trial",))
    assert np.prod(mesh.devices.shape) == 8
    meshed = BatchedVanillaSRTuner(
        lr_images, hr_images, tr_idx, va_idx,
        base_channels=BASE_CH, seed=SEED, perceptual_fn=perceptual_fn,
        mesh=mesh,
    ).run_group(CONFIGS, batch_size=4, epochs=1)

    np.testing.assert_allclose(plain, meshed, rtol=2e-4, atol=1e-6)


def test_lane_width_pad_exact_and_single_compile(sr_corpus, perceptual_fn):
    """A fixed lane floor changes nothing numerically, and groups of
    different sizes reuse ONE compiled program per batch size (without the
    floor, every distinct group size K is a fresh XLA compile — multi-minute
    on a real deployment, and a TPE study's asks split unevenly across the
    batch-size buckets)."""
    lr_images, hr_images, tr_idx, va_idx = sr_corpus
    plain = BatchedVanillaSRTuner(
        lr_images, hr_images, tr_idx, va_idx,
        base_channels=BASE_CH, seed=SEED, perceptual_fn=perceptual_fn,
    ).run_group(CONFIGS, batch_size=4, epochs=1)

    padded_tuner = BatchedVanillaSRTuner(
        lr_images, hr_images, tr_idx, va_idx,
        base_channels=BASE_CH, seed=SEED, perceptual_fn=perceptual_fn,
        lane_width=4,
    )
    assert padded_tuner._lane_width(3) == 4
    assert padded_tuner._lane_width(7) == 7  # a floor, never a truncation
    padded = padded_tuner.run_group(CONFIGS, batch_size=4, epochs=1)
    assert len(padded) == len(CONFIGS)  # pad lanes are not returned
    np.testing.assert_allclose(plain, padded, rtol=2e-4, atol=1e-6)

    # a second, smaller group hits the SAME program shapes: no retrace
    # (ragged data batches may already account for >1 entry — the assertion
    # is that the group-size change adds none)
    train_step, val_step = padded_tuner._steps()
    before = (train_step._cache_size(), val_step._cache_size())
    padded_tuner.run_group(CONFIGS[:1], batch_size=4, epochs=1)
    assert (train_step._cache_size(), val_step._cache_size()) == before


def test_run_group_on_epoch_early_stop(sr_corpus, perceptual_fn):
    """on_epoch sees each epoch's per-trial val losses; returning truthy
    truncates the curves at that epoch (the single-lane live-pruning hook
    used by the sequential study)."""
    lr_images, hr_images, tr_idx, va_idx = sr_corpus
    tuner = BatchedVanillaSRTuner(
        lr_images, hr_images, tr_idx, va_idx,
        base_channels=BASE_CH, seed=SEED, perceptual_fn=perceptual_fn,
    )
    full = tuner.run_group(CONFIGS[:1], batch_size=4, epochs=3)[0]

    seen = []
    stopped = tuner.run_group(
        CONFIGS[:1], batch_size=4, epochs=3,
        on_epoch=lambda epoch, vals: (seen.append((epoch, list(vals))) or epoch >= 1),
    )[0]
    assert [e for e, _ in seen] == [0, 1]
    assert all(len(v) == 1 for _, v in seen)
    assert len(stopped) == 2
    np.testing.assert_allclose(stopped, full[:2], rtol=2e-4, atol=1e-6)


# ------------------------------------------------------------------ CLI e2e


def test_tune_cli_sr_parallel(tmp_path):
    """--parallel-trials 2: two asks per round, lanes over the mesh, results
    payload identical in shape to a sequential study's."""
    rng = np.random.default_rng(0)
    hr = tmp_path / "hr"
    hr.mkdir()
    for i in range(4):
        np.save(hr / f"x{i}.npy", rng.random((48, 48, 3)).astype(np.float32))

    from adunet.cli.tune import main as tune_main

    results = tmp_path / "sr_results.json"
    tune_main([
        "--workload", "sr",
        "--n-trials", "4",
        "--epochs", "1",
        "--image-size", "32",
        "--sr-base-channels", "4",
        "--parallel-trials", "2",
        "--high-res-dir", str(hr),
        "--image-suffix", ".npy",
        "--results", str(results),
    ])
    payload = json.loads(results.read_text())
    assert payload["n_trials"] == 4
    assert payload["n_complete"] == 4
    assert payload["best_value"] is not None
    for key in ("lr", "alpha", "beta", "gamma", "batch_size"):
        assert key in payload["best_params"], key
    # per-epoch curves were recorded as intermediates (sequential-compatible)
    assert all(t["intermediate"] for t in payload["trials"])


def test_tune_cli_parallel_rejects_seg(tmp_path):
    from adunet.cli.tune import main as tune_main

    with pytest.raises(ValueError, match="parallel-trials"):
        tune_main([
            "--workload", "seg", "--parallel-trials", "2",
            "--train-images", "x", "--train-masks", "x",
            "--val-images", "x", "--val-masks", "x",
        ])

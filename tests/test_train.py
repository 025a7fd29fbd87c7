"""End-to-end training tests: loss decreases, DP across 8 virtual devices,
checkpoint save/restore, early stopping."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adunet.losses import build_losses_and_metrics, make_hybrid_ce_dice_loss
from adunet.models import build_super_resolution_unet, build_adaptive_depth_unet
from adunet.parallel import make_mesh, replicate, shard_batch
from adunet.train import (
    CheckpointManager,
    create_train_state,
    fit,
    make_optimizer,
    make_seg_eval_step,
    make_seg_train_step,
    make_sr_train_step,
    make_sr_val_step,
    cosine_decay_schedule,
)


def _synthetic_hr(n=16, size=32, seed=0):
    """Smooth random images in [0,1] so degradation leaves structure."""
    rng = np.random.default_rng(seed)
    coarse = rng.random((n, 8, 8, 3), dtype=np.float32)
    up = np.repeat(np.repeat(coarse, size // 8, axis=1), size // 8, axis=2)
    return np.clip(up + 0.05 * rng.standard_normal((n, size, size, 3)), 0, 1).astype(np.float32)


def _loop(arrays, batch):
    while True:
        for i in range(0, arrays.shape[0], batch):
            if i + batch <= arrays.shape[0]:
                yield arrays[i : i + batch]


def test_sr_training_reduces_loss():
    model, _ = build_super_resolution_unet(scale=0.5, depth_override=1, input_size=32, base_channels=8)
    hr = _synthetic_hr()
    state = create_train_state(model, jax.random.key(0), hr[:2], make_optimizer(1e-3))
    loss_fn, _ = build_losses_and_metrics("charbonnier")
    step = make_sr_train_step(model, loss_fn, donate=False)

    losses = []
    it = _loop(hr, 8)
    for i in range(20):
        state, metrics = step(state, jnp.asarray(next(it)), None)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses[-1])


def test_sr_data_parallel_8dev_matches_single_device():
    """Same data, same init → identical loss whether replicated over 8 CPU
    devices or on one — XLA's DP all-reduce is exact here."""
    assert jax.device_count() >= 8
    model, _ = build_super_resolution_unet(scale=0.5, depth_override=1, input_size=32, base_channels=8)
    hr = _synthetic_hr(n=16)
    loss_fn, _ = build_losses_and_metrics("charbonnier")

    # single device
    state1 = create_train_state(model, jax.random.key(0), hr[:2], make_optimizer(1e-3))
    step1 = make_sr_train_step(model, loss_fn, donate=False)
    s1 = state1
    for i in range(3):
        s1, m1 = step1(s1, jnp.asarray(hr[:16]), None)

    # 8-device data parallel
    mesh = make_mesh(8)
    state8 = create_train_state(model, jax.random.key(0), hr[:2], make_optimizer(1e-3))
    state8 = replicate(state8, mesh)
    step8 = make_sr_train_step(model, loss_fn, donate=False)
    s8 = state8
    for i in range(3):
        batch = shard_batch(jnp.asarray(hr[:16]), mesh)
        s8, m8 = step8(s8, batch, None)

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-5)
    l1 = jax.tree_util.tree_leaves(s1.params)[0]
    l8 = jax.tree_util.tree_leaves(s8.params)[0]
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l8), atol=1e-5)


def test_seg_training_with_bn_and_augment():
    model = build_adaptive_depth_unet(input_size=32, base_channels=8, depth=2)
    rng = np.random.default_rng(0)
    images = rng.random((8, 32, 32, 3), dtype=np.float32)
    masks = (rng.random((8, 32, 32, 1)) > 0.5).astype(np.float32)
    state = create_train_state(
        model, jax.random.key(0), images[:2], make_optimizer(1e-3), train=False
    )
    assert state.batch_stats is not None
    loss_fn = make_hybrid_ce_dice_loss(0.4, 0.6)
    step = make_seg_train_step(model, loss_fn, augment=True, donate=False)

    old_stats = jax.device_get(state.batch_stats)
    state, metrics = step(state, (jnp.asarray(images), jnp.asarray(masks)), jax.random.key(1))
    new_stats = jax.device_get(state.batch_stats)
    # BN running stats must move
    diffs = jax.tree_util.tree_map(lambda a, b: float(np.abs(a - b).max()), old_stats, new_stats)
    assert max(jax.tree_util.tree_leaves(diffs)) > 0
    assert np.isfinite(float(metrics["loss"]))
    assert 0 <= float(metrics["dice"]) <= 1

    eval_step = make_seg_eval_step(model, loss_fn)
    out = eval_step(state, (jnp.asarray(images), jnp.asarray(masks)))
    assert set(out) == {"loss", "dice", "iou"}


def test_fit_loop_early_stop_and_restore_best(tmp_path):
    model, _ = build_super_resolution_unet(scale=0.5, depth_override=1, input_size=32, base_channels=8)
    hr = _synthetic_hr(n=8)
    state = create_train_state(model, jax.random.key(0), hr[:2], make_optimizer(1e-3))
    loss_fn, _ = build_losses_and_metrics("charbonnier")
    step = make_sr_train_step(model, loss_fn, donate=False)
    val_step = make_sr_val_step(model, loss_fn)

    result = fit(
        state,
        _loop(hr, 4),
        step,
        steps_per_epoch=2,
        epochs=5,
        val_data=[hr[:4]],
        val_step=val_step,
        monitor="val_loss",
        monitor_mode="min",
        patience=2,
        log_dir=tmp_path,
        verbose=0,
    )
    assert len(result.history) >= 1
    assert (tmp_path / "epoch_metrics.csv").exists()
    rows = (tmp_path / "epoch_metrics.csv").read_text().strip().splitlines()
    assert rows[0].startswith("epoch,steps,duration_s,ms_per_step,loss,psnr,val_loss,val_psnr")


def test_checkpoint_roundtrip(tmp_path):
    model, _ = build_super_resolution_unet(scale=0.5, depth_override=1, input_size=32, base_channels=8)
    hr = _synthetic_hr(n=4)
    state = create_train_state(model, jax.random.key(0), hr[:2], make_optimizer(1e-3))
    loss_fn, _ = build_losses_and_metrics("charbonnier")
    step = make_sr_train_step(model, loss_fn, donate=False)
    state, _ = step(state, jnp.asarray(hr), None)

    ckpt = CheckpointManager(tmp_path / "ckpt", monitor="val_loss", mode="min")
    ckpt.save(1, state, metrics={"val_loss": 0.5})
    state2, _ = step(state, jnp.asarray(hr), None)
    ckpt.save(2, state2, metrics={"val_loss": 0.7})

    fresh = create_train_state(model, jax.random.key(42), hr[:2], make_optimizer(1e-3))
    restored = ckpt.restore_latest(fresh)
    assert restored is not None
    assert int(restored.step) == int(state2.step)
    best = ckpt.restore_best(fresh)
    # best val_loss was at step 1
    l_best = jax.tree_util.tree_leaves(best.params)[0]
    l_s1 = jax.tree_util.tree_leaves(state.params)[0]
    np.testing.assert_allclose(np.asarray(l_best), np.asarray(l_s1))
    ckpt.close()


def test_checkpoint_retains_latest_alongside_best(tmp_path):
    """Crash-resume parity: the most recent checkpoint must survive retention
    even when many later epochs are WORSE than the best — Orbax's plain BestN
    policy would delete it and a restart would silently rewind to the best
    epoch (regression test for the AnyPreservationPolicy fix)."""
    model, _ = build_super_resolution_unet(scale=0.5, depth_override=1, input_size=32, base_channels=8)
    hr = _synthetic_hr(n=4)
    state = create_train_state(model, jax.random.key(0), hr[:2], make_optimizer(1e-3))
    loss_fn, _ = build_losses_and_metrics("charbonnier")
    step = make_sr_train_step(model, loss_fn, donate=False)

    ckpt = CheckpointManager(tmp_path / "ckpt", monitor="val_loss", mode="min")
    # best early (steps 1-2), then steadily worse for many epochs
    losses = [0.10, 0.12, 0.5, 0.6, 0.7, 0.8, 0.9]
    for i, vl in enumerate(losses, start=1):
        state, _ = step(state, jnp.asarray(hr), None)
        ckpt.save(i, state, metrics={"val_loss": vl})

    assert ckpt.latest_step() == len(losses)  # step 7 still on disk
    fresh = create_train_state(model, jax.random.key(42), hr[:2], make_optimizer(1e-3))
    restored = ckpt.restore_latest(fresh)
    assert int(restored.step) == int(state.step)
    # and best selection still points at the val_loss=0.10 checkpoint
    assert ckpt._mngr.best_step() == 1
    ckpt.close()


def test_checkpoint_async_save_equivalent(tmp_path):
    """async_save=True: saves overlap compute but every read-side entry point
    barriers first, so the state restored is identical to the sync path —
    including best/latest selection with saves still in flight."""
    model, _ = build_super_resolution_unet(scale=0.5, depth_override=1, input_size=32, base_channels=8)
    hr = _synthetic_hr(n=4)
    state = create_train_state(model, jax.random.key(0), hr[:2], make_optimizer(1e-3))
    loss_fn, _ = build_losses_and_metrics("charbonnier")
    step = make_sr_train_step(model, loss_fn, donate=False)

    ckpt = CheckpointManager(
        tmp_path / "ckpt", monitor="val_loss", mode="min", async_save=True
    )
    states = []
    for i, vl in enumerate([0.5, 0.1, 0.9], start=1):
        state, _ = step(state, jnp.asarray(hr), None)
        states.append(state)
        ckpt.save(i, state, metrics={"val_loss": vl})
        # mutate the live reference after an in-flight save: the async path
        # must have snapshotted, not aliased
        state, _ = step(state, jnp.asarray(hr), None)

    fresh = create_train_state(model, jax.random.key(42), hr[:2], make_optimizer(1e-3))
    assert ckpt.latest_step() == 3  # barriers, then sees all saves
    best = ckpt.restore_best(fresh)
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(best.params)[0]),
        np.asarray(jax.tree_util.tree_leaves(states[1].params)[0]),
    )
    latest = ckpt.restore_latest(fresh)
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(latest.params)[0]),
        np.asarray(jax.tree_util.tree_leaves(states[2].params)[0]),
    )
    ckpt.close()


def test_cosine_schedule_matches_keras_semantics():
    sched = cosine_decay_schedule(1e-3, decay_steps=100, alpha=0.0)
    assert float(sched(0)) == pytest.approx(1e-3)
    assert float(sched(50)) == pytest.approx(5e-4, rel=1e-6)
    assert float(sched(100)) == pytest.approx(0.0, abs=1e-9)
    assert float(sched(200)) == pytest.approx(0.0, abs=1e-9)  # clamped past end


def test_dp_plus_spatial_sharding_matches_single_device():
    """2-D ('data','space') mesh: batch AND height sharded; GSPMD inserts
    conv halo exchanges — loss and params must match the unsharded run."""
    from adunet.parallel import make_dp_spatial_mesh

    mesh = make_dp_spatial_mesh(spatial_shards=2, n_devices=8)
    assert mesh.devices.shape == (4, 2)

    model, _ = build_super_resolution_unet(scale=0.5, depth_override=2, input_size=64, base_channels=8)
    hr = _synthetic_hr(n=8, size=64)
    loss_fn, _ = build_losses_and_metrics("charbonnier")
    step = make_sr_train_step(model, loss_fn, donate=False)

    s1 = create_train_state(model, jax.random.key(0), hr[:1], make_optimizer(1e-3))
    s1, m1 = step(s1, jnp.asarray(hr), None)

    s2 = create_train_state(model, jax.random.key(0), hr[:1], make_optimizer(1e-3))
    s2 = replicate(s2, mesh)
    s2, m2 = step(s2, shard_batch(jnp.asarray(hr), mesh), None)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)
    l1 = jax.tree_util.tree_leaves(s1.params)[0]
    l2 = jax.tree_util.tree_leaves(s2.params)[0]
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-6)


def test_combined_loss_trains(tmp_path):
    """combined = MSE + 0.1*(1-SSIM) + 0.01*VGG19-perceptual compiles and
    steps (random-init VGG in this offline image; reference default loss is
    charbonnier so baseline parity does not depend on the weights)."""
    from adunet.losses import build_losses_and_metrics, make_perceptual_fn

    model, _ = build_super_resolution_unet(scale=0.5, depth_override=1, input_size=32, base_channels=8)
    hr = _synthetic_hr(n=8)
    perceptual = make_perceptual_fn(input_size=32)
    loss_fn, _m = build_losses_and_metrics("combined", perceptual_fn=perceptual)
    state = create_train_state(model, jax.random.key(0), hr[:2], make_optimizer(1e-3))
    step = make_sr_train_step(model, loss_fn, donate=False)
    state, metrics = step(state, jnp.asarray(hr), None)
    assert np.isfinite(float(metrics["loss"]))


def test_profile_trace_written(tmp_path):
    model, _ = build_super_resolution_unet(scale=0.5, depth_override=1, input_size=32, base_channels=8)
    hr = _synthetic_hr(n=8)
    state = create_train_state(model, jax.random.key(0), hr[:2], make_optimizer(1e-3))
    loss_fn, _ = build_losses_and_metrics("charbonnier")
    step = make_sr_train_step(model, loss_fn, donate=False)
    fit(
        state, _loop(hr, 4), step, steps_per_epoch=1, epochs=2,
        profile_dir=tmp_path / "profile", verbose=0,
    )
    assert (tmp_path / "profile").exists()
    assert list((tmp_path / "profile").rglob("*"))  # trace files written


def test_perceptual_term_golden_pinned():
    """The seeded random-VGG19 perceptual term is regression-pinned.

    ImageNet weights are unreachable in this zero-egress image (the loader
    ``load_vgg19_params`` is ready for a real npz); until then the combined
    loss's VGG term uses the deterministic seed-19 tower, and this golden
    value guards it against silent drift (reference term:
    train_adaptive_unet.py:336-360).
    """
    import numpy as np
    import jax.numpy as jnp

    from adunet.losses import make_perceptual_fn

    fn = make_perceptual_fn(input_size=32)
    rng = np.random.default_rng(77)
    a = jnp.asarray(rng.random((2, 32, 32, 3), dtype=np.float32))
    b = jnp.asarray(rng.random((2, 32, 32, 3), dtype=np.float32))
    term = float(jnp.mean(jnp.square(fn(a) - fn(b))))
    assert term == pytest.approx(0.0670115128159523, rel=1e-4)


def test_fit_stops_on_nonfinite_loss():
    """Failure detection: a NaN epoch loss halts training before the bad
    state reaches a checkpoint (stop_on_nan, default on)."""
    import jax
    import jax.numpy as jnp

    from adunet.train import fit
    from adunet.train.state import TrainState
    import optax

    params = {"w": jnp.zeros((2,))}
    state = TrainState.create(
        apply_fn=lambda v, x: x, params=params, tx=optax.sgd(1e-2)
    )

    calls = {"n": 0}

    def bad_step(state, batch, rng):
        calls["n"] += 1
        loss = jnp.float32(jnp.nan) if calls["n"] > 2 else jnp.float32(1.0)
        return state, {"loss": loss}

    def batches():
        while True:
            yield np.zeros((2, 2), np.float32)

    result = fit(
        state, batches(), bad_step, steps_per_epoch=2, epochs=5,
        patience=None, verbose=0,
    )
    # epoch 1 fine (2 steps), epoch 2 contains the NaN -> stop
    assert result.stopped_early
    assert len(result.history) == 1


def test_sharded_val_matches_replicated_val():
    """VERDICT r2 #3: padded+sharded+masked validation must agree with the
    replicated path on ragged batches, on an 8-device mesh."""
    from adunet.parallel.mesh import pad_and_shard_ragged
    from adunet.train.sr import lift_per_sample

    model, _ = build_super_resolution_unet(
        scale=0.5, depth_override=1, input_size=32, base_channels=8
    )
    hr = _synthetic_hr(n=13)  # 13 -> ragged vs both batch 8 and 8 devices
    state = create_train_state(model, jax.random.key(0), hr[:2], make_optimizer(1e-3))
    loss_fn, _ = build_losses_and_metrics("charbonnier")
    mesh = make_mesh(8)
    state_r = replicate(state, mesh)

    vstep_vec = make_sr_val_step(model, loss_fn, per_sample=True)
    vstep_scalar = make_sr_val_step(model, loss_fn)

    # split into ragged batches: 8 + 5
    batches = [hr[:8], hr[8:]]

    # replicated reference: batch-size-weighted mean of per-batch scalar means
    ref, wsum = {}, 0.0
    for b in batches:
        out = vstep_scalar(state, jnp.asarray(b))
        n = b.shape[0]
        for k, v in out.items():
            ref[k] = ref.get(k, 0.0) + float(v) * n
        wsum += n
    ref = {k: v / wsum for k, v in ref.items()}

    # sharded path: pad to 8-divisible, shard, masked sums
    @jax.jit
    def masked(state_, batch_, mask_):
        out = vstep_vec(state_, batch_)
        return {k: jnp.sum(v * mask_) for k, v in out.items()}

    got, gsum = {}, 0.0
    for b in batches:
        sb, smask, n = pad_and_shard_ragged(b, mesh)
        sums = masked(state_r, sb, smask)
        for k, v in sums.items():
            got[k] = got.get(k, 0.0) + float(v)
        gsum += n
    got = {k: v / gsum for k, v in got.items()}

    for k in ref:
        np.testing.assert_allclose(got[k], ref[k], rtol=2e-5), k

    # per-sample lift really is the batch mean decomposed
    vec = vstep_vec(state, jnp.asarray(hr[:8]))
    scal = vstep_scalar(state, jnp.asarray(hr[:8]))
    for k in scal:
        np.testing.assert_allclose(float(jnp.mean(vec[k])), float(scal[k]), rtol=2e-5)


def test_fit_sharded_val_end_to_end():
    """fit(val_per_sample=True) on an 8-dev mesh == fit on 1 device (no mesh),
    same init/data: identical history val metrics within float tolerance."""
    model, _ = build_super_resolution_unet(
        scale=0.5, depth_override=1, input_size=32, base_channels=8
    )
    hr = _synthetic_hr(n=16)
    val = [hr[:8], hr[8:13]]  # ragged second batch
    loss_fn, _ = build_losses_and_metrics("charbonnier")

    def run(mesh):
        state = create_train_state(
            model, jax.random.key(0), hr[:2], make_optimizer(1e-3)
        )
        if mesh is not None:
            state = replicate(state, mesh)
        tstep = make_sr_train_step(model, loss_fn, donate=False)
        vstep = make_sr_val_step(model, loss_fn, per_sample=True)
        res = fit(
            state,
            _loop(hr, 8),
            tstep,
            steps_per_epoch=2,
            epochs=2,
            val_data=val,
            val_step=vstep,
            mesh=mesh,
            verbose=0,
            val_per_sample=True,
        )
        return [e.val_metrics for e in res.history]

    single = run(None)
    sharded = run(make_mesh(8))
    for a, b in zip(single, sharded):
        for k in a:
            np.testing.assert_allclose(a[k], b[k], rtol=5e-5, err_msg=k)


def test_fit_restore_best_preserves_sharding():
    """restore_best_weights must re-place the best host snapshot onto each
    leaf's LIVE sharding — a bare device_put would collapse a replicated
    (or model-sharded) state onto one device after fit()."""
    model, _ = build_super_resolution_unet(
        scale=0.5, depth_override=1, input_size=32, base_channels=8
    )
    hr = _synthetic_hr(n=16)
    loss_fn, _ = build_losses_and_metrics("charbonnier")
    mesh = make_mesh(8)
    state = replicate(
        create_train_state(model, jax.random.key(0), hr[:2], make_optimizer(1e-3)),
        mesh,
    )
    tstep = make_sr_train_step(model, loss_fn, donate=False)
    vstep = make_sr_val_step(model, loss_fn, per_sample=True)
    res = fit(
        state,
        _loop(hr, 8),
        tstep,
        steps_per_epoch=1,
        epochs=2,
        val_data=[hr[:8]],
        val_step=vstep,
        mesh=mesh,
        verbose=0,
        val_per_sample=True,
        restore_best_weights=True,
    )
    assert res.best_epoch is not None
    ref = jax.tree_util.tree_leaves(state.params)[0].sharding
    assert getattr(ref, "mesh", None) is not None  # replicated, not single-device
    for leaf in jax.tree_util.tree_leaves(res.state.params):
        assert leaf.sharding == ref, (leaf.sharding, ref)


def test_sharded_val_inf_metric_survives_padding():
    """A legitimate +inf per-sample val metric (inf PSNR on identical shaved
    patches is preserved throughout this codebase) must NOT become NaN when
    its row is duplicated as padding in the sharded path: inf * 0.0 = NaN,
    so the masked reduction has to select, not multiply."""
    model, _ = build_super_resolution_unet(
        scale=0.5, depth_override=1, input_size=32, base_channels=8
    )
    hr = _synthetic_hr(n=16)
    loss_fn, _ = build_losses_and_metrics("charbonnier")
    mesh = make_mesh(8)
    state = replicate(
        create_train_state(model, jax.random.key(0), hr[:2], make_optimizer(1e-3)),
        mesh,
    )
    tstep = make_sr_train_step(model, loss_fn, donate=False)

    def vstep(state_, b):
        # per-sample metric that is inf exactly on all-zero rows
        return {"m": 1.0 / jnp.mean(b, axis=(1, 2, 3))}

    # one ragged val batch (5 rows -> padded to 8) whose LAST row is zeros:
    # pad_and_shard_ragged duplicates that row into the masked padding
    val_batch = np.asarray(hr[:5]).copy()
    val_batch[-1] = 0.0

    res = fit(
        state,
        _loop(hr, 8),
        tstep,
        steps_per_epoch=1,
        epochs=1,
        val_data=[val_batch],
        val_step=vstep,
        mesh=mesh,
        verbose=0,
        val_per_sample=True,
    )
    got = res.history[0].val_metrics["m"]
    assert np.isinf(got) and got > 0, f"expected +inf val metric, got {got}"


def test_snapshot_refresh_batches_leaves_epoch_order_alone(tmp_path):
    """Building precise-BN refresh batches must not consume a shuffle epoch:
    the first training epoch's batch order is identical with and without the
    snapshot (same-seed reproducibility across --precise_bn)."""
    from adunet.data.seg_pipeline import SegPairDataset
    from adunet.train.seg import snapshot_refresh_batches

    pairs = []
    for i in range(10):
        img, msk = tmp_path / f"i{i}.npy", tmp_path / f"i{i}_mask.npy"
        np.save(img, np.full((8, 8, 3), i / 10, np.float32))
        np.save(msk, np.zeros((8, 8), np.float32))
        pairs.append((str(img), str(msk)))

    def first_epoch_signature(ds):
        batches = list(ds._batches())
        return [tuple(np.round(b[0][:, 0, 0, 0], 3)) for b in batches]

    kw = dict(batch_size=5, image_size=8, augment=False, shuffle=True, seed=7)
    baseline = first_epoch_signature(SegPairDataset(pairs, **kw))

    ds = SegPairDataset(pairs, **kw)
    refresh = snapshot_refresh_batches(ds, n_batches=3)
    assert len(refresh) == 3 and refresh[0].shape == (5, 8, 8, 3)
    # deterministic pair order, wrapping past the corpus end
    np.testing.assert_allclose(refresh[0][:, 0, 0, 0], np.arange(5) / 10, atol=1e-6)
    np.testing.assert_allclose(
        refresh[2][:, 0, 0, 0], np.array([0, 1, 2, 3, 4]) / 10, atol=1e-6
    )
    assert ds._epoch == 0  # no shuffle epoch consumed
    assert first_epoch_signature(ds) == baseline


def test_precise_bn_exactness_and_rescue():
    """VERDICT r2 #2 mitigation. (a) Exactness: refreshing stats from a
    single batch makes eval-mode forward equal train-mode forward on that
    batch (population stats == that batch's stats, layer by layer).
    (b) Rescue: after a few training steps the 0.99-momentum EMA still sits
    at its init (mean 0 / var 1) and eval-mode dice collapses; precise-BN
    recovers it to ~train-mode quality."""
    from adunet.train.seg import (
        make_bn_refresh_step,
        make_seg_train_step,
        precise_batch_stats,
    )
    from adunet.metrics.seg import dice_coefficient

    size, base, depth, batch = 32, 8, 2, 8
    model = build_adaptive_depth_unet(input_size=size, base_channels=base, depth=depth)
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:size, 0:size]
    imgs = np.empty((4, batch, size, size, 3), np.float32)
    masks = np.empty((4, batch, size, size, 1), np.float32)
    for b in range(4):
        for i in range(batch):
            cy, cx = rng.uniform(8, 24, 2)
            blob = ((yy - cy) ** 2 + (xx - cx) ** 2) < rng.uniform(5, 10) ** 2
            imgs[b, i] = np.clip(
                0.2 + 0.6 * blob[..., None] + 0.1 * rng.standard_normal((size, size, 3)),
                0, 1,
            )
            masks[b, i] = blob[..., None]

    state = create_train_state(
        model, jax.random.key(1), jnp.zeros((1, size, size, 3)), make_optimizer(3e-3)
    )
    loss_fn = make_hybrid_ce_dice_loss(0.4, 0.6)
    tstep = make_seg_train_step(model, loss_fn, augment="none", donate=False)
    for e in range(3):
        for b in range(4):
            state, m = tstep(state, (jnp.asarray(imgs[b]), jnp.asarray(masks[b])), jax.random.key(b))
    train_dice = float(m["dice"])

    refresh = make_bn_refresh_step()

    # (a) exactness on a single batch
    one = jnp.asarray(imgs[0])
    state_one = precise_batch_stats(state, [one], refresh)
    eval_pred = model.apply(
        {"params": state_one.params, "batch_stats": state_one.batch_stats},
        one, train=False,
    )
    train_pred, _ = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        one, train=True, mutable=["batch_stats"],
    )
    np.testing.assert_allclose(
        np.asarray(eval_pred), np.asarray(train_pred), atol=2e-3
    )

    # (b) rescue: EMA (12 updates at momentum .99) ~ init stats -> collapse
    def eval_dice(s):
        preds = model.apply(
            {"params": s.params, "batch_stats": s.batch_stats},
            jnp.asarray(imgs[1]), train=False,
        )
        return float(dice_coefficient(jnp.asarray(masks[1]), preds))

    ema_dice = eval_dice(state)
    state_precise = precise_batch_stats(
        state, [jnp.asarray(imgs[b]) for b in range(4)], refresh
    )
    precise_dice = eval_dice(state_precise)
    assert precise_dice > ema_dice + 0.05, (ema_dice, precise_dice, train_dice)
    assert precise_dice > 0.75 * train_dice, (precise_dice, train_dice)


def test_precise_bn_program_matches_per_batch_variant():
    """The fused scan program must produce the same statistics as the
    per-batch accumulation API."""
    from adunet.train.seg import (
        make_bn_refresh_step,
        make_precise_bn_program,
        precise_batch_stats,
    )

    model = build_adaptive_depth_unet(input_size=16, base_channels=4, depth=1)
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((1, 16, 16, 3)), make_optimizer(1e-3)
    )
    rng = np.random.default_rng(3)
    batches = [jnp.asarray(rng.random((4, 16, 16, 3), dtype=np.float32)) for _ in range(3)]

    ref = precise_batch_stats(state, batches, make_bn_refresh_step())
    fused = make_precise_bn_program()(state, jnp.stack(batches))

    ref_leaves = jax.tree_util.tree_leaves(ref.batch_stats)
    fused_leaves = jax.tree_util.tree_leaves(fused)
    assert len(ref_leaves) == len(fused_leaves)
    for a, b in zip(ref_leaves, fused_leaves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)


def _pooled_reference(all_masks, all_preds, num_classes=1):
    """Direct whole-set pooled values (the semantics PooledMetric must keep)."""
    from adunet.metrics import (
        global_dice_coefficient,
        mean_iou,
        precision,
        recall,
    )

    t, p = jnp.asarray(all_masks), jnp.asarray(all_preds)
    ref = {"dice_coefficient": float(global_dice_coefficient(t, p))}
    if num_classes > 1:
        ref["mean_iou"] = float(mean_iou(t, p, num_classes=num_classes))
    else:
        ref["precision"] = float(precision(t, p))
        ref["recall"] = float(recall(t, p))
    return ref


def test_pooled_metrics_sharded_val_exact():
    """Pooled metrics must survive the sharded-val lift EXACTLY: masked
    per-sample component sums + finalize == direct whole-set computation.
    (A plain per-sample lift silently turns the monitored whole-batch dice /
    precision / recall into means of per-image values — round-3 review.)"""
    from adunet.losses import binary_crossentropy
    from adunet.metrics import pooled_global_dice, pooled_precision, pooled_recall
    from adunet.models import build_unet
    from adunet.parallel.mesh import pad_and_shard_ragged
    from adunet.train import metric_finalizers_of

    model = build_unet(16, num_classes=1, base_channels=4, depth=1)
    rng = np.random.default_rng(3)
    images = rng.random((13, 16, 16, 3), dtype=np.float32)  # ragged vs 8
    masks = (rng.random((13, 16, 16, 1)) > 0.6).astype(np.float32)
    state = create_train_state(
        model, jax.random.key(0), jnp.asarray(images[:2]), make_optimizer(1e-3)
    )

    extra = {
        "dice_coefficient": pooled_global_dice(),
        "precision": pooled_precision(),
        "recall": pooled_recall(),
    }
    estep = make_seg_eval_step(model, binary_crossentropy, extra_metrics=extra,
                               per_sample=True)
    finalizers = metric_finalizers_of(extra)
    assert set(finalizers) == set(extra)

    # direct whole-set reference over the full val set
    variables = {"params": state.params}
    preds = state.apply_fn(variables, jnp.asarray(images), train=False)
    ref = _pooled_reference(masks, preds)

    mesh = make_mesh(8)
    state_r = replicate(state, mesh)

    @jax.jit
    def masked(state_, batch_, mask_):
        out = estep(state_, batch_)

        def reduce(v):
            m = mask_.reshape(mask_.shape + (1,) * (v.ndim - 1))
            return jnp.sum(jnp.where(m > 0, v, 0.0), axis=0)

        return {k: reduce(jnp.asarray(v)) for k, v in out.items()}

    vacc = {}
    for lo in (0, 8):  # ragged batches 8 + 5
        b = (jnp.asarray(images[lo:lo + 8]), jnp.asarray(masks[lo:lo + 8]))
        sb, smask, _n = pad_and_shard_ragged(b, mesh)
        for k, v in masked(state_r, sb, smask).items():
            vacc[k] = vacc.get(k, 0.0) + np.asarray(v)

    got = {name: fin({k.split("#", 1)[1]: vacc[k] for k in vacc
                      if k.startswith(name + "#")})
           for name, fin in finalizers.items()}
    for k, v in ref.items():
        np.testing.assert_allclose(got[k], v, rtol=1e-5, err_msg=k)


def test_pooled_metrics_fit_end_to_end_binary_and_multiclass():
    """fit(val_per_sample=True, metric_finalizers=...) must log pooled metrics
    equal to the direct whole-set computation with the post-epoch state —
    both on a mesh (sharded val) and without one (plain per-sample path)."""
    from adunet.losses import binary_crossentropy, make_weighted_ce_loss
    from adunet.metrics import (
        pooled_global_dice,
        pooled_mean_iou,
        pooled_precision,
        pooled_recall,
    )
    from adunet.models import build_unet
    from adunet.train import metric_finalizers_of

    rng = np.random.default_rng(7)
    images = rng.random((11, 16, 16, 3), dtype=np.float32)

    for num_classes in (1, 3):
        if num_classes == 1:
            masks = (rng.random((11, 16, 16, 1)) > 0.5).astype(np.float32)
            loss_fn = binary_crossentropy
            extra = {"dice_coefficient": pooled_global_dice(),
                     "precision": pooled_precision(),
                     "recall": pooled_recall()}
        else:
            labels = rng.integers(0, num_classes, (11, 16, 16))
            masks = np.eye(num_classes, dtype=np.float32)[labels]
            loss_fn = make_weighted_ce_loss([1.0] * num_classes)
            extra = {"mean_iou": pooled_mean_iou(num_classes),
                     "dice_coefficient": pooled_global_dice()}

        model = build_unet(16, num_classes=num_classes, base_channels=4, depth=1)
        for mesh in (None, make_mesh(8)):
            state = create_train_state(
                model, jax.random.key(1), jnp.asarray(images[:2]), make_optimizer(1e-3)
            )
            if mesh is not None:
                state = replicate(state, mesh)
            tstep = make_seg_train_step(model, loss_fn, augment=False, donate=False,
                                        extra_metrics=extra)
            estep = make_seg_eval_step(model, loss_fn, extra_metrics=extra,
                                       per_sample=True)

            def batches():
                for lo in (0, 8):
                    yield (jnp.asarray(images[lo:lo + 8]),
                           jnp.asarray(masks[lo:lo + 8]))

            def train_stream():
                while True:
                    yield (jnp.asarray(images[:8]), jnp.asarray(masks[:8]))

            result = fit(
                state, train_stream(), tstep, steps_per_epoch=1, epochs=1,
                rng=jax.random.key(0), val_data=list(batches()), val_step=estep,
                monitor="val_dice_coefficient", monitor_mode="max",
                mesh=mesh, val_per_sample=True,
                metric_finalizers=metric_finalizers_of(extra), verbose=0,
            )
            vm = result.history[0].val_metrics
            assert not any("#" in k for k in vm), vm  # components never logged
            tm = result.history[0].metrics
            assert not any("#" in k for k in tm), tm
            # train side pools over the epoch too (Keras stateful metrics)
            assert set(extra) <= set(tm), tm

            preds = result.state.apply_fn(
                {"params": result.state.params}, jnp.asarray(images), train=False
            )
            ref = _pooled_reference(masks, preds, num_classes)
            for k, v in ref.items():
                np.testing.assert_allclose(
                    vm[k], v, rtol=1e-4,
                    err_msg=f"{k} (classes={num_classes}, mesh={mesh is not None})",
                )


def test_snapshot_refresh_batches_uses_global_pairs():
    """Precise-BN refresh batches are mesh-REPLICATED, so every process must
    select them from the same (pre-shard) pair list — a process-local shard
    would put different values inside one logically-replicated array
    (round-3 review). snapshot_refresh_batches must prefer ``global_pairs``."""
    from adunet.train.seg import snapshot_refresh_batches

    class FakeDS:
        batch_size = 2

        def __init__(self):
            # simulate a process shard: local pairs are a strided slice
            self.global_pairs = [(f"img{i}", f"mask{i}") for i in range(6)]
            self.pairs = self.global_pairs[0::2]

        def _load_pair(self, image_path, mask_path):
            idx = int(image_path[3:])
            return np.full((4, 4, 3), idx, np.float32), np.zeros((4, 4, 1), np.float32)

    ds = FakeDS()
    batches = snapshot_refresh_batches(ds, n_batches=2)
    seen = sorted(int(v) for b in batches for v in np.unique(b))
    # deterministic order over the GLOBAL list: images 0,1 then 2,3
    assert seen == [0, 1, 2, 3], seen

    # without global_pairs (directly-constructed dataset) it falls back
    del ds.global_pairs
    batches = snapshot_refresh_batches(ds, n_batches=2)
    seen = sorted(int(v) for b in batches for v in np.unique(b))
    assert seen == [0, 2, 4, 0] or seen == [0, 0, 2, 4], seen  # local shard wraps


def test_grad_accum_matches_full_batch_step(perturb_params):
    """grad_accum=k must produce the SAME parameter update as the full-batch
    step (gradients of a batch-mean loss are linear), and the same metrics."""
    model, _ = build_super_resolution_unet(
        scale=0.5, depth_override=1, input_size=32, base_channels=8
    )
    hr = jnp.asarray(_synthetic_hr(n=16))
    loss_fn, _ = build_losses_and_metrics("charbonnier")

    def fresh():
        state = create_train_state(
            model, jax.random.key(0), hr[:2], make_optimizer(1e-3)
        )
        # identity-start zeroes all upstream gradients — perturb so the
        # update comparison covers the whole tree, not just the head
        return state.replace(params=perturb_params(state.params))

    full = make_sr_train_step(model, loss_fn, donate=False)
    accum = make_sr_train_step(model, loss_fn, donate=False, grad_accum=4)

    s_full, m_full = full(fresh(), hr, None)
    s_acc, m_acc = accum(fresh(), hr, None)

    np.testing.assert_allclose(float(m_acc["loss"]), float(m_full["loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(m_acc["psnr"]), float(m_full["psnr"]), rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(s_acc.params), jax.tree_util.tree_leaves(s_full.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-5, atol=5e-6)


def test_grad_accum_on_mesh_matches_single_device(perturb_params):
    """grad_accum under a sharded batch (with the micro-batch sharding
    constraint) must equal the unmeshed result."""
    from adunet.parallel import batch_sharding, shard_batch

    model, _ = build_super_resolution_unet(
        scale=0.5, depth_override=1, input_size=32, base_channels=8
    )
    hr = jnp.asarray(_synthetic_hr(n=16))
    loss_fn, _ = build_losses_and_metrics("charbonnier")
    state = create_train_state(model, jax.random.key(0), hr[:2], make_optimizer(1e-3))
    state = state.replace(params=perturb_params(state.params))

    mesh = make_mesh(8)
    # micro-batch size 16/2 = 8 stays divisible by the 8-way data axis
    step_m = make_sr_train_step(
        model, loss_fn, donate=False, grad_accum=2, batch_sharding=batch_sharding(mesh)
    )
    step_1 = make_sr_train_step(model, loss_fn, donate=False, grad_accum=2)

    s_m, m_m = step_m(replicate(state, mesh), shard_batch(hr, mesh), None)
    s_1, m_1 = step_1(state, hr, None)
    np.testing.assert_allclose(float(m_m["loss"]), float(m_1["loss"]), rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(s_m.params), jax.tree_util.tree_leaves(s_1.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-5, atol=5e-6)


def test_grad_accum_rejects_indivisible_batch():
    model, _ = build_super_resolution_unet(
        scale=0.5, depth_override=1, input_size=32, base_channels=8
    )
    loss_fn, _ = build_losses_and_metrics("charbonnier")
    step = make_sr_train_step(model, loss_fn, donate=False, grad_accum=3)
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((1, 32, 32, 3)), make_optimizer(1e-3)
    )
    with pytest.raises(ValueError, match="divisible"):
        step(state, jnp.asarray(_synthetic_hr(n=16)), None)


def test_device_cache_grad_accum_matches_full_batch_step(perturb_params):
    """The device-cache step with grad_accum=k samples the SAME full batch
    from the same key as the k=1 step (sampling happens before the
    micro-split), so its single averaged update must equal the full-batch
    update — this is what lets the 138M configs train from the HBM corpus at
    large effective batches (CLAUDE.md previously declared the combination
    incompatible)."""
    from adunet.train.sr import make_sr_device_cache_train_step

    model, _ = build_super_resolution_unet(
        scale=0.5, depth_override=1, input_size=16, base_channels=8
    )
    corpus = jnp.asarray(
        (np.random.default_rng(3).random((5, 24, 24, 3)) * 255).astype(np.uint8)
    )
    loss_fn, _ = build_losses_and_metrics("charbonnier")

    def fresh():
        state = create_train_state(
            model, jax.random.key(0), jnp.zeros((1, 16, 16, 3)), make_optimizer(1e-3)
        )
        return state.replace(params=perturb_params(state.params))

    kwargs = dict(patch_size=16, batch_size=8, donate=False)
    full = make_sr_device_cache_train_step(model, loss_fn, corpus, **kwargs)
    accum = make_sr_device_cache_train_step(
        model, loss_fn, corpus, grad_accum=4, **kwargs
    )

    rng = jax.random.key(11)
    s_full, m_full = full(fresh(), None, rng)
    s_acc, m_acc = accum(fresh(), None, rng)

    np.testing.assert_allclose(float(m_acc["loss"]), float(m_full["loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(m_acc["psnr"]), float(m_full["psnr"]), rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(s_acc.params), jax.tree_util.tree_leaves(s_full.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-5, atol=5e-6)

    with pytest.raises(ValueError, match="divisible"):
        make_sr_device_cache_train_step(
            model, loss_fn, corpus, grad_accum=3, **kwargs
        )


def test_reduce_lr_on_plateau_matches_keras_callback():
    """Drive Keras's ACTUAL ReduceLROnPlateau callback and our plateau_update
    over the same randomized metric sequences: the produced LR schedule must
    be identical epoch by epoch. Covers min_delta (sub-threshold
    "improvements" must NOT reset the wait counter — exactly the plateau
    regime the callback exists for), cooldown, min_lr clamping, inf/nan
    metrics, and both modes. Reference relies on the Keras defaults
    (Segmenation/code/unet_vinillia.py:281)."""
    tf = pytest.importorskip("tensorflow")
    from tensorflow import keras

    from adunet.train.loop import make_plateau_state, plateau_update

    rng = np.random.default_rng(0)
    specs = [
        dict(monitor="val_loss", mode="min", factor=0.5, patience=5, min_lr=1e-6),
        dict(monitor="val_loss", mode="min", factor=0.3, patience=2, min_lr=1e-5,
             cooldown=3),
        dict(monitor="val_dice", mode="max", factor=0.5, patience=3, min_lr=1e-6,
             min_delta=1e-2),
    ]
    for si, spec in enumerate(specs):
        # metric sequences with long plateaus: large moves early, then
        # sub-min_delta jitter (the regime where min_delta decides behavior)
        n_epochs = 40
        base = np.concatenate([
            np.linspace(1.0, 0.3, 10),
            0.3 + rng.normal(0, 5e-5, 15),       # sub-1e-4 jitter plateau
            np.linspace(0.3, 0.29, 5),
            0.29 + rng.normal(0, 2e-2, 10),      # noisy regime
        ])
        if spec["mode"] == "max":
            base = 1.0 - base
        base = base.astype(np.float64)
        base[17] = np.inf if spec["mode"] == "min" else -np.inf  # inf epoch
        lr0 = 1e-3

        # Keras oracle: a real compiled model, callback driven via
        # on_epoch_end with synthetic logs
        model = keras.Sequential([keras.layers.Dense(1, input_shape=(1,))])
        model.compile(optimizer=keras.optimizers.Adam(learning_rate=lr0), loss="mse")
        kcb = keras.callbacks.ReduceLROnPlateau(
            monitor=spec["monitor"], mode=spec["mode"], factor=spec["factor"],
            patience=spec["patience"], min_lr=spec["min_lr"],
            min_delta=spec.get("min_delta", 1e-4),
            cooldown=spec.get("cooldown", 0), verbose=0,
        )
        kcb.set_model(model)
        kcb.on_train_begin()
        keras_lrs = []
        for epoch, v in enumerate(base):
            kcb.on_epoch_end(epoch, logs={spec["monitor"]: float(v)})
            keras_lrs.append(float(np.asarray(model.optimizer.learning_rate)))

        # ours
        rlp = make_plateau_state(spec)
        lr = lr0
        our_lrs = []
        for v in base:
            if plateau_update(rlp, float(v)):
                lr = max(lr * rlp["factor"], rlp["min_lr"])
            our_lrs.append(lr)

        np.testing.assert_allclose(
            our_lrs, keras_lrs, rtol=1e-6,
            err_msg=f"spec {si}: LR schedules diverged\nours : {our_lrs}\nkeras: {keras_lrs}",
        )


def test_fit_ckpt_every_cadence_and_final_save(tmp_path):
    """ckpt_every=N saves only every Nth epoch, PLUS the final epoch and the
    early-stop epoch (resume/export must always see the run's end state).
    Added round 4: the per-epoch device->host state pull dominated epoch
    time for the 138M sweep configs on the remote-TPU tunnel."""
    model, _ = build_super_resolution_unet(scale=0.5, depth_override=1, input_size=32, base_channels=8)
    hr = _synthetic_hr(n=8)
    loss_fn, _ = build_losses_and_metrics("charbonnier")
    step = make_sr_train_step(model, loss_fn, donate=False)
    val_step = make_sr_val_step(model, loss_fn)

    def spy(ckpt):
        calls = []
        orig = ckpt.save

        def recording(step, state, metrics=None):
            calls.append(step)
            return orig(step, state, metrics=metrics)

        ckpt.save = recording
        return calls

    # 7 epochs, no early stop: save calls at cadence (3, 6) + final epoch 7
    state = create_train_state(model, jax.random.key(0), hr[:2], make_optimizer(1e-3))
    ckpt = CheckpointManager(tmp_path / "ckpt_cadence", monitor="val_loss", mode="min")
    calls = spy(ckpt)
    fit(
        state, _loop(hr, 4), step, steps_per_epoch=2, epochs=7,
        val_data=[hr[:4]], val_step=val_step,
        monitor="val_loss", monitor_mode="min", patience=0,
        ckpt=ckpt, ckpt_every=3, verbose=0,
    )
    ckpt.close()
    assert calls == [3, 6, 7], calls

    # early stop fires off-cadence: the stop epoch is still checkpointed
    # (lr=0 => weights frozen => val_loss constant => stop at patience+1)
    state = create_train_state(model, jax.random.key(0), hr[:2], make_optimizer(0.0))
    frozen_step = make_sr_train_step(model, loss_fn, donate=False)
    ckpt = CheckpointManager(tmp_path / "ckpt_es", monitor="val_loss", mode="min")
    calls = spy(ckpt)
    result = fit(
        state, _loop(hr, 4), frozen_step, steps_per_epoch=2, epochs=50,
        val_data=[hr[:4]], val_step=val_step,
        monitor="val_loss", monitor_mode="min", patience=2,
        ckpt=ckpt, ckpt_every=100,  # cadence alone would never fire
        restore_best_weights=False,
        verbose=0,
    )
    ckpt.close()
    assert result.stopped_early
    assert calls, "the early-stop epoch must be checkpointed"
    assert calls[-1] == len(result.history)  # saved at the stop epoch


def test_fit_backfills_best_epoch_checkpoint_under_sparse_cadence(tmp_path):
    """With ckpt_every > 1, a best epoch between cadence points must still end
    up on disk: disk restore_best would otherwise hand downstream consumers
    (evaluate --restore_best, export) weights up to ckpt_every-1 epochs worse
    than the run's reported best — breaking the reference's every-epoch
    ModelCheckpoint(best) parity (ADVICE r4). The val metric here is scripted
    off state.step so the best (epoch 3) falls off the 10-epoch cadence."""
    model, _ = build_super_resolution_unet(scale=0.5, depth_override=1, input_size=32, base_channels=8)
    hr = _synthetic_hr(n=8)
    loss_fn, _ = build_losses_and_metrics("charbonnier")
    step = make_sr_train_step(model, loss_fn, donate=False)

    def scripted_val_step(state, batch):
        # best at step 3 (== epoch 3 with steps_per_epoch=1), worse after
        s = jnp.asarray(state.step, jnp.float32)
        return {"loss": (s - 3.0) ** 2}

    state = create_train_state(model, jax.random.key(0), hr[:2], make_optimizer(1e-3))
    ckpt = CheckpointManager(tmp_path / "ckpt", monitor="val_loss", mode="min")
    result = fit(
        state, _loop(hr, 4), step, steps_per_epoch=1, epochs=6,
        val_data=[hr[:4]], val_step=scripted_val_step,
        monitor="val_loss", monitor_mode="min", patience=0,
        ckpt=ckpt, ckpt_every=10, verbose=0,
    )
    assert result.best_epoch == 3
    # disk agrees with the in-memory best: restore_best returns the epoch-3
    # params, which fit() also restored into the returned state. Use a fresh
    # manager, as the downstream consumers (evaluate --restore_best, export)
    # do — they never share the trainer's manager instance.
    ckpt.close()
    reader = CheckpointManager(tmp_path / "ckpt", monitor="val_loss", mode="min")
    probe = create_train_state(model, jax.random.key(1), hr[:2], make_optimizer(1e-3))
    restored = reader.restore_best_weights(probe)
    reader.close()
    assert restored is not None
    for a, b in zip(
        jax.tree_util.tree_leaves(restored.params),
        jax.tree_util.tree_leaves(result.state.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fit_restore_best_with_donated_train_step():
    """Device-side best-weights retention must survive buffer donation: the
    production step donates its state, so the retained best must be a fresh
    copy, not an alias into donated buffers (ADVICE r4). Scripted best at
    epoch 3; the restored params must equal the epoch-3 snapshot."""
    model, _ = build_super_resolution_unet(scale=0.5, depth_override=1, input_size=32, base_channels=8)
    hr = _synthetic_hr(n=8)
    loss_fn, _ = build_losses_and_metrics("charbonnier")
    inner = make_sr_train_step(model, loss_fn, donate=True)
    snaps = []

    def recording_step(state, batch, rng):
        new_state, metrics = inner(state, batch, rng)
        snaps.append(jax.device_get(new_state.params))  # fresh buffers
        return new_state, metrics

    def scripted_val_step(state, batch):
        s = jnp.asarray(state.step, jnp.float32)
        return {"loss": (s - 3.0) ** 2}

    state = create_train_state(model, jax.random.key(0), hr[:2], make_optimizer(1e-3))
    result = fit(
        state, _loop(hr, 4), recording_step, steps_per_epoch=1, epochs=6,
        val_data=[hr[:4]], val_step=scripted_val_step,
        monitor="val_loss", monitor_mode="min", patience=0,
        restore_best_weights=True, verbose=0,
    )
    assert result.best_epoch == 3
    for a, b in zip(
        jax.tree_util.tree_leaves(snaps[2]),
        jax.tree_util.tree_leaves(result.state.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

"""Protocol-level training parity vs the Keras oracle (VERDICT r2 #1).

Round 2 pinned per-step dynamics (30 SR / 10 seg steps). These tests pin the
FULL protocol machinery end-to-end against Keras running the reference's own
callback stack:

- seg protocol A over many epochs: cosine-decayed Adam, per-epoch val
  metrics, EarlyStopping(val_dice, max, restore_best_weights) firing on the
  SAME epoch, the SAME best epoch selected, and the restored best weights
  functionally equal (Segmenation/code/train_adaptive_unet.py:370-460).
- SR combined loss (MSE + SSIM + VGG19 perceptual) with the SAME random VGG
  weights loaded into both frameworks, locked over a 100-step curve
  (Super_resolution/code/train_adaptive_unet.py:336-373).

Everything runs on CPU with fixed seeds — curves are deterministic, so the
epoch-level decisions (stop epoch, best epoch) are exact reproducible facts,
not statistical ones.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import tensorflow as tf

from adunet.losses import make_hybrid_ce_dice_loss
from adunet.models import build_adaptive_depth_unet, build_super_resolution_unet
from adunet.train import (
    create_train_state,
    fit,
    make_optimizer,
    make_seg_eval_step,
    make_seg_train_step,
)


def _build_keras_seg(size, base, depth):
    """Keras twin of build_adaptive_depth_unet (BatchNorm blocks, MaxPool
    encoder, bilinear-UpSampling decoder, sigmoid 1x1 head) — same topology
    as the forward-parity oracle in test_model_parity_tf."""
    from tensorflow.keras import Input, Model
    from tensorflow.keras import layers as L

    def conv_block(t, nf, name):
        t = L.Conv2D(nf, 3, padding="same", name=f"{name}_conv0")(t)
        t = L.BatchNormalization(name=f"{name}_norm0")(t)
        t = L.Activation("relu")(t)
        t = L.Conv2D(nf, 3, padding="same", name=f"{name}_conv1")(t)
        t = L.BatchNormalization(name=f"{name}_norm1")(t)
        return L.Activation("relu")(t)

    inputs = Input(shape=(size, size, 3))
    t = inputs
    skips = []
    nf = base
    for level in range(depth):
        skip = conv_block(t, nf, f"enc{level}")
        t = L.MaxPooling2D(2)(skip)
        skips.append(skip)
        nf *= 2
    t = conv_block(t, nf, "bottleneck")
    for level, skip in reversed(list(enumerate(skips))):
        nf //= 2
        t = L.UpSampling2D(size=(2, 2), interpolation="bilinear")(t)
        t = L.Concatenate()([t, skip])
        t = conv_block(t, nf, f"dec{level}")
    out = L.Conv2D(1, 1, activation="sigmoid", name="lesion_mask")(t)
    return Model(inputs, out)


def _load_seg_weights(kmodel, params0, stats0):
    for layer in kmodel.layers:
        name = layer.name
        if name.endswith(("_conv0", "_conv1")):
            block, _, suffix = name.rpartition("_")
            tree = params0[block][f"conv{suffix[-1]}"]
            layer.set_weights([tree["kernel"], tree["bias"]])
        elif name == "lesion_mask":
            layer.set_weights(
                [params0["lesion_mask"]["kernel"], params0["lesion_mask"]["bias"]]
            )
        elif "_norm" in name:
            block, _, norm = name.rpartition("_")
            p = params0[block][norm]
            s = stats0[block][norm]
            layer.set_weights([p["scale"], p["bias"], s["mean"], s["var"]])


def _hybrid_tf(y_true, y_pred):
    y_true = tf.cast(y_true, tf.float32)
    p = tf.clip_by_value(tf.cast(y_pred, tf.float32), 1e-7, 1 - 1e-7)
    bce = -tf.reduce_mean(
        y_true * tf.math.log(p) + (1 - y_true) * tf.math.log(1 - p)
    )
    inter = tf.reduce_sum(y_true * p, axis=[1, 2, 3])
    union = tf.reduce_sum(y_true + p, axis=[1, 2, 3])
    dice = tf.reduce_mean((2 * inter + 1e-6) / (union + 1e-6))
    return 0.4 * bce + 0.6 * (1 - dice)


def _dice_tf(y_true, y_pred):
    y_true = tf.cast(y_true, tf.float32)
    p = tf.clip_by_value(tf.cast(y_pred, tf.float32), 1e-7, 1 - 1e-7)
    inter = tf.reduce_sum(y_true * p, axis=[1, 2, 3])
    union = tf.reduce_sum(y_true + p, axis=[1, 2, 3])
    return tf.reduce_mean((2 * inter + 1e-6) / (union + 1e-6))


def _protocol_a_data(seed=77, size=32, n_train=8, n_val=4):
    """Structured lesion-style data: blob masks correlated with the image so
    dice actually trains, plus noise so it overfits and val peaks."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:size, 0:size]

    def make(n, jitter):
        imgs = np.empty((n, size, size, 3), np.float32)
        masks = np.empty((n, size, size, 1), np.float32)
        for i in range(n):
            cy, cx = rng.uniform(size * 0.3, size * 0.7, 2)
            r = rng.uniform(size * 0.15, size * 0.3)
            blob = ((yy - cy) ** 2 + (xx - cx) ** 2) < r**2
            base = 0.25 + 0.5 * blob.astype(np.float32)
            img = base[..., None] + jitter * rng.standard_normal((size, size, 3))
            imgs[i] = np.clip(img, 0, 1)
            masks[i] = blob[..., None].astype(np.float32)
        return imgs, masks

    return make(n_train, 0.18), make(n_val, 0.18)


def test_protocol_a_machinery_matches_keras():
    """Cosine decay + per-epoch val metrics + early stop + best-epoch parity
    over a multi-epoch protocol-A run."""
    size, base, depth = 32, 8, 1
    batch, lr0 = 4, 5e-3
    max_epochs, patience = 8, 2
    (train_x, train_y), (val_x, val_y) = _protocol_a_data(size=size)
    steps_per_epoch = train_x.shape[0] // batch
    total_steps = max_epochs * steps_per_epoch

    model = build_adaptive_depth_unet(input_size=size, base_channels=base, depth=depth)
    tx = make_optimizer(lr0, cosine_decay_steps=total_steps)
    state0 = create_train_state(
        model, jax.random.key(3), jnp.zeros((1, size, size, 3)), tx
    )
    params0 = jax.tree_util.tree_map(np.asarray, state0.params)
    stats0 = jax.tree_util.tree_map(np.asarray, state0.batch_stats)

    loss_fn = make_hybrid_ce_dice_loss(0.4, 0.6)
    tstep = make_seg_train_step(model, loss_fn, augment="none", donate=False)
    vstep = make_seg_eval_step(model, loss_fn, per_sample=True)

    def batches():
        while True:
            for i in range(0, train_x.shape[0], batch):
                yield (
                    jnp.asarray(train_x[i : i + batch]),
                    jnp.asarray(train_y[i : i + batch]),
                )

    val_batches = [
        (val_x[i : i + batch], val_y[i : i + batch])
        for i in range(0, val_x.shape[0], batch)
    ]
    result = fit(
        state0,
        batches(),
        tstep,
        steps_per_epoch=steps_per_epoch,
        epochs=max_epochs,
        rng=jax.random.key(0),
        val_data=val_batches,
        val_step=vstep,
        monitor="val_dice",
        monitor_mode="max",
        patience=patience,
        restore_best_weights=True,
        verbose=0,
        val_per_sample=True,
    )
    ours_train_loss = [e.metrics["loss"] for e in result.history]
    ours_val_dice = [e.val_metrics["dice"] for e in result.history]

    # --- Keras: the reference's own callback stack ---
    kmodel = _build_keras_seg(size, base, depth)
    _load_seg_weights(kmodel, params0, stats0)
    schedule = tf.keras.optimizers.schedules.CosineDecay(
        initial_learning_rate=lr0, decay_steps=total_steps, alpha=0.0
    )
    _dice_tf.__name__ = "dice"
    kmodel.compile(
        optimizer=tf.keras.optimizers.Adam(learning_rate=schedule),
        loss=_hybrid_tf,
        metrics=[_dice_tf],
    )
    es = tf.keras.callbacks.EarlyStopping(
        monitor="val_dice", mode="max", patience=patience, restore_best_weights=True
    )
    hist = kmodel.fit(
        train_x,
        train_y,
        batch_size=batch,
        epochs=max_epochs,
        shuffle=False,
        validation_data=(val_x, val_y),
        validation_batch_size=batch,
        callbacks=[es],
        verbose=0,
    )
    keras_train_loss = hist.history["loss"]
    keras_val_dice = hist.history["val_dice"]

    # per-epoch curves locked (as far as both ran)
    n = min(len(ours_train_loss), len(keras_train_loss))
    assert n >= 3
    np.testing.assert_allclose(
        ours_train_loss[:n], keras_train_loss[:n], rtol=5e-3, atol=1e-3
    )
    np.testing.assert_allclose(
        ours_val_dice[:n], keras_val_dice[:n], rtol=5e-3, atol=2e-3
    )

    # the protocol decisions are the SAME facts in both frameworks
    assert len(ours_train_loss) == len(keras_train_loss), (
        "early stopping fired on different epochs",
        len(ours_train_loss),
        len(keras_train_loss),
    )
    keras_best_epoch = int(np.argmax(keras_val_dice)) + 1
    assert result.best_epoch == keras_best_epoch
    stopped_keras = len(keras_train_loss) < max_epochs
    assert result.stopped_early == stopped_keras

    # restore_best_weights: both models must now BE the best epoch's model
    holdout = np.clip(
        val_x + 0.01 * np.random.default_rng(5).standard_normal(val_x.shape), 0, 1
    ).astype(np.float32)
    ours_pred = np.asarray(
        jax.jit(lambda v, x: model.apply(v, x, train=False))(
            {"params": result.state.params, "batch_stats": result.state.batch_stats},
            jnp.asarray(holdout),
        )
    )
    keras_pred = kmodel(holdout, training=False).numpy()
    np.testing.assert_allclose(ours_pred, keras_pred, atol=2e-2)


def test_sr_combined_loss_dynamics_match_keras_100_steps():
    """Combined (MSE + 0.1*SSIM + 0.01*VGG19-perceptual) training curve
    parity over 100 steps with IDENTICAL random VGG19 weights in both
    frameworks — closes the 'combined loss never dynamics-tested' gap
    without ImageNet weights (offline env)."""
    from adunet.losses import build_losses_and_metrics
    from adunet.losses.perceptual import VGG19Features
    from adunet.train import make_sr_train_step

    size, batch, n_steps, lr_rate = 32, 4, 100, 1e-4
    scale, depth, base, head_ch = 0.5, 1, 8, 8

    # --- shared random VGG19 weights ---
    vgg = VGG19Features()
    vgg_vars = vgg.init(jax.random.key(19), jnp.zeros((1, size, size, 3)))

    def perceptual_fn(rgb01):
        return vgg.apply(vgg_vars, rgb01)

    loss_fn, _ = build_losses_and_metrics("combined", perceptual_fn=perceptual_fn)

    model, _ = build_super_resolution_unet(
        scale=scale, depth_override=depth, input_size=size,
        base_channels=base, residual_head_channels=head_ch,
    )
    rng = np.random.default_rng(42)
    hr_seq = rng.random((n_steps, batch, size, size, 3), dtype=np.float32)
    from adunet.ops import degrade

    lr_seq = np.asarray(
        jax.jit(jax.vmap(lambda h: degrade(h, 0.5, size)))(jnp.asarray(hr_seq))
    )

    state = create_train_state(
        model,
        jax.random.key(5),
        jnp.zeros((1, size, size, 3)),
        make_optimizer(lr_rate),
    )
    params0 = jax.tree_util.tree_map(np.asarray, state.params)
    params0["residual_rgb"]["kernel"] = rng.normal(
        0, 0.05, params0["residual_rgb"]["kernel"].shape
    ).astype(np.float32)
    state = state.replace(params=jax.tree_util.tree_map(jnp.asarray, params0))

    step = make_sr_train_step(model, loss_fn, donate=False)
    ours_losses = []
    for i in range(n_steps):
        state, metrics = step(state, (jnp.asarray(lr_seq[i]), jnp.asarray(hr_seq[i])))
        ours_losses.append(float(metrics["loss"]))

    # --- Keras oracle: applications VGG19 (weights=None) with OUR weights ---
    from test_model_parity_tf import _keras_adaptive_sr, _load_flax_params_into_keras

    kvgg = tf.keras.applications.VGG19(
        include_top=False, weights=None, input_shape=(size, size, 3)
    )
    for block, n_convs in ((1, 2), (2, 2), (3, 4), (4, 4)):
        for conv in range(1, n_convs + 1):
            name = f"block{block}_conv{conv}"
            tree = vgg_vars["params"][name]
            kvgg.get_layer(name).set_weights(
                [np.asarray(tree["kernel"]), np.asarray(tree["bias"])]
            )
    feat = tf.keras.Model(kvgg.input, kvgg.get_layer("block4_conv4").output)
    feat.trainable = False

    def combined_tf(y_true, y_pred):
        y_true = tf.cast(y_true, tf.float32)
        y_pred_f = tf.cast(y_pred, tf.float32)
        mse = tf.reduce_mean(tf.square(y_true - y_pred_f))
        ssim = 1.0 - tf.reduce_mean(tf.image.ssim(y_true, y_pred_f, max_val=1.0))
        ct = tf.clip_by_value(y_true, 0.0, 1.0)
        cp = tf.clip_by_value(y_pred_f, 0.0, 1.0)
        # Keras applies block4_conv4's ReLU inside the conv layer
        # (activation='relu'), identical to our post-conv relu placement.
        ft = feat(tf.keras.applications.vgg19.preprocess_input(ct * 255.0))
        fp = feat(tf.keras.applications.vgg19.preprocess_input(cp * 255.0))
        perc = tf.reduce_mean(tf.square(ft - fp))
        return 1.0 * mse + 0.1 * ssim + 0.01 * perc

    kmodel = _keras_adaptive_sr(scale, depth, base, head_ch, size)
    _load_flax_params_into_keras(kmodel, params0)
    kmodel.compile(
        optimizer=tf.keras.optimizers.Adam(learning_rate=lr_rate), loss=combined_tf
    )
    keras_losses = []
    for i in range(n_steps):
        kmodel.reset_metrics()
        out = kmodel.train_on_batch(lr_seq[i], hr_seq[i])
        keras_losses.append(float(out[0] if isinstance(out, (list, tuple)) else out))

    ours_losses = np.asarray(ours_losses)
    keras_losses = np.asarray(keras_losses)
    # 100 steps of compounding f32 drift: slightly looser than the 30-step
    # charbonnier lock, but the whole trajectory must track, not diverge
    np.testing.assert_allclose(ours_losses, keras_losses, rtol=2e-2, atol=2e-3)
    np.testing.assert_allclose(
        ours_losses[:20], keras_losses[:20], rtol=6e-3, atol=6e-4
    )
    assert ours_losses[-1] < ours_losses[0]
    assert keras_losses[-1] < keras_losses[0]

    # functional end-state parity on held-out data
    holdout_hr = rng.random((batch, size, size, 3), dtype=np.float32)
    holdout_lr = np.asarray(
        jax.jit(lambda h: degrade(h, 0.5, size))(jnp.asarray(holdout_hr))
    )
    ours_pred = np.asarray(
        jax.jit(model.apply)({"params": state.params}, jnp.asarray(holdout_lr))
    )
    keras_pred = kmodel(holdout_lr, training=False).numpy()
    np.testing.assert_allclose(ours_pred, keras_pred, atol=2e-2)

"""Whole-model forward parity against a Keras oracle.

Builds the adaptive SR U-Net *in Keras/TF* following the reference's
documented architecture (conv3x3→LayerNorm→ReLU blocks, fractional
tf.image.resize pooling, resize-to-match + smooth-conv + concat decoder,
zero-init residual head with clipped add — train_adaptive_unet.py:200-287),
loads OUR Flax parameters into it, and checks the two frameworks produce the
same output for the same input. This pins every semantic detail at once:
padding, LN epsilon/axis, resize kernels and edge handling, concat order,
residual head, and clipping.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adunet.models import build_super_resolution_unet, build_adaptive_depth_unet

tf = pytest.importorskip("tensorflow")


def _keras_adaptive_sr(scale, depth, base, head_ch, size):
    from tensorflow.keras import Input, Model
    from tensorflow.keras import layers as L

    def conv_block(x, nf, name):
        x = L.Conv2D(nf, 3, padding="same", name=f"{name}_conv0")(x)
        x = L.LayerNormalization(axis=-1, name=f"{name}_norm0")(x)
        x = L.Activation("relu")(x)
        x = L.Conv2D(nf, 3, padding="same", name=f"{name}_conv1")(x)
        x = L.LayerNormalization(axis=-1, name=f"{name}_norm1")(x)
        return L.Activation("relu")(x)

    def resize_by_scale(x):
        h = tf.shape(x)[1]
        w = tf.shape(x)[2]
        nh = tf.maximum(tf.cast(tf.math.ceil(tf.cast(h, tf.float32) * scale), tf.int32), 1)
        nw = tf.maximum(tf.cast(tf.math.ceil(tf.cast(w, tf.float32) * scale), tf.int32), 1)
        return tf.image.resize(x, [nh, nw], method="bilinear", antialias=True)

    inputs = Input(shape=(size, size, 3))
    x = inputs
    skips = []
    nf = base
    for level in range(depth):
        skip = conv_block(x, nf, f"enc{level}")
        x = L.Lambda(resize_by_scale)(skip)
        skips.append(skip)
        nf *= 2
    x = conv_block(x, nf, "bottleneck")
    for level, skip in reversed(list(enumerate(skips))):
        nf //= 2
        target = skip.shape[1]
        x = L.Lambda(lambda t, s=target: tf.image.resize(t, [s, s], method="bilinear", antialias=True))(x)
        x = L.Conv2D(nf, 3, padding="same", activation="relu", name=f"dec{level}_smooth")(x)
        x = L.Concatenate()([x, skip])
        x = conv_block(x, nf, f"dec{level}")
    x = conv_block(x, head_ch, "head")
    residual = L.Conv2D(3, 1, padding="same", kernel_initializer="zeros",
                        bias_initializer="zeros", name="residual_rgb")(x)
    out = L.Lambda(lambda t: tf.clip_by_value(t[0] + t[1], 0.0, 1.0))([inputs, residual])
    return Model(inputs, out)


def _load_flax_params_into_keras(kmodel, params):
    def conv_w(tree):
        return [np.asarray(tree["kernel"]), np.asarray(tree["bias"])]

    def block_w(name):
        tree = params[name]
        return {
            f"{name}_conv0": conv_w(tree["conv0"]),
            f"{name}_norm0": [np.asarray(tree["norm0"]["scale"]), np.asarray(tree["norm0"]["bias"])],
            f"{name}_conv1": conv_w(tree["conv1"]),
            f"{name}_norm1": [np.asarray(tree["norm1"]["scale"]), np.asarray(tree["norm1"]["bias"])],
        }

    weight_map = {}
    for name in params:
        if "kernel" in params[name]:  # plain conv (heads, smooth convs)
            weight_map[name] = conv_w(params[name])
        else:  # ConvBlock subtree
            weight_map.update(block_w(name))

    for layer in kmodel.layers:
        if layer.name in weight_map:
            layer.set_weights(weight_map[layer.name])


def test_adaptive_sr_forward_matches_keras_oracle():
    scale, depth, base, head_ch, size = 0.5, 2, 8, 8, 64
    model, _ = build_super_resolution_unet(
        scale=scale, depth_override=depth, input_size=size,
        base_channels=base, residual_head_channels=head_ch,
    )
    rng = np.random.default_rng(0)
    x = rng.random((2, size, size, 3), dtype=np.float32)
    variables = jax.jit(model.init)(jax.random.key(7), jnp.asarray(x))
    # randomize the head so the comparison isn't trivially identity
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    params["residual_rgb"]["kernel"] = rng.normal(0, 0.05, params["residual_rgb"]["kernel"].shape).astype(np.float32)
    ours = np.asarray(jax.jit(model.apply)({"params": params}, jnp.asarray(x)))

    kmodel = _keras_adaptive_sr(scale, depth, base, head_ch, size)
    _load_flax_params_into_keras(kmodel, params)
    theirs = kmodel(x, training=False).numpy()

    assert not np.allclose(theirs, np.clip(x, 0, 1))  # non-trivial output
    np.testing.assert_allclose(ours, theirs, atol=5e-4)


def test_adaptive_seg_forward_matches_keras_oracle():
    """BatchNorm flavor: inference-mode parity (moving stats at init)."""
    from tensorflow.keras import Input, Model
    from tensorflow.keras import layers as L

    size, base, depth = 32, 8, 2
    model = build_adaptive_depth_unet(input_size=size, base_channels=base, depth=depth)
    rng = np.random.default_rng(1)
    x = rng.random((2, size, size, 3), dtype=np.float32)
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(jax.random.key(3), jnp.asarray(x))
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    ours = np.asarray(
        jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, jnp.asarray(x))
    )

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
    kmodel = Model(inputs, out)

    # keras BN epsilon default is 1e-3 like ours; copy weights incl. moving stats
    stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])
    for layer in kmodel.layers:
        name = layer.name
        if name.endswith(("_conv0", "_conv1")) or name == "lesion_mask":
            block, _, suffix = name.rpartition("_")
            if name == "lesion_mask":
                layer.set_weights([params["lesion_mask"]["kernel"], params["lesion_mask"]["bias"]])
            else:
                tree = params[block][f"conv{suffix[-1]}"]
                layer.set_weights([tree["kernel"], tree["bias"]])
        elif "_norm" in name:
            block, _, norm = name.rpartition("_")
            p = params[block][norm]
            s = stats[block][norm]
            layer.set_weights([p["scale"], p["bias"], s["mean"], s["var"]])

    theirs = kmodel(x, training=False).numpy()
    np.testing.assert_allclose(ours, theirs, atol=5e-4)


def test_vanilla_seg_forward_matches_keras_oracle():
    """LayerNorm blocks + Conv2DTranspose(2x2, stride 2) decoder — transpose
    conv layout/semantics are the risk area this test pins."""
    from tensorflow.keras import Input, Model
    from tensorflow.keras import layers as L

    from adunet.models import VanillaSegUNet

    size, base, depth = 32, 8, 2
    model = VanillaSegUNet(num_classes=1, base_channels=base, depth=depth)
    rng = np.random.default_rng(4)
    x = rng.random((2, size, size, 3), dtype=np.float32)
    variables = jax.jit(model.init)(jax.random.key(9), jnp.asarray(x))
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    ours = np.asarray(jax.jit(model.apply)(variables, jnp.asarray(x)))

    def conv_block(t, nf, name):
        t = L.Conv2D(nf, 3, padding="same", name=f"{name}_conv0")(t)
        t = L.LayerNormalization(axis=-1, name=f"{name}_norm0")(t)
        t = L.Activation("relu")(t)
        t = L.Conv2D(nf, 3, padding="same", name=f"{name}_conv1")(t)
        t = L.LayerNormalization(axis=-1, name=f"{name}_norm1")(t)
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
        t = L.Conv2DTranspose(nf, 2, strides=2, padding="same", name=f"dec{level}_up")(t)
        t = L.Concatenate()([t, skip])
        t = conv_block(t, nf, f"dec{level}")
    out = L.Conv2D(1, 1, activation="sigmoid", name="mask_logits")(t)
    kmodel = Model(inputs, out)

    for layer in kmodel.layers:
        name = layer.name
        if name.endswith("_up"):
            tree = params[name]
            # flax ConvTranspose kernel: (kh, kw, in, out); Keras Conv2DTranspose
            # expects (kh, kw, out, in) and correlates with a flipped kernel
            k = np.asarray(tree["kernel"])
            k_keras = np.transpose(k[::-1, ::-1], (0, 1, 3, 2))
            layer.set_weights([k_keras, np.asarray(tree["bias"])])
        elif name.endswith(("_conv0", "_conv1")):
            block, _, suffix = name.rpartition("_")
            tree = params[block][f"conv{suffix[-1]}"]
            layer.set_weights([tree["kernel"], tree["bias"]])
        elif "_norm" in name:
            block, _, norm = name.rpartition("_")
            p = params[block][norm]
            layer.set_weights([p["scale"], p["bias"]])
        elif name == "mask_logits":
            layer.set_weights([params["mask_logits"]["kernel"], params["mask_logits"]["bias"]])

    theirs = kmodel(x, training=False).numpy()
    np.testing.assert_allclose(ours, theirs, atol=5e-4)


def test_vgg19_tower_matches_keras_applications():
    """Our Flax VGG19 feature tower (through block4_conv4, caffe preprocessing)
    equals keras.applications.VGG19 with the same (random) weights."""
    from adunet.losses import VGG19Features

    module = VGG19Features()
    rng = np.random.default_rng(6)
    x = rng.random((1, 64, 64, 3), dtype=np.float32)
    variables = jax.jit(module.init)(jax.random.key(2), jnp.asarray(x))
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    ours = np.asarray(jax.jit(module.apply)(variables, jnp.asarray(x)))

    vgg = tf.keras.applications.VGG19(include_top=False, weights=None, input_shape=(64, 64, 3))
    for name, tree in params.items():
        vgg.get_layer(name).set_weights([tree["kernel"], tree["bias"]])
    feat = tf.keras.Model(vgg.input, vgg.get_layer("block4_conv4").output)
    pre = tf.keras.applications.vgg19.preprocess_input(x * 255.0)
    theirs = feat(pre, training=False).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-4)


def test_adaptive_sr_training_dynamics_match_keras_oracle():
    """Training parity: same data, same init, same Adam -> same loss curve.

    Upgrades forward parity to *training* parity: gradients through every op
    (conv, LayerNorm, fractional resize, clipped residual) and the Adam
    update (Keras defaults b1=0.9 b2=0.999 eps=1e-7) are pinned by running
    N optimisation steps in both frameworks from identical weights on an
    identical batch sequence and asserting the per-step training losses and
    the final weights agree. This is the strongest quality-parity evidence
    obtainable without DIV2K (reference train loop:
    Super_resolution/code/train_adaptive_unet.py:380-722).
    """
    import optax

    from adunet.losses import charbonnier_loss
    from adunet.train import create_train_state, make_sr_train_step
    from adunet.train.state import TrainState  # noqa: F401 (docs)

    scale, depth, base, head_ch, size = 0.5, 2, 8, 8, 32
    batch, n_steps, lr_rate = 4, 30, 1e-3

    model, _ = build_super_resolution_unet(
        scale=scale, depth_override=depth, input_size=size,
        base_channels=base, residual_head_channels=head_ch,
    )

    # fixed batch sequence; LR precomputed on host so both frameworks see
    # bit-identical inputs (degradation parity is covered elsewhere)
    rng = np.random.default_rng(42)
    hr_seq = rng.random((n_steps, batch, size, size, 3), dtype=np.float32)
    from adunet.ops import degrade

    lr_seq = np.asarray(jax.jit(jax.vmap(lambda h: degrade(h, 0.5, size)))(jnp.asarray(hr_seq)))

    sample = jnp.zeros((1, size, size, 3), jnp.float32)
    tx = optax.adam(lr_rate, b1=0.9, b2=0.999, eps=1e-7)
    state = create_train_state(model, jax.random.key(5), sample, tx)
    # randomise the head so training is non-trivial from step 0
    params0 = jax.tree_util.tree_map(np.asarray, state.params)
    params0["residual_rgb"]["kernel"] = rng.normal(
        0, 0.05, params0["residual_rgb"]["kernel"].shape
    ).astype(np.float32)
    state = state.replace(params=jax.tree_util.tree_map(jnp.asarray, params0))

    step = make_sr_train_step(model, charbonnier_loss, donate=False)
    ours_losses = []
    for i in range(n_steps):
        state, metrics = step(state, (jnp.asarray(lr_seq[i]), jnp.asarray(hr_seq[i])))
        ours_losses.append(float(metrics["loss"]))

    # --- Keras oracle ---
    kmodel = _keras_adaptive_sr(scale, depth, base, head_ch, size)
    _load_flax_params_into_keras(kmodel, params0)

    def charbonnier_tf(y_true, y_pred):
        return tf.reduce_mean(tf.sqrt(tf.square(y_true - y_pred) + 1e-6))

    kmodel.compile(
        optimizer=tf.keras.optimizers.Adam(learning_rate=lr_rate),
        loss=charbonnier_tf,
    )
    keras_losses = []
    for i in range(n_steps):
        # train_on_batch reports a *running mean* loss metric; reset so each
        # call returns the per-batch loss like our step does
        kmodel.reset_metrics()
        out = kmodel.train_on_batch(lr_seq[i], hr_seq[i])
        keras_losses.append(float(out[0] if isinstance(out, (list, tuple)) else out))

    ours_losses = np.asarray(ours_losses)
    keras_losses = np.asarray(keras_losses)
    # loss trajectories: float32 drift compounds over steps, but the curves
    # must stay locked (identical math) rather than merely both-decreasing
    np.testing.assert_allclose(ours_losses, keras_losses, rtol=5e-3, atol=5e-4)
    # both actually trained (random data: expect a real but modest drop)
    assert ours_losses[-1] < ours_losses[0] * 0.98
    assert keras_losses[-1] < keras_losses[0] * 0.98

    # Per-element weight equality is NOT a stable criterion: on weights with
    # near-zero gradient, Adam's first-step update is lr*sign(g), so 1-ulp
    # gradient noise flips the sign and costs +/-lr immediately (measured:
    # max |dw| ~7e-4 after ONE step, concentrated in dont-care weights).
    # The meaningful end-state criterion is functional: the two trained
    # models must produce the same predictions/loss on held-out data.
    holdout_hr = rng.random((batch, size, size, 3), dtype=np.float32)
    holdout_lr = np.asarray(jax.jit(lambda h: degrade(h, 0.5, size))(jnp.asarray(holdout_hr)))
    ours_pred = np.asarray(
        jax.jit(model.apply)({"params": state.params}, jnp.asarray(holdout_lr))
    )
    keras_pred = kmodel(holdout_lr, training=False).numpy()
    np.testing.assert_allclose(ours_pred, keras_pred, atol=2e-2)
    ours_holdout = float(charbonnier_loss(jnp.asarray(holdout_hr), jnp.asarray(ours_pred)))
    keras_holdout = float(charbonnier_tf(holdout_hr, keras_pred))
    assert abs(ours_holdout - keras_holdout) < 2e-3, (ours_holdout, keras_holdout)


def test_seg_training_dynamics_match_keras_oracle():
    """Seg (BatchNorm) training parity: protocol-A hybrid loss, same init,
    same Adam — per-step losses and the functionally-trained models match.
    Additionally pins BatchNorm training-mode statistics and the moving-
    average update (Keras momentum 0.99) because the final comparison runs
    in inference mode through the updated moving stats.
    Reference: Segmenation/code/train_adaptive_unet.py:258-332,463-575.
    """
    from tensorflow.keras import Input, Model
    from tensorflow.keras import layers as L

    import optax

    from adunet.losses import make_hybrid_ce_dice_loss
    from adunet.train import create_train_state
    from adunet.train.seg import make_seg_train_step

    size, base, depth = 32, 8, 2
    batch, n_steps, lr_rate = 4, 10, 1e-3

    model = build_adaptive_depth_unet(input_size=size, base_channels=base, depth=depth)
    rng = np.random.default_rng(11)
    img_seq = rng.random((n_steps, batch, size, size, 3), dtype=np.float32)
    mask_seq = (rng.random((n_steps, batch, size, size, 1)) > 0.5).astype(np.float32)

    import jax
    import optax as _optax  # noqa: F401

    tx = optax.adam(lr_rate, b1=0.9, b2=0.999, eps=1e-7)
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
        jax.random.key(3), jnp.zeros((1, size, size, 3))
    )
    state = create_train_state(model, jax.random.key(3), jnp.zeros((1, size, size, 3)), tx)
    params0 = jax.tree_util.tree_map(np.asarray, state.params)
    stats0 = jax.tree_util.tree_map(np.asarray, state.batch_stats)

    loss_fn = make_hybrid_ce_dice_loss(0.4, 0.6)
    step = make_seg_train_step(model, loss_fn, augment="none", donate=False)
    ours_losses = []
    rng_key = jax.random.key(0)
    for i in range(n_steps):
        state, metrics = step(state, (jnp.asarray(img_seq[i]), jnp.asarray(mask_seq[i])), rng_key)
        ours_losses.append(float(metrics["loss"]))

    # --- Keras oracle (same topology as the forward-parity test) ---
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
    kmodel = Model(inputs, out)

    for layer in kmodel.layers:
        name = layer.name
        if name.endswith(("_conv0", "_conv1")):
            block, _, suffix = name.rpartition("_")
            tree = params0[block][f"conv{suffix[-1]}"]
            layer.set_weights([tree["kernel"], tree["bias"]])
        elif name == "lesion_mask":
            layer.set_weights([params0["lesion_mask"]["kernel"], params0["lesion_mask"]["bias"]])
        elif "_norm" in name:
            block, _, norm = name.rpartition("_")
            p = params0[block][norm]
            s = stats0[block][norm]
            layer.set_weights([p["scale"], p["bias"], s["mean"], s["var"]])

    def hybrid_tf(y_true, y_pred):
        y_true = tf.cast(y_true, tf.float32)
        p = tf.clip_by_value(tf.cast(y_pred, tf.float32), 1e-7, 1 - 1e-7)
        bce = -tf.reduce_mean(y_true * tf.math.log(p) + (1 - y_true) * tf.math.log(1 - p))
        inter = tf.reduce_sum(y_true * p, axis=[1, 2, 3])
        union = tf.reduce_sum(y_true + p, axis=[1, 2, 3])
        dice = tf.reduce_mean((2 * inter + 1e-6) / (union + 1e-6))
        return 0.4 * bce + 0.6 * (1 - dice)

    kmodel.compile(optimizer=tf.keras.optimizers.Adam(learning_rate=lr_rate), loss=hybrid_tf)
    keras_losses = []
    for i in range(n_steps):
        kmodel.reset_metrics()
        out_k = kmodel.train_on_batch(img_seq[i], mask_seq[i])
        keras_losses.append(float(out_k[0] if isinstance(out_k, (list, tuple)) else out_k))

    np.testing.assert_allclose(np.asarray(ours_losses), np.asarray(keras_losses),
                               rtol=5e-3, atol=5e-4)

    # functional end-state parity in inference mode (exercises moving stats)
    holdout = rng.random((batch, size, size, 3), dtype=np.float32)
    ours_pred = np.asarray(jax.jit(
        lambda v, x: model.apply(v, x, train=False)
    )({"params": state.params, "batch_stats": state.batch_stats}, jnp.asarray(holdout)))
    keras_pred = kmodel(holdout, training=False).numpy()
    np.testing.assert_allclose(ours_pred, keras_pred, atol=2e-2)


def test_vanilla_sr_forward_matches_keras_oracle():
    """Vanilla SR baseline (u-net-vinillia.py:128-168): BatchNorm blocks,
    max-pool encoder, bilinear UpSampling2D + smooth-conv + concat decoder,
    sigmoid RGB head — inference-mode parity with our weights loaded."""
    from tensorflow.keras import Input, Model
    from tensorflow.keras import layers as L

    from adunet.models import VanillaSRUNet

    size, base, depth = 32, 8, 2
    model = VanillaSRUNet(base_channels=base, depth=depth)
    rng = np.random.default_rng(8)
    x = rng.random((2, size, size, 3), dtype=np.float32)
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
        jax.random.key(5), jnp.asarray(x)
    )
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])
    ours = np.asarray(
        jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, jnp.asarray(x))
    )

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
        t = L.Conv2D(nf, 3, padding="same", activation="relu", name=f"dec{level}_smooth")(t)
        t = L.Concatenate()([t, skip])
        t = conv_block(t, nf, f"dec{level}")
    out = L.Conv2D(3, 1, activation="sigmoid", name="enhanced_rgb")(t)
    kmodel = Model(inputs, out)

    for layer in kmodel.layers:
        name = layer.name
        if name.endswith("_smooth") or name == "enhanced_rgb":
            tree = params[name]
            layer.set_weights([tree["kernel"], tree["bias"]])
        elif name.endswith(("_conv0", "_conv1")):
            block, _, suffix = name.rpartition("_")
            tree = params[block][f"conv{suffix[-1]}"]
            layer.set_weights([tree["kernel"], tree["bias"]])
        elif "_norm" in name:
            block, _, norm = name.rpartition("_")
            p = params[block][norm]
            s = stats[block][norm]
            layer.set_weights([p["scale"], p["bias"], s["mean"], s["var"]])

    theirs = kmodel(x, training=False).numpy()
    np.testing.assert_allclose(ours, theirs, atol=5e-4)


def test_joint_model_forward_matches_keras_oracle():
    """Joint SR+seg shared encoder: the Keras twin pins the composition —
    one encoder/bottleneck feeding two decoders with per-task weights,
    residual-clip SR head and sigmoid mask head."""
    from tensorflow.keras import Input, Model
    from tensorflow.keras import layers as L

    from adunet.models import build_joint_unet

    scale, depth, base, size = 0.5, 2, 8, 32
    model, _ = build_joint_unet(
        scale=scale, base_channels=base, residual_head_channels=base,
        num_classes=1, depth_override=depth, input_size=size,
    )
    rng = np.random.default_rng(12)
    x = rng.random((2, size, size, 3), dtype=np.float32)
    variables = jax.jit(model.init)(jax.random.key(4), jnp.asarray(x))
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    # randomise the SR head so its branch isn't trivially identity
    params["residual_rgb"]["kernel"] = rng.normal(
        0, 0.05, params["residual_rgb"]["kernel"].shape
    ).astype(np.float32)
    ours_sr, ours_seg = jax.jit(model.apply)({"params": params}, jnp.asarray(x))

    def conv_block(t, nf, name):
        t = L.Conv2D(nf, 3, padding="same", name=f"{name}_conv0")(t)
        t = L.LayerNormalization(axis=-1, name=f"{name}_norm0")(t)
        t = L.Activation("relu")(t)
        t = L.Conv2D(nf, 3, padding="same", name=f"{name}_conv1")(t)
        t = L.LayerNormalization(axis=-1, name=f"{name}_norm1")(t)
        return L.Activation("relu")(t)

    def resize_by_scale(t):
        h = tf.shape(t)[1]
        w = tf.shape(t)[2]
        nh = tf.maximum(tf.cast(tf.math.ceil(tf.cast(h, tf.float32) * scale), tf.int32), 1)
        nw = tf.maximum(tf.cast(tf.math.ceil(tf.cast(w, tf.float32) * scale), tf.int32), 1)
        return tf.image.resize(t, [nh, nw], method="bilinear", antialias=True)

    inputs = Input(shape=(size, size, 3))
    t = inputs
    skips = []
    nf = base
    for level in range(depth):
        skip = conv_block(t, nf, f"enc{level}")
        t = L.Lambda(resize_by_scale)(skip)
        skips.append(skip)
        nf *= 2
    bottleneck = conv_block(t, nf, "bottleneck")

    def decoder(tag):
        d = bottleneck
        dn = nf
        for level, skip in reversed(list(enumerate(skips))):
            dn //= 2
            target = skip.shape[1]
            d = L.Lambda(lambda u, s=target: tf.image.resize(u, [s, s], method="bilinear", antialias=True))(d)
            d = L.Conv2D(dn, 3, padding="same", activation="relu", name=f"{tag}_dec{level}_smooth")(d)
            d = L.Concatenate()([d, skip])
            d = conv_block(d, dn, f"{tag}_dec{level}")
        return d

    sr = conv_block(decoder("sr"), base, "sr_head")
    residual = L.Conv2D(3, 1, padding="same", kernel_initializer="zeros",
                        bias_initializer="zeros", name="residual_rgb")(sr)
    sr_out = L.Lambda(lambda u: tf.clip_by_value(u[0] + u[1], 0.0, 1.0))([inputs, residual])
    seg_out = L.Conv2D(1, 1, activation="sigmoid", name="mask_logits")(decoder("seg"))
    kmodel = Model(inputs, [sr_out, seg_out])

    _load_flax_params_into_keras(kmodel, params)
    # heads not covered by the block loader
    kmodel.get_layer("mask_logits").set_weights(
        [params["mask_logits"]["kernel"], params["mask_logits"]["bias"]]
    )

    theirs_sr, theirs_seg = (o.numpy() for o in kmodel(x, training=False))
    np.testing.assert_allclose(np.asarray(ours_sr), theirs_sr, atol=5e-4)
    np.testing.assert_allclose(np.asarray(ours_seg), theirs_seg, atol=5e-4)

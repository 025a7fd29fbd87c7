"""Multiclass segmentation + joint SR+seg (BASELINE configs 4-5).

Multiclass surface: softmax head + class-weighted CE + mIoU
(reference anchor: Segmenation/code/unet_vinillia.py:89-119).
Joint surface: shared-encoder SR+seg model trained data-parallel.
"""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------- metrics


def test_mean_iou_closed_form():
    from adunet.metrics import mean_iou

    # 1x2x2 one-hot labels over 3 classes
    t = np.array([[[0, 1], [2, 2]]])
    p = np.array([[[0, 0], [2, 1]]])
    t1 = np.eye(3, dtype=np.float32)[t]
    p1 = np.eye(3, dtype=np.float32)[p]
    # class 0: inter 1, union 2 -> 0.5 ; class 1: inter 0, union 2 -> 0
    # class 2: inter 1, union 2 -> 0.5 ; mean = 1/3
    got = float(mean_iou(jnp.asarray(t1), jnp.asarray(p1), num_classes=3))
    assert got == pytest.approx(1.0 / 3.0, abs=1e-6)


def test_mean_iou_ignores_absent_classes():
    from adunet.metrics import mean_iou

    t = np.array([[[0, 0], [1, 1]]])
    p = np.array([[[0, 0], [1, 1]]])
    t1 = np.eye(4, dtype=np.float32)[t]
    p1 = np.eye(4, dtype=np.float32)[p]
    # classes 2,3 absent from both -> excluded; present classes perfect
    got = float(mean_iou(jnp.asarray(t1), jnp.asarray(p1), num_classes=4))
    assert got == pytest.approx(1.0, abs=1e-6)


def test_mean_iou_matches_keras_oracle():
    tf = pytest.importorskip("tensorflow")
    from adunet.metrics import mean_iou

    rng = np.random.default_rng(0)
    n_classes = 5
    t = rng.integers(0, n_classes, size=(2, 16, 16))
    logits = rng.normal(size=(2, 16, 16, n_classes)).astype(np.float32)
    p_soft = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)

    ours = float(mean_iou(
        jnp.asarray(np.eye(n_classes, dtype=np.float32)[t]),
        jnp.asarray(p_soft),
        num_classes=n_classes,
    ))
    m = tf.keras.metrics.MeanIoU(num_classes=n_classes)
    m.update_state(t, np.argmax(p_soft, -1))
    theirs = float(m.result())
    assert ours == pytest.approx(theirs, abs=1e-5)


def test_weighted_ce_closed_form_and_keras_parity():
    from adunet.losses import categorical_crossentropy, make_weighted_ce_loss

    rng = np.random.default_rng(1)
    t = rng.integers(0, 3, size=(2, 4, 4))
    y = np.eye(3, dtype=np.float32)[t]
    logits = rng.normal(size=(2, 4, 4, 3)).astype(np.float32)
    p = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)

    # uniform weights == plain categorical CE
    uniform = make_weighted_ce_loss([1.0, 1.0, 1.0])
    np.testing.assert_allclose(
        float(uniform(jnp.asarray(y), jnp.asarray(p))),
        float(categorical_crossentropy(jnp.asarray(y), jnp.asarray(p))),
        rtol=1e-6,
    )

    # closed form: each pixel's CE scaled by its true-class weight
    w = np.array([0.5, 2.0, 1.0], np.float32)
    weighted = make_weighted_ce_loss(w)
    expect = np.mean(w[t] * -np.log(np.clip(p, 1e-7, 1 - 1e-7))[np.arange(2)[:, None, None],
                                                                np.arange(4)[None, :, None],
                                                                np.arange(4)[None, None, :], t])
    got = float(weighted(jnp.asarray(y), jnp.asarray(p)))
    assert got == pytest.approx(float(expect), rel=1e-5)

    tf = pytest.importorskip("tensorflow")
    keras_ce = tf.keras.losses.CategoricalCrossentropy()
    np.testing.assert_allclose(
        float(categorical_crossentropy(jnp.asarray(y), jnp.asarray(p))),
        float(keras_ce(y.reshape(-1, 3), p.reshape(-1, 3))),
        rtol=1e-5,
    )


def test_load_label_mask_one_hot(tmp_path):
    from adunet.data.io import load_label_mask

    labels = np.array([[0, 1], [2, 5]], dtype=np.int64)
    np.save(tmp_path / "m.npy", labels)
    onehot = load_label_mask(tmp_path / "m.npy", 2, num_classes=3)
    assert onehot.shape == (2, 2, 3)
    # id 5 clamps into the last class
    np.testing.assert_array_equal(onehot.argmax(-1), [[0, 1], [2, 2]])
    assert onehot.sum() == 4.0


# ---------------------------------------------------------------- e2e


@pytest.fixture(scope="module")
def tiny_multiclass(tmp_path_factory):
    root = tmp_path_factory.mktemp("multiclass_tiny")
    (root / "train_img").mkdir(); (root / "train_mask").mkdir()
    (root / "val_img").mkdir(); (root / "val_mask").mkdir()
    rng = np.random.default_rng(5)
    for split, n in (("train", 8), ("val", 8)):
        for i in range(n):
            img = rng.random((32, 32, 3), dtype=np.float32)
            mask = np.zeros((32, 32), np.int64)
            mask[8:24, 8:24] = 1
            mask[12:20, 12:20] = 2
            np.save(root / f"{split}_img" / f"city_{split}{i:04d}.npy", img)
            np.save(root / f"{split}_mask" / f"city_{split}{i:04d}_mask.npy", mask)
    return root


def test_train_seg_vanilla_multiclass_cli(tiny_multiclass, tmp_path):
    from adunet.cli.train_seg_vanilla import main as vanilla_main

    vanilla_main([
        "--train_image_dir", str(tiny_multiclass / "train_img"),
        "--train_mask_dir", str(tiny_multiclass / "train_mask"),
        "--val_image_dir", str(tiny_multiclass / "val_img"),
        "--val_mask_dir", str(tiny_multiclass / "val_mask"),
        "--image_suffix", ".npy",
        "--mask_suffix", "_mask.npy",
        "--image_size", "32",
        "--batch_size", "8",
        "--epochs", "2",
        "--base_channels", "8",
        "--depth", "2",
        "--num_classes", "3",
        "--class_weights", "0.5,1.0,2.0",
        "--augment",  # BASELINE config 4: on-device augmentation, one-hot masks flip too
        "--model_dir", str(tmp_path / "models"),
        "--log_dir", str(tmp_path / "logs"),
        "--run_name", "mc",
        "--seed", "3",
    ])
    run_dirs = list((tmp_path / "logs").glob("mc_*"))
    assert run_dirs
    payload = json.loads((run_dirs[0] / "config.json").read_text())
    assert payload["num_classes"] == 3
    assert payload["monitor"] == "val_mean_iou"
    assert payload["best_val_metric"] is not None
    assert 0.0 <= payload["best_val_metric"] <= 1.0
    header = (run_dirs[0] / "epoch_metrics.csv").read_text().splitlines()[0]
    assert "val_mean_iou" in header


def test_joint_model_outputs_and_identity_start():
    from adunet.models import build_joint_unet

    model, info = build_joint_unet(
        scale=0.5, base_channels=8, residual_head_channels=8,
        num_classes=1, depth_override=2, input_size=32,
    )
    assert info["depth"] == 2
    rng = np.random.default_rng(2)
    x = rng.random((2, 32, 32, 3), dtype=np.float32)
    variables = jax.jit(model.init)(jax.random.key(0), jnp.asarray(x))
    sr, seg = jax.jit(model.apply)(variables, jnp.asarray(x))
    # zero-init residual head -> SR output == clipped input at step 0
    np.testing.assert_allclose(np.asarray(sr), np.clip(x, 0, 1), atol=1e-6)
    assert seg.shape == (2, 32, 32, 1)
    assert float(jnp.min(seg)) >= 0.0 and float(jnp.max(seg)) <= 1.0


def test_train_joint_cli_e2e(tiny_multiclass, tmp_path):
    """Shared-encoder SR+seg trained data-parallel on the 8-device mesh
    (BASELINE config 5)."""
    from adunet.cli.train_joint import main as joint_main

    joint_main([
        "--train_image_dir", str(tiny_multiclass / "train_img"),
        "--train_mask_dir", str(tiny_multiclass / "train_mask"),
        "--val_image_dir", str(tiny_multiclass / "val_img"),
        "--val_mask_dir", str(tiny_multiclass / "val_mask"),
        "--image_suffix", ".npy",
        "--mask_suffix", "_mask.npy",
        "--image_size", "32",
        "--scale", "0.5",
        "--depth_override", "2",
        "--base_channels", "8",
        "--residual_head_channels", "8",
        "--batch_size", "8",
        "--epochs", "2",
        "--model_dir", str(tmp_path / "models"),
        "--log_dir", str(tmp_path / "logs"),
        "--run_name", "joint",
        "--seed", "4",
    ])
    run_dirs = list((tmp_path / "logs").glob("joint_*"))
    assert run_dirs
    result = json.loads((run_dirs[0] / "result.json").read_text())
    assert result["epochs_ran"] == 2
    final = result["final_metrics"]
    for key in ("sr_loss", "seg_loss", "psnr", "dice", "val_loss"):
        assert key in final and np.isfinite(final[key]), (key, final)
    assert (tmp_path / "models" / "joint_best").exists()

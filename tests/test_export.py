"""AOT export / serving artifact tests (adunet/export).

The exported StableHLO program must reproduce the live model bit-for-bit,
round-trip through bytes on disk, and be consumable by cli/restore.py
without any model rebuild — the deployment surface the reference lacks
(its .keras checkpoints need the training repo's custom-object registry,
evaluate_model.py:57-91).
"""

import json
from pathlib import Path

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_state():
    import jax
    import jax.numpy as jnp

    from adunet.models import build_super_resolution_unet
    from adunet.train import create_train_state, make_optimizer

    model, info = build_super_resolution_unet(
        scale=0.5, depth_override=1, input_size=32, base_channels=8,
        residual_head_channels=8,
    )
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((1, 32, 32, 3)), make_optimizer(1e-4)
    )
    return state, model, info


def test_export_matches_live_model(tiny_state):
    import jax.numpy as jnp

    from adunet.export import export_sr_forward

    state, model, _ = tiny_state
    exported = export_sr_forward(state, patch_size=32, batch_size=2, platforms=("cpu",))

    x = jnp.asarray(np.random.default_rng(1).random((2, 32, 32, 3), dtype=np.float32))
    got = np.asarray(exported.call(x))
    want = np.clip(np.asarray(model.apply({"params": state.params}, x)), 0.0, 1.0)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_artifact_roundtrip_and_manifest(tiny_state, tmp_path):
    import jax.numpy as jnp

    from adunet.export import ARTIFACT_FILE, MANIFEST_FILE, export_sr_forward, load_artifact, save_artifact

    state, model, info = tiny_state
    exported = export_sr_forward(state, patch_size=32, batch_size=2, platforms=("cpu",))
    out = save_artifact(exported, tmp_path / "artifact", meta={"scale": 0.5, "depth": info["depth"]})

    assert (out / ARTIFACT_FILE).exists()
    manifest = json.loads((out / MANIFEST_FILE).read_text())
    assert manifest["input_shape"] == [2, 32, 32, 3]
    assert manifest["platforms"] == ["cpu"]
    assert manifest["depth"] == info["depth"]

    call, loaded_manifest = load_artifact(out)
    assert loaded_manifest["scale"] == 0.5
    x = jnp.asarray(np.random.default_rng(2).random((2, 32, 32, 3), dtype=np.float32))
    got = np.asarray(call(x))
    want = np.clip(np.asarray(model.apply({"params": state.params}, x)), 0.0, 1.0)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_cross_platform_export_lowers_for_tpu(tiny_state):
    """The default artifact targets both tpu and cpu; lowering for the TPU
    platform must succeed from a CPU host, and the artifact must still
    execute on the local (cpu) backend via the platform-index branch."""
    import jax.numpy as jnp

    from adunet.export import export_sr_forward

    state, model, _ = tiny_state
    exported = export_sr_forward(state, patch_size=32, batch_size=1)
    assert set(exported.platforms) == {"tpu", "cpu"}
    x = jnp.asarray(np.random.default_rng(3).random((1, 32, 32, 3), dtype=np.float32))
    got = np.asarray(exported.call(x))
    want = np.clip(np.asarray(model.apply({"params": state.params}, x)), 0.0, 1.0)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_int8_weight_only_quantized_export(tmp_path, perturb_params):
    """--quantize int8 bakes conv kernels as int8 + per-channel scales: the
    artifact must shrink substantially and stay close to the f32 program.
    Uses a ~600K-param model so weight bytes dominate the HLO overhead."""
    import jax
    import jax.numpy as jnp

    from adunet.export import export_sr_forward, load_artifact, save_artifact
    from adunet.export.aot import quantize_params_int8
    from adunet.models import build_super_resolution_unet
    from adunet.train import create_train_state, make_optimizer

    model, _info = build_super_resolution_unet(
        scale=0.5, depth_override=2, input_size=32, base_channels=32,
        residual_head_channels=32,
    )
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((1, 32, 32, 3)), make_optimizer(1e-4)
    )
    # the SR model is identity-start (zero-init residual head), under which
    # int8 weight error cancels EXACTLY (output = clip(input) regardless of
    # upstream kernels) — perturb every leaf so the drift bounds below
    # measure a non-trivial network, as a trained checkpoint would
    state = state.replace(params=perturb_params(state.params))

    # quantization structure: 4-D kernels -> {q:int8, scale:f32[C]}, rest f32
    qtree = quantize_params_int8(state.params)
    kernels = [l for l in jax.tree_util.tree_leaves(state.params) if l.ndim == 4]
    qdicts = []
    def walk(t):
        if isinstance(t, dict) and set(t) == {"q", "scale"}:
            qdicts.append(t)
            return
        if isinstance(t, dict):
            for v in t.values():
                walk(v)
    walk(qtree)
    assert len(qdicts) == len(kernels) and kernels
    assert all(d["q"].dtype == np.int8 for d in qdicts)

    full = export_sr_forward(state, patch_size=32, batch_size=2, platforms=("cpu",))
    quant = export_sr_forward(state, patch_size=32, batch_size=2, platforms=("cpu",),
                              quantize="int8")
    full_dir = save_artifact(full, tmp_path / "full")
    quant_dir = save_artifact(quant, tmp_path / "int8", meta={"quantization": "int8-weight-only"})
    full_bytes = (full_dir / "model.stablehlo").stat().st_size
    quant_bytes = ((quant_dir / "model.stablehlo").stat().st_size
                   + (quant_dir / "weights.npz").stat().st_size)
    assert quant_bytes < 0.55 * full_bytes, (quant_bytes, full_bytes)

    call, manifest = load_artifact(quant_dir)
    assert manifest["quantization"] == "int8-weight-only"
    x = jnp.asarray(np.random.default_rng(5).random((2, 32, 32, 3), dtype=np.float32))
    got = np.asarray(call(x))
    want = np.clip(np.asarray(model.apply({"params": state.params}, x)), 0.0, 1.0)
    # weight-only int8 with per-channel scales: small but NONZERO error —
    # zero drift would mean the quantized path isn't actually exercised
    # (exactly what the pre-perturbation identity-start model produced)
    drift = np.abs(got - want)
    assert 0.0 < drift.max() < 0.05, drift.max()
    assert drift.mean() < 0.005, drift.mean()


def test_seg_export_bakes_batch_stats(tmp_path):
    """Seg export must freeze params AND BatchNorm running statistics; the
    artifact output must match the live eval-mode forward bit-for-bit."""
    import jax
    import jax.numpy as jnp

    from adunet.export import export_seg_forward, load_artifact, save_artifact
    from adunet.models import build_adaptive_depth_unet
    from adunet.train import create_train_state, make_optimizer, make_seg_train_step
    from adunet.losses import make_hybrid_ce_dice_loss

    model = build_adaptive_depth_unet(32, base_channels=8, depth=2)
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((1, 32, 32, 3)), make_optimizer(1e-3)
    )
    # run a train step so batch_stats move off their init values — the export
    # must capture the UPDATED statistics
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((4, 32, 32, 3), dtype=np.float32))
    masks = jnp.asarray((rng.random((4, 32, 32, 1)) > 0.5).astype(np.float32))
    step = make_seg_train_step(model, make_hybrid_ce_dice_loss(0.4, 0.6),
                               augment=False, donate=False)
    state, _ = step(state, (images, masks), jax.random.key(1))

    exported = export_seg_forward(state, image_size=32, batch_size=4, platforms=("cpu",))
    out = save_artifact(exported, tmp_path / "seg_artifact", meta={"model": "seg"})
    call, _ = load_artifact(out)

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    want = np.asarray(model.apply(variables, images, train=False), np.float32)
    got = np.asarray(call(images))
    np.testing.assert_allclose(got, want, atol=1e-6)
    assert got.shape == (4, 32, 32, 1)
    assert (got >= 0).all() and (got <= 1).all()  # sigmoid head


def test_export_cli_seg_workload(tmp_path):
    """train_seg -> export_model --workload seg -> artifact runs."""
    import jax.numpy as jnp

    from adunet.cli.train_seg import main as seg_main
    from adunet.cli.export_model import main as export_main
    from adunet.export import load_artifact

    root = tmp_path
    (root / "ti").mkdir(); (root / "tm").mkdir()
    (root / "vi").mkdir(); (root / "vm").mkdir()
    rng = np.random.default_rng(1)
    for split, n in (("t", 8), ("v", 4)):
        for i in range(n):
            img = rng.random((32, 32, 3), dtype=np.float32)
            mask = np.zeros((32, 32), np.float32)
            mask[8:24, 8:24] = 1.0
            np.save(root / f"{split}i" / f"isic_{i:04d}.npy", img)
            np.save(root / f"{split}m" / f"isic_{i:04d}_segmentation.npy", mask)

    seg_main([
        "--protocol", "A", "--epochs", "1", "--batch_size", "8",
        "--base_channels", "8", "--depth", "2", "--image_size", "32",
        "--train_images", str(root / "ti"), "--train_masks", str(root / "tm"),
        "--val_images", str(root / "vi"), "--val_masks", str(root / "vm"),
        "--model_dir", str(root / "models"), "--log_dir", str(root / "logs"),
        "--run_name", "seg_export_e2e",
    ])
    export_main([
        "--workload", "seg",
        "--model-path", str(root / "models" / "seg_export_e2e"),
        "--output-dir", str(root / "serving"),
        "--batch-size", "2",
        "--platforms", "cpu",
    ])
    manifest = json.loads((root / "serving" / "manifest.json").read_text())
    assert manifest["model"] == "adaptive_seg_unet"
    assert manifest["input_shape"] == [2, 32, 32, 3]

    call, _ = load_artifact(root / "serving")
    probe = jnp.asarray(np.random.default_rng(2).random((2, 32, 32, 3), dtype=np.float32))
    mask = np.asarray(call(probe))
    assert mask.shape == (2, 32, 32, 1)
    assert np.isfinite(mask).all()

    # --patch-size overrides the training image_size (convs are size-agnostic)
    export_main([
        "--workload", "seg",
        "--model-path", str(root / "models" / "seg_export_e2e"),
        "--output-dir", str(root / "serving64"),
        "--batch-size", "1", "--patch-size", "64",
        "--platforms", "cpu",
    ])
    call64, manifest64 = load_artifact(root / "serving64")
    assert manifest64["input_shape"] == [1, 64, 64, 3]
    out64 = np.asarray(call64(jnp.zeros((1, 64, 64, 3), jnp.float32)))
    assert out64.shape == (1, 64, 64, 1) and np.isfinite(out64).all()


def test_export_cli_joint_workload(tmp_path):
    """train_joint -> export_model --workload joint -> artifact runs."""
    import jax.numpy as jnp

    from adunet.cli.train_joint import main as joint_main
    from adunet.cli.export_model import main as export_main
    from adunet.export import load_artifact

    root = tmp_path
    for d in ("ti", "tm"):
        (root / d).mkdir()
    rng = np.random.default_rng(7)
    for i in range(8):
        np.save(root / "ti" / f"im_{i:03d}.npy", rng.random((32, 32, 3), dtype=np.float32))
        m = np.zeros((32, 32), np.float32)
        m[4:20, 6:22] = 1.0
        np.save(root / "tm" / f"im_{i:03d}_mask.npy", m)

    joint_main([
        "--train_image_dir", str(root / "ti"), "--train_mask_dir", str(root / "tm"),
        "--image_suffix", ".npy", "--mask_suffix", "_mask.npy",
        "--image_size", "32", "--scale", "0.5", "--depth_override", "1",
        "--base_channels", "8", "--residual_head_channels", "8",
        "--batch_size", "8", "--epochs", "1",
        "--model_dir", str(root / "models"), "--log_dir", str(root / "logs"),
        "--run_name", "jexp", "--seed", "4",
    ])
    export_main([
        "--workload", "joint",
        "--model-path", str(root / "models" / "jexp_best"),
        "--output-dir", str(root / "serving"),
        "--batch-size", "2",
        "--platforms", "cpu",
    ])
    manifest = json.loads((root / "serving" / "manifest.json").read_text())
    assert manifest["model"] == "joint_sr_seg_unet"

    call, _ = load_artifact(root / "serving")
    out = call(jnp.zeros((2, 32, 32, 3), jnp.float32))
    assert set(out.keys()) == {"sr", "mask"}
    assert np.asarray(out["sr"]).shape == (2, 32, 32, 3)
    assert np.asarray(out["mask"]).shape == (2, 32, 32, 1)


def test_joint_export_two_heads(tmp_path):
    """One artifact, both heads: the shared encoder runs once and the program
    returns {"sr", "mask"} matching the live model."""
    import jax
    import jax.numpy as jnp

    from adunet.export import export_joint_forward, load_artifact, save_artifact
    from adunet.models import build_joint_unet
    from adunet.train import create_train_state, make_optimizer

    model, info = build_joint_unet(
        scale=0.5, depth_override=2, input_size=32, base_channels=8,
        residual_head_channels=8,
    )
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((1, 32, 32, 3)), make_optimizer(1e-4)
    )
    exported = export_joint_forward(state, image_size=32, batch_size=2, platforms=("cpu",))
    out = save_artifact(exported, tmp_path / "joint_artifact",
                        meta={"model": "joint_sr_seg_unet", "depth": info["depth"]})
    call, manifest = load_artifact(out)
    assert manifest["model"] == "joint_sr_seg_unet"

    x = jnp.asarray(np.random.default_rng(0).random((2, 32, 32, 3), dtype=np.float32))
    got = call(x)
    sr_want, mask_want = model.apply({"params": state.params}, x, train=False)
    np.testing.assert_allclose(
        np.asarray(got["sr"]), np.clip(np.asarray(sr_want, np.float32), 0, 1), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(got["mask"]), np.asarray(mask_want, np.float32), atol=1e-6
    )


@pytest.fixture(scope="module")
def trained_ckpt(tmp_path_factory):
    """A real (tiny) train_sr run so export consumes a production checkpoint."""
    root = tmp_path_factory.mktemp("export_e2e")
    data = root / "hr"
    data.mkdir()
    rng = np.random.default_rng(0)
    for i in range(4):
        coarse = rng.random((12, 12, 3), dtype=np.float32)
        img = np.clip(np.repeat(np.repeat(coarse, 4, 0), 4, 1), 0, 1)
        np.save(data / f"img{i}.npy", img.astype(np.float32))

    from adunet.cli.train_sr import main as train_main

    model_dir = root / "models"
    train_main([
        "--scale", "0.5", "--depth_override", "1",
        "--base_channels", "8", "--residual_head_channels", "8",
        "--patch_size", "32", "--patches_per_image", "2",
        "--batch_size", "8", "--epochs", "1", "--patience", "5",
        "--high_res_dir", str(data), "--image_suffix", ".npy",
        "--model_dir", str(model_dir), "--log_dir", str(root / "logs"),
        "--run_name", "export_e2e", "--seed", "3",
    ])
    (ckpt,) = model_dir.glob("unet_adaptive_scale0.50_depth1")
    return root, data, ckpt


def test_export_cli_and_restore_from_export(trained_ckpt, tmp_path):
    from adunet.cli.export_model import main as export_main
    from adunet.cli.restore import main as restore_main

    root, data, ckpt = trained_ckpt
    artifact = tmp_path / "serving"
    export_main([
        "--model-path", str(ckpt),
        "--scale", "0.5",
        "--output-dir", str(artifact),
        "--patch-size", "32",
        "--batch-size", "2",
        "--platforms", "cpu",
    ])
    manifest = json.loads((artifact / "manifest.json").read_text())
    assert manifest["model"] == "adaptive_sr_unet"
    assert manifest["param_count"] > 0

    out_dir = tmp_path / "restored"
    restore_main([
        "--from-export", str(artifact),
        "--scale", "0.5",
        "--input-dir", str(data),
        "--output-dir", str(out_dir),
        "--image-suffix", ".npy",
        "--overlap", "8",
        "--limit", "2",
    ])
    outputs = list(out_dir.iterdir())
    assert len(outputs) == 2
    for f in outputs:
        arr = (np.load(f) if f.suffix == ".npy"
               else np.asarray(__import__("cv2").imread(str(f))) / 255.0)
        assert arr.shape[:2] == (48, 48)
        assert np.isfinite(arr).all()

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

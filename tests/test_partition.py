"""Channel (tensor) parallelism: dp x model mesh correctness.

The wide levels' conv kernels shard on their output-channel dim over the
'model' axis; GSPMD propagates and inserts the collectives. Training under
the 2-D mesh must be numerically identical to plain DP.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adunet.parallel import (
    channel_partition_spec,
    make_dp_model_mesh,
    make_mesh,
    replicate,
    shard_batch,
    shard_state,
)

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs the 8-device test mesh"
)


def test_channel_partition_spec_rules():
    from jax.sharding import PartitionSpec as P

    assert channel_partition_spec((3, 3, 128, 256), 2) == P(None, None, None, "model")
    assert channel_partition_spec((3, 3, 64, 64), 2) == P()      # too narrow
    assert channel_partition_spec((3, 3, 128, 255), 2, 128) == P()  # not divisible
    assert channel_partition_spec((256,), 2) == P("model")
    assert channel_partition_spec((64,), 2) == P()
    assert channel_partition_spec((), 2) == P()


def _train_losses(mesh, state_placer, n_steps=3):
    from adunet.losses import charbonnier_loss
    from adunet.models import build_super_resolution_unet
    from adunet.train import create_train_state, make_optimizer, make_sr_train_step

    model, _ = build_super_resolution_unet(
        scale=0.5, depth_override=3, input_size=64, base_channels=32,
        residual_head_channels=32,
    )
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((1, 64, 64, 3)), make_optimizer(1e-3)
    )
    state = state_placer(state, mesh)
    step = make_sr_train_step(model, charbonnier_loss, donate=False)
    rng = np.random.default_rng(0)
    losses = []
    for i in range(n_steps):
        hr = rng.random((8, 64, 64, 3)).astype(np.float32)
        batch = shard_batch(hr, mesh)
        state, metrics = step(state, batch, None)
        losses.append(float(metrics["loss"]))
    return losses, state


def test_dp_model_training_matches_dp():
    losses_dp, _ = _train_losses(make_mesh(8), replicate)

    mesh_tp = make_dp_model_mesh(2, 8)
    placer = lambda s, m: shard_state(s, m, min_channels=128)
    losses_tp, state_tp = _train_losses(mesh_tp, placer)

    np.testing.assert_allclose(losses_dp, losses_tp, rtol=1e-5)

    # the wide kernels really are channel-sharded over 'model'
    wide = state_tp.params["bottleneck"]["conv0"]["kernel"]  # (3,3,128,256)
    spec = wide.sharding.spec
    assert tuple(spec) == (None, None, None, "model"), spec
    narrow = state_tp.params["enc0"]["conv0"]["kernel"]  # (3,3,3,32)
    assert all(s is None for s in tuple(narrow.sharding.spec)) or tuple(narrow.sharding.spec) == ()


def test_sharded_state_checkpoint_roundtrip(tmp_path):
    """Orbax save/restore of a channel-sharded TrainState: values survive and
    re-placement onto the dp x model mesh restores the sharding."""
    from adunet.train import CheckpointManager

    mesh = make_dp_model_mesh(2, 8)
    _, state = _train_losses(mesh, lambda s, m: shard_state(s, m, min_channels=128), n_steps=1)

    mngr = CheckpointManager(tmp_path / "ckpt", monitor="val_loss", mode="min")
    mngr.save(1, state, metrics={"val_loss": 0.5})

    # restore into a fresh (differently-initialised) state, then re-shard
    from adunet.losses import charbonnier_loss  # noqa: F401 (parity with helper)
    from adunet.models import build_super_resolution_unet
    from adunet.train import create_train_state, make_optimizer

    model, _ = build_super_resolution_unet(
        scale=0.5, depth_override=3, input_size=64, base_channels=32,
        residual_head_channels=32,
    )
    fresh = create_train_state(
        model, jax.random.key(99), jnp.zeros((1, 64, 64, 3)), make_optimizer(1e-3)
    )
    restored = mngr.restore_latest(fresh)
    mngr.close()
    assert restored is not None
    np.testing.assert_allclose(
        np.asarray(restored.params["bottleneck"]["conv0"]["kernel"]),
        np.asarray(state.params["bottleneck"]["conv0"]["kernel"]),
        atol=0,
    )
    replaced = shard_state(restored, mesh, min_channels=128)
    spec = replaced.params["bottleneck"]["conv0"]["kernel"].sharding.spec
    assert tuple(spec) == (None, None, None, "model")

"""True multi-process distributed training test.

Launches TWO separate Python processes, each owning 2 virtual CPU devices,
joined through jax.distributed (the real coordination service on localhost).
Each process runs the production path — maybe_initialize_distributed ->
make_mesh over the 4 global devices -> replicate params ->
shard_batch(process-local batch) -> one SR train step — and the resulting
loss must equal a single-process 4-device run on the same global batch.

This exercises the multi-host contract the dryrun cannot: per-process batch
assembly (jax.make_array_from_process_local_data), cross-process collectives
through the distributed runtime, and replication from per-process values.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

_WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

from adunet.parallel import make_mesh, maybe_initialize_distributed, replicate, shard_batch

assert maybe_initialize_distributed(), "distributed init did not engage"
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()

import jax.numpy as jnp
from adunet.losses import charbonnier_loss
from adunet.models import build_super_resolution_unet
from adunet.train import create_train_state, make_optimizer, make_sr_train_step

pid = jax.process_index()
mesh = make_mesh(4)

# the data layer must give each process DISJOINT training data...
from adunet.parallel.distributed import process_seed, process_shard
mine = process_shard(list(range(10)))
expected = list(range(10))[pid::2]
assert mine == expected, (pid, mine)
# ...with EQUAL shard lengths when the count does not divide (steps_per_epoch
# derived from the local shard must match across processes, or the per-step
# collectives deadlock at the epoch boundary)
assert len(process_shard(list(range(5)))) == 3
assert process_shard(list(range(5))) == ([0, 2, 4] if pid == 0 else [1, 3, 0])
assert process_shard([7]) == [7]  # fewer items than processes: recycle, never empty
assert process_seed(0) == pid * 1_000_003

model, _ = build_super_resolution_unet(
    scale=0.5, depth_override=1, input_size=16, base_channels=8,
    residual_head_channels=8,
)
state = create_train_state(
    model, jax.random.key(0), jnp.zeros((1, 16, 16, 3)), make_optimizer(1e-3)
)
state = replicate(state, mesh)

rng = np.random.default_rng(0)
global_batch = rng.random((8, 16, 16, 3)).astype(np.float32)
local = global_batch[pid * 4 : (pid + 1) * 4]  # this process's shard

step = make_sr_train_step(model, charbonnier_loss, donate=False)
state, metrics = step(state, shard_batch(local, mesh), None)
print(f"WORKER_LOSS {float(np.asarray(metrics['loss'])):.8f}", flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_distributed_training_matches_single_process(tmp_path):
    port = _free_port()
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)

    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
            JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            PYTHONPATH=str(Path(__file__).resolve().parents[1]),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, str(worker)],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            )
        )
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)
    losses = [
        float(line.split()[1])
        for out in outs
        for line in out.splitlines()
        if line.startswith("WORKER_LOSS")
    ]
    assert len(losses) == 2
    assert losses[0] == losses[1]  # both processes observe the same global loss

    # single-process 4-device run on the same global batch gives the same loss
    import jax
    import jax.numpy as jnp

    from adunet.losses import charbonnier_loss
    from adunet.models import build_super_resolution_unet
    from adunet.parallel import make_mesh, replicate, shard_batch
    from adunet.train import create_train_state, make_optimizer, make_sr_train_step

    mesh = make_mesh(4)
    model, _ = build_super_resolution_unet(
        scale=0.5, depth_override=1, input_size=16, base_channels=8,
        residual_head_channels=8,
    )
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((1, 16, 16, 3)), make_optimizer(1e-3)
    )
    state = replicate(state, mesh)
    rng = np.random.default_rng(0)
    global_batch = rng.random((8, 16, 16, 3)).astype(np.float32)
    step = make_sr_train_step(model, charbonnier_loss, donate=False)
    _, metrics = step(state, shard_batch(global_batch, mesh), None)
    single = float(np.asarray(metrics["loss"]))
    assert losses[0] == pytest.approx(single, rel=1e-6)


_CLI_WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

from adunet.parallel import maybe_initialize_distributed

assert maybe_initialize_distributed(), "distributed init did not engage"
assert jax.process_count() == 2

from adunet.cli.train_sr import main as train_main

data_dir = sys.argv[1]
out_dir = sys.argv[2]
train_main([
    "--scale", "0.5", "--depth_override", "1",
    "--base_channels", "8", "--residual_head_channels", "8",
    "--patch_size", "32", "--patches_per_image", "4",
    "--batch_size", "8", "--epochs", "2", "--patience", "9",
    "--eval_shave", "2",  # SSIM's 11px window must fit the shaved patch
    "--high_res_dir", data_dir, "--image_suffix", ".npy",
    "--model_dir", out_dir + "/models", "--log_dir", out_dir + "/logs",
    "--run_name", "mh", "--seed", "5",
    "--device_cache",
])
print("CLI_WORKER_DONE", flush=True)
"""


def test_two_process_train_sr_cli_end_to_end(tmp_path):
    """The PRODUCTION train_sr CLI (device-cache feed, Orbax checkpointing,
    process-0-gated run artifacts) across two real jax.distributed processes.
    Catches the integration bugs unit steps cannot: divergent step counts,
    non-replicated device caches, artifact write races, distributed Orbax
    saves."""
    data = tmp_path / "hr"
    data.mkdir()
    rng = np.random.default_rng(0)
    for i in range(8):
        np.save(data / f"im{i}.npy", rng.random((32, 32, 3), dtype=np.float32))
    out = tmp_path / "out"
    worker = tmp_path / "cli_worker.py"
    worker.write_text(_CLI_WORKER)

    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
            JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            PYTHONPATH=str(Path(__file__).resolve().parents[1]),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, str(worker), str(data), str(out)],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            )
        )
    outs = []
    for p in procs:
        stdout, stderr = p.communicate(timeout=600)
        assert p.returncode == 0, f"worker failed:\n{stdout}\n{stderr}"
        assert "CLI_WORKER_DONE" in stdout
        outs.append(stdout)

    # both processes executed identical global steps: the printed metric
    # fields (collective means) must match exactly; wall-clock timing
    # fields naturally differ per process
    def epoch_lines(text):
        return [l[l.index("loss:"):] for l in text.splitlines()
                if l.startswith("Epoch ") and "loss:" in l]

    assert epoch_lines(outs[0]) == epoch_lines(outs[1])
    assert len(epoch_lines(outs[0])) == 2

    # process-0-only run artifacts, written exactly once
    run_dir = out / "logs" / "mh"
    assert (run_dir / "config.json").exists()
    assert (run_dir / "model_summary.txt").exists()
    rows = (run_dir / "epoch_metrics.csv").read_text().strip().splitlines()
    assert len(rows) == 3  # header + 2 epochs (no duplicate writers)

    # the distributed Orbax save completed and restores on a single process
    import json

    cfg = json.loads((run_dir / "config.json").read_text())
    assert cfg["n_devices"] == 4  # global mesh spanned both processes
    ckpts = list((out / "models").glob("unet_adaptive_scale0.50_depth1"))
    assert ckpts


_GENERIC_WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

from adunet.parallel import make_mesh, maybe_initialize_distributed, replicate, shard_batch

assert maybe_initialize_distributed(), "distributed init did not engage"
NPROC = int(os.environ["JAX_NUM_PROCESSES"])
assert jax.process_count() == NPROC, jax.process_count()

import jax.numpy as jnp
from adunet.losses import charbonnier_loss
from adunet.models import build_super_resolution_unet
from adunet.train import create_train_state, make_optimizer, make_sr_train_step

pid = jax.process_index()
mesh = make_mesh(jax.device_count())

model, _ = build_super_resolution_unet(
    scale=0.5, depth_override=1, input_size=16, base_channels=8,
    residual_head_channels=8,
)
state = create_train_state(
    model, jax.random.key(0), jnp.zeros((1, 16, 16, 3)), make_optimizer(1e-3)
)
state = replicate(state, mesh)

rng = np.random.default_rng(0)
global_batch = rng.random((8, 16, 16, 3)).astype(np.float32)
per = 8 // NPROC
local = global_batch[pid * per : (pid + 1) * per]

step = make_sr_train_step(model, charbonnier_loss, donate=False)
state, metrics = step(state, shard_batch(local, mesh), None)
print(f"WORKER_LOSS {float(np.asarray(metrics['loss'])):.8f}", flush=True)
"""


def test_four_process_distributed_training_matches_single_process(tmp_path):
    """Same contract at N=4 with ONE device per process (the 2-process test
    runs 2x2) — catches anything accidentally specialized to two workers or
    to multi-device processes: 4-way coordination-service join, collectives
    spanning 4 process boundaries, per-process global-array assembly from a
    quarter batch."""
    port = _free_port()
    worker = tmp_path / "worker4.py"
    worker.write_text(_GENERIC_WORKER)

    procs = []
    for pid in range(4):
        env = dict(os.environ)
        env.update(
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=1",
            JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
            JAX_NUM_PROCESSES="4",
            JAX_PROCESS_ID=str(pid),
            PYTHONPATH=str(Path(__file__).resolve().parents[1]),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, str(worker)],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            )
        )
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)
    losses = [
        float(line.split()[1])
        for out in outs
        for line in out.splitlines()
        if line.startswith("WORKER_LOSS")
    ]
    assert len(losses) == 4
    assert len(set(losses)) == 1  # every process observes the same global loss

    # single-process run over the same global batch on a 4-device mesh
    import jax
    import jax.numpy as jnp

    from adunet.losses import charbonnier_loss
    from adunet.models import build_super_resolution_unet
    from adunet.parallel import make_mesh, replicate, shard_batch
    from adunet.train import create_train_state, make_optimizer, make_sr_train_step

    mesh = make_mesh(4)
    model, _ = build_super_resolution_unet(
        scale=0.5, depth_override=1, input_size=16, base_channels=8,
        residual_head_channels=8,
    )
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((1, 16, 16, 3)), make_optimizer(1e-3)
    )
    state = replicate(state, mesh)
    rng = np.random.default_rng(0)
    global_batch = rng.random((8, 16, 16, 3)).astype(np.float32)
    step = make_sr_train_step(model, charbonnier_loss, donate=False)
    _, metrics = step(state, shard_batch(global_batch, mesh), None)
    np.testing.assert_allclose(losses[0], float(np.asarray(metrics["loss"])), rtol=1e-6)

"""Device mesh + sharding helpers for data-parallel training.

The reference has no multi-device story at all (SURVEY.md §2: every job is a
single-GPU SLURM submission; NCCL present but never exercised). Here
data-parallelism is first-class and TPU-native: a 1-D ``jax.sharding.Mesh``
over the slice, batches sharded on the ``data`` axis, params replicated.
Under ``jax.jit`` XLA inserts the gradient all-reduce as an ICI collective —
no NCCL/MPI-style code, and the same program runs on 1 chip or a v5e-8.

Scales beyond DP are available through the same entry point: ``make_mesh``
accepts extra named axes (e.g. ``("data", "model")`` shapes) for future
spatial/model sharding of the 138M-param deep variants.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "make_dp_spatial_mesh",
    "auto_data_parallel_size",
    "replicated_sharding",
    "batch_sharding",
    "shard_batch",
    "pad_and_shard_ragged",
    "replicate",
]


def auto_data_parallel_size(
    batch_size: int,
    n_available: Optional[int] = None,
    micro_factor: int = 1,
) -> int:
    """Largest data-axis extent that evenly splits the (micro-)batch.

    Policy for batch < mesh (single-process): the reference's own sweep
    tables go down to batch 1-2 at scales 0.7/0.8
    (run_experiment_adaptive_depth.sh:47-55), which cannot shard over an
    8-chip data axis. Rather than refuse, trainers cap the data axis at the
    largest divisor of the micro-batch that fits the available devices —
    batch 4 on 8 chips trains 4-way data-parallel, batch 1 single-chip.
    ``micro_factor`` is the gradient-accumulation factor: with accumulation
    the unit that must split evenly is the micro-batch
    ``batch_size / micro_factor``.
    """
    if batch_size < 1:
        raise ValueError(f"batch_size must be >= 1, got {batch_size}.")
    micro_factor = max(1, micro_factor)
    if batch_size % micro_factor != 0:
        raise ValueError(
            f"batch_size={batch_size} must be divisible by grad_accum={micro_factor}."
        )
    if n_available is None:
        n_available = jax.device_count()
    micro = batch_size // micro_factor
    for d in range(min(micro, n_available), 0, -1):
        if micro % d == 0:
            return d
    return 1


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("data",),
    mesh_shape: Optional[Tuple[int, ...]] = None,
) -> Mesh:
    """Build a mesh over the first ``n_devices`` devices (default: all)."""
    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"Requested {n_devices} devices but only {len(devices)} available."
            )
        devices = devices[:n_devices]
    if mesh_shape is None:
        mesh_shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    dev_array = np.asarray(devices).reshape(mesh_shape)
    return Mesh(dev_array, axis_names=tuple(axis_names))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Batch-dim sharding; with a 'space' mesh axis the image height dim is
    sharded too (GSPMD inserts conv halo exchanges automatically — verified
    exact vs single-device)."""
    if "space" in mesh.axis_names:
        return NamedSharding(mesh, P(axis, "space"))
    return NamedSharding(mesh, P(axis))


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Device-put a host batch sharded along its leading dimension (and the
    height dimension when the mesh has a 'space' axis).

    Multi-host: each process passes its LOCAL portion of the batch and the
    global array is assembled across processes
    (jax.make_array_from_process_local_data); single-host passes the whole
    batch as before.
    """
    sharding = batch_sharding(mesh, axis)

    def put(x):
        if jax.process_count() > 1:
            return jax.make_array_from_process_local_data(sharding, np.asarray(x))
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)


def pad_and_shard_ragged(batch, mesh: Mesh, axis: str = "data"):
    """Shard a possibly-ragged batch over the mesh's data axis with padding.

    Validation/eval batches come from grid tiling and can have any leading
    size; replicating them (the round-2 behavior) made every chip do the full
    batch — 1/N of the available work each. Instead: pad the leading dim up
    to the next multiple of the data-axis extent by repeating the final row,
    shard on ``axis``, and return a mask so the jitted metric reduction can
    ignore the padded rows.

    Returns ``(sharded_batch, sharded_mask, n_valid)`` where ``mask`` is a
    float32 ``(padded,)`` vector with 1.0 on real rows. Single-process only
    (multi-host callers keep the replicated path — every process holds the
    full val set, and splitting it across processes is a separate contract).
    """
    if jax.process_count() > 1:
        raise ValueError(
            "pad_and_shard_ragged is a single-process fast path; use "
            "replicate() for multi-host validation batches."
        )
    n_shards = mesh.shape[axis]
    leaves = jax.tree_util.tree_leaves(batch)
    n_valid = leaves[0].shape[0]
    padded = -(-n_valid // n_shards) * n_shards

    from adunet.utils.misc import pad_leading_to

    sharding = batch_sharding(mesh, axis)
    out = jax.tree_util.tree_map(
        lambda x: jax.device_put(pad_leading_to(x, padded), sharding), batch
    )
    mask = np.zeros((padded,), np.float32)
    mask[:n_valid] = 1.0
    mask = jax.device_put(mask, NamedSharding(mesh, P(axis)))
    return out, mask, n_valid


def make_dp_axis_mesh(axis_name: str, shards: int, n_devices: Optional[int] = None) -> Mesh:
    """2-D mesh ('data', axis_name): data parallel x a second sharding axis."""
    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):  # same loud guard as make_mesh — a
            # silent truncation would run at a fraction of the requested
            # parallelism with no error
            raise ValueError(
                f"Requested {n_devices} devices but only {len(devices)} available."
            )
        devices = devices[:n_devices]
    total = len(devices)
    if total % shards != 0:
        raise ValueError(f"{total} devices not divisible by {axis_name} shards={shards}.")
    return make_mesh(total, axis_names=("data", axis_name),
                     mesh_shape=(total // shards, shards))


def make_dp_spatial_mesh(spatial_shards: int, n_devices: Optional[int] = None) -> Mesh:
    """2-D mesh ('data', 'space'): data parallel x spatial (height) sharding.

    Spatial sharding divides per-device activation memory for the 256px
    deep models (the reference's scale-0.7/0.8 depth-5 configs) — the
    image-domain analogue of sequence parallelism.
    """
    return make_dp_axis_mesh("space", spatial_shards, n_devices)


def replicate(tree, mesh: Mesh):
    """Device-put a pytree fully replicated across the mesh.

    Multi-host: every process passes the same full value (replication means
    each process's local data IS the global data)."""
    sharding = replicated_sharding(mesh)

    def put(x):
        if jax.process_count() > 1:
            return jax.make_array_from_process_local_data(sharding, np.asarray(x))
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, tree)

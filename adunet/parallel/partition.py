"""Channel (tensor) parallelism for the wide U-Net levels.

The deep reference configs explode to 138M params with 1024/2048-channel
levels (scale 0.7/0.8 -> depth 5; SURVEY.md §6 param table). Data parallelism
replicates all of that per chip; this module adds the TPU-native second axis:
a ('data', 'model') mesh where wide conv kernels are sharded on their
*output-channel* dim and everything else stays replicated. Under jit, GSPMD
propagates the annotation through the network and inserts the ICI
collectives — there is no hand-written collective code, matching how the DP
axis works in adunet.parallel.mesh.

Sharding rule (shape-driven, model-agnostic):
- conv kernels (kh, kw, ci, co) with co >= min_channels and co % model_size
  == 0 -> PartitionSpec(None, None, None, 'model')
- their 1-D companions (bias / norm scale / norm bias of the same width)
  -> PartitionSpec('model')
- everything else -> replicated

The same rules apply to the optimizer state (Adam's mu/nu mirror the param
tree), so optimizer memory shards too.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from adunet.parallel.mesh import make_dp_axis_mesh

__all__ = ["make_dp_model_mesh", "channel_partition_spec", "shard_params", "shard_state"]


def make_dp_model_mesh(model_shards: int, n_devices: Optional[int] = None) -> Mesh:
    """2-D mesh ('data', 'model'): data parallel x output-channel sharding."""
    return make_dp_axis_mesh("model", model_shards, n_devices)


def channel_partition_spec(shape, model_size: int, min_channels: int = 256) -> P:
    """Shape-driven spec: shard wide channel dims on 'model', else replicate."""
    if len(shape) == 4 and shape[-1] >= min_channels and shape[-1] % model_size == 0:
        return P(None, None, None, "model")
    if len(shape) == 1 and shape[0] >= min_channels and shape[0] % model_size == 0:
        return P("model")
    return P()


def shard_params(params, mesh: Mesh, min_channels: int = 256):
    """Device-put a param-like pytree with channel-sharded wide leaves."""
    if "model" not in mesh.axis_names:
        raise ValueError("mesh must carry a 'model' axis (make_dp_model_mesh).")
    model_size = int(mesh.shape["model"])

    def put(leaf):
        spec = channel_partition_spec(np.shape(leaf), model_size, min_channels)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, params)


def shard_state(state, mesh: Mesh, min_channels: int = 256):
    """Channel-shard a TrainState: params AND the mirrored optimizer moments.

    Adam's mu/nu trees have param-shaped leaves, so the same shape rule
    shards them; scalar counts and any batch statistics replicate.
    """
    return state.replace(
        params=shard_params(state.params, mesh, min_channels),
        opt_state=shard_params(state.opt_state, mesh, min_channels),
        batch_stats=(
            shard_params(state.batch_stats, mesh, min_channels)
            if state.batch_stats is not None
            else None
        ),
    )

"""Mesh construction and sharding rules."""

from adunet.parallel.distributed import maybe_initialize_distributed
from adunet.parallel.mesh import (
    make_mesh,
    make_dp_spatial_mesh,
    auto_data_parallel_size,
    replicated_sharding,
    batch_sharding,
    shard_batch,
    replicate,
)
from adunet.parallel.partition import (
    make_dp_model_mesh,
    channel_partition_spec,
    shard_params,
    shard_state,
)

__all__ = [
    "maybe_initialize_distributed",
    "make_mesh",
    "make_dp_spatial_mesh",
    "auto_data_parallel_size",
    "make_dp_model_mesh",
    "channel_partition_spec",
    "shard_params",
    "shard_state",
    "replicated_sharding",
    "batch_sharding",
    "shard_batch",
    "replicate",
]

"""Mesh construction and sharding rules."""

from adunet.parallel.distributed import maybe_initialize_distributed
from adunet.parallel.mesh import (
    make_mesh,
    make_dp_spatial_mesh,
    replicated_sharding,
    batch_sharding,
    shard_batch,
    replicate,
)

__all__ = [
    "maybe_initialize_distributed",
    "make_mesh",
    "make_dp_spatial_mesh",
    "replicated_sharding",
    "batch_sharding",
    "shard_batch",
    "replicate",
]

"""Multi-host initialisation.

The reference has no distributed story (SURVEY.md §2: NCCL shipped but never
exercised). Here multi-host runs initialise ``jax.distributed`` so a
multi-slice mesh spans hosts: collectives ride ICI within a slice and DCN
across slices, with no further code changes — the same ``make_mesh`` +
sharded-batch program.
"""

from __future__ import annotations

import os

import jax

__all__ = ["maybe_initialize_distributed"]


def maybe_initialize_distributed() -> bool:
    """Initialise jax.distributed when a coordinator is configured.

    Reads the standard env contract (JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES,
    JAX_PROCESS_ID — or their cloud-TPU equivalents that jax auto-detects).
    Returns True when distributed mode is active. Safe to call unconditionally:
    single-process runs are a no-op.
    """
    if jax.process_count() > 1:
        return True  # already initialised by the runtime
    coordinator = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not coordinator:
        return False
    num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    process_id = int(os.environ.get("JAX_PROCESS_ID", "0"))
    if num_processes <= 1:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True

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
    # IMPORTANT: do not touch jax.devices()/process_count() before deciding —
    # jax.distributed.initialize must run before any backend initialisation.
    coordinator = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
        process_id = int(os.environ.get("JAX_PROCESS_ID", "0"))
        if num_processes > 1:
            try:
                jax.distributed.initialize(
                    coordinator_address=coordinator,
                    num_processes=num_processes,
                    process_id=process_id,
                )
            except RuntimeError as exc:  # tolerate repeat calls
                if "already" not in str(exc).lower():
                    raise
            return True
    return jax.process_count() > 1  # e.g. auto-initialised by the TPU runtime

"""Multi-host initialisation.

The reference has no distributed story (SURVEY.md §2: NCCL shipped but never
exercised). Here multi-host runs initialise ``jax.distributed`` so a
multi-slice mesh spans hosts: collectives ride ICI within a slice and DCN
across slices, with no further code changes — the same ``make_mesh`` +
sharded-batch program.
"""

from __future__ import annotations

import math
import os

import jax

__all__ = ["maybe_initialize_distributed", "process_shard", "process_seed"]

_initialized = False


def process_shard(seq, *, seed=None):
    """This process's stride-slice of a global sequence (file/pair lists).

    Multi-host data parallelism requires each process to feed DIFFERENT
    samples — identical local batches would assemble into a global batch
    that duplicates every sample process_count times, silently wasting the
    extra hosts. Single-process: returns seq unchanged.

    Shards are always EQUAL LENGTH (``ceil(len/n)``, wrapping around the
    global sequence when it does not divide evenly): every jitted step
    contains GSPMD collectives all processes must join, so per-process step
    counts derived from shard sizes must match exactly or training deadlocks
    at the first epoch boundary only some processes reach.

    ``seed`` (pass the run's base seed, identical on all processes) applies
    one shared permutation of the global sequence before slicing, so the
    wrap-fill duplicates are a seeded-random subset instead of always
    ``seq[0], seq[1], ...`` — without it, the same leading samples would be
    deterministically oversampled for the entire run whenever ``len(seq)``
    does not divide by the process count (ADVICE r2).
    """
    n = jax.process_count()
    if n <= 1 or not len(seq):
        return seq
    if seed is not None and len(seq) % n:
        import numpy as np

        order = np.random.default_rng(int(seed)).permutation(len(seq))
        seq = [seq[int(i)] for i in order]
    pid = jax.process_index()
    per = math.ceil(len(seq) / n)
    return [seq[i % len(seq)] for i in range(pid, pid + n * per, n)]


def is_main_process() -> bool:
    """True on the process that should write host-side artifacts (run
    config/summary/CSV/TensorBoard). On shared filesystems every process
    sees the same run_dir, so non-main writers would race and clobber.
    Orbax checkpoint saves are NOT gated by this — all processes must
    participate in a distributed save."""
    return jax.process_index() == 0


def process_seed(seed: int) -> int:
    """Decorrelate per-process RNG streams (random patch sampling)."""
    return int(seed) + jax.process_index() * 1_000_003


def maybe_initialize_distributed() -> bool:
    """Initialise jax.distributed when a coordinator is configured.

    Reads the standard env contract (JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES,
    JAX_PROCESS_ID — or their cloud-TPU equivalents that jax auto-detects).
    Returns True when distributed mode is active. Safe to call unconditionally:
    single-process runs are a no-op.
    """
    global _initialized
    if _initialized:
        return True
    # IMPORTANT: do not touch jax.devices()/process_count() before deciding —
    # jax.distributed.initialize must run before any backend initialisation.
    coordinator = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
        process_id = int(os.environ.get("JAX_PROCESS_ID", "0"))
        if num_processes <= 1:
            # a coordinator address with a 1-process world is a misconfigured
            # launch (forgotten JAX_NUM_PROCESSES): silently proceeding would
            # run N independent full-dataset trainings that race on the same
            # run_dir with no error anywhere
            raise RuntimeError(
                f"JAX_COORDINATOR_ADDRESS={coordinator} is set but "
                f"JAX_NUM_PROCESSES={num_processes} — a distributed launch "
                "needs the full env contract (JAX_NUM_PROCESSES > 1 and "
                "JAX_PROCESS_ID per process); unset the coordinator address "
                "for a single-process run."
            )
        if num_processes > 1:
            try:
                jax.distributed.initialize(
                    coordinator_address=coordinator,
                    num_processes=num_processes,
                    process_id=process_id,
                )
            except RuntimeError as exc:
                # tolerate repeat calls; jax's message is
                # "distributed.initialize should only be called once."
                msg = str(exc).lower()
                if "already" not in msg and "only be called once" not in msg:
                    raise
            _initialized = True
            return True
    return jax.process_count() > 1  # e.g. auto-initialised by the TPU runtime

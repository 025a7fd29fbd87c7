"""Orbax checkpointing: best-metric retention + step-level resume.

Replaces the reference's three Keras mechanisms (SURVEY.md §5): ModelCheckpoint
(best on monitored metric), BackupAndRestore (crash resume), and whole-model
.keras files that needed custom-object registries to reload
(evaluate_model.py:57-91). Here checkpoints are pure pytrees
(params/opt_state/batch_stats/step) and the architecture is rebuilt from
config — no pickled graphs, no registry.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from adunet.train.state import TrainState

__all__ = ["CheckpointManager", "state_to_pytree", "pytree_into_state"]


def state_to_pytree(state: TrainState) -> Dict[str, Any]:
    tree = {
        "step": state.step,
        "params": state.params,
        "opt_state": state.opt_state,
    }
    if state.batch_stats is not None:
        tree["batch_stats"] = state.batch_stats
    return tree


def pytree_into_state(state: TrainState, tree: Dict[str, Any]) -> TrainState:
    return state.replace(
        step=int(np.asarray(tree["step"])),
        params=tree["params"],
        opt_state=tree["opt_state"],
        batch_stats=tree.get("batch_stats", state.batch_stats),
    )


class CheckpointManager:
    """Best + latest checkpoint retention with metric-driven selection."""

    def __init__(
        self,
        directory: str | Path,
        monitor: str = "val_loss",
        mode: str = "min",
        max_to_keep: int = 2,
        async_save: bool = False,
    ):
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self.monitor = monitor
        self.mode = mode
        sign = 1.0 if mode == "max" else -1.0
        # missing monitor -> -inf AFTER the sign flip (never selected as best)
        metric_of = lambda metrics: sign * metrics.get(monitor, -np.inf * sign)  # noqa: E731

        # retention must cover BOTH roles this manager serves: the best-metric
        # checkpoints (ModelCheckpoint parity) AND the most recent one
        # (BackupAndRestore crash-resume parity). A bare best_fn +
        # max_to_keep would apply Orbax's BestN policy alone, deleting the
        # latest checkpoint whenever it is not among the best — a crash
        # resume would then silently rewind to the best epoch.
        from orbax.checkpoint import checkpoint_managers as ocp_managers

        preservation = ocp_managers.AnyPreservationPolicy([
            ocp_managers.LatestN(1),
            ocp_managers.BestN(
                get_metric_fn=metric_of, reverse=False, n=max_to_keep,
            ),
        ])
        options = ocp.CheckpointManagerOptions(
            best_fn=metric_of,
            best_mode="max",
            preservation_policy=preservation,
            create=True,
        )
        self._mngr = ocp.CheckpointManager(self.directory, options=options)
        # async_save: overlap the disk write with the next epoch's compute.
        # Orbax's async path still snapshots device arrays to host inside
        # save() (so later donation/mutation of the live state is safe) and
        # serialises saves against each other; every restore/inspection
        # entry point below barriers first.
        self.async_save = async_save

    def save(
        self,
        step: int,
        state: TrainState,
        metrics: Optional[Dict[str, float]] = None,
        force: bool = False,
    ) -> None:
        """Persist a checkpoint at ``step``.

        ``force`` bypasses Orbax's should_save gate, which silently DROPS
        saves at steps <= latest_step — required for the post-fit best-epoch
        backfill, whose step precedes the final epoch's by construction.
        (force never overwrites an existing step; callers guard that.)"""
        # ±inf is a legitimate monitored value (val PSNR on identical shaved
        # patches is +inf — fit._improved deliberately treats it as a best).
        # Orbax metrics must be JSON-serialisable, so encode infinities as
        # ±float_max: ordering under best_fn is unchanged (an infinite PSNR
        # outranks every finite one) and on-disk best selection now agrees
        # with in-memory restore_best_weights (ADVICE r2). NaNs stay dropped.
        def _encode(v: float) -> float:
            v = float(v)
            if np.isposinf(v):
                return np.finfo(np.float64).max
            if np.isneginf(v):
                return -np.finfo(np.float64).max
            return v

        metrics = {
            k: _encode(v) for k, v in (metrics or {}).items() if not np.isnan(v)
        }
        self._mngr.save(
            step,
            args=ocp.args.StandardSave(state_to_pytree(state)),
            metrics=metrics,
            force=force,
        )
        if not self.async_save:
            self._mngr.wait_until_finished()

    def _restore(self, step: int, state: TrainState) -> TrainState:
        self._mngr.wait_until_finished()
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, state_to_pytree(state))
        tree = self._mngr.restore(step, args=ocp.args.StandardRestore(abstract))
        return pytree_into_state(state, tree)

    def _restore_weights(self, step: int, state: TrainState) -> TrainState:
        """Restore params (+ batch_stats) only — for inference/export consumers
        whose optimizer need not match the one that wrote the checkpoint."""
        self._mngr.wait_until_finished()
        tree = {"step": state.step, "params": state.params}
        if state.batch_stats is not None:
            tree["batch_stats"] = state.batch_stats
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, tree)
        restored = self._mngr.restore(
            step,
            args=ocp.args.PyTreeRestore(
                item=abstract,
                restore_args=ocp.checkpoint_utils.construct_restore_args(abstract),
                partial_restore=True,  # skip the opt_state subtree entirely
            ),
        )
        return state.replace(
            step=int(np.asarray(restored["step"])),
            params=restored["params"],
            batch_stats=restored.get("batch_stats", state.batch_stats),
        )

    def restore_latest_weights(self, state: TrainState) -> Optional[TrainState]:
        step = self.latest_step()
        return None if step is None else self._restore_weights(step, state)

    def restore_best_weights(self, state: TrainState) -> Optional[TrainState]:
        self._mngr.wait_until_finished()
        step = self._mngr.best_step()
        if step is None:
            step = self._mngr.latest_step()
        return None if step is None else self._restore_weights(step, state)

    def restore_latest(self, state: TrainState) -> Optional[TrainState]:
        step = self.latest_step()
        if step is None:
            return None
        return self._restore(step, state)

    def restore_best(self, state: TrainState) -> Optional[TrainState]:
        self._mngr.wait_until_finished()
        step = self._mngr.best_step()
        if step is None:
            step = self._mngr.latest_step()
        if step is None:
            return None
        return self._restore(step, state)

    def latest_step(self) -> Optional[int]:
        self._mngr.wait_until_finished()
        return self._mngr.latest_step()

    def write_config(self, config: Dict[str, Any]) -> None:
        (self.directory / "config.json").write_text(json.dumps(config, indent=2, default=str))

    def close(self) -> None:
        self._mngr.wait_until_finished()
        self._mngr.close()

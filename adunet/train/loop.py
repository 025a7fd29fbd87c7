"""Generic fit() loop: sharded batches, early stopping, checkpoints, logging.

Replaces Keras model.fit with the callback set the reference relies on
(train_adaptive_unet.py:615-632): EarlyStopping(restore_best_weights),
ModelCheckpoint(best on monitored metric), BackupAndRestore (resume from the
latest step checkpoint), TensorBoard scalars — plus first-class step-time /
throughput counters instead of the reference's post-hoc log scraping
(SURVEY.md §5 tracing). Per-epoch rows are written to ``epoch_metrics.csv``
in the exact schema of the reference's export_log_metrics.py output so the
analysis/plot tooling round-trips.
"""

from __future__ import annotations

import csv
import time
from dataclasses import dataclass, field
from functools import partial
from pathlib import Path
from typing import Any, Callable, Dict, Iterable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from adunet.parallel.mesh import (
    pad_and_shard_ragged,
    replicate as _replicate_tree,
    shard_batch,
)
from adunet.train.checkpoint import CheckpointManager
from adunet.train.state import TrainState

__all__ = ["fit", "FitResult", "EpochLog", "make_plateau_state", "plateau_update"]


@partial(jax.jit, donate_argnums=())
def _device_copy(tree):
    """Fresh device-side buffers for a pytree, shardings preserved.

    jnp.copy (not identity: jit(identity) hands back the same buffers, which
    the next donated train step would invalidate). One dispatch for the whole
    tree — per-leaf eager copies would pay one tunnel round-trip each on
    remote-TPU backends."""
    return jax.tree_util.tree_map(jnp.copy, tree)


@dataclass
class EpochLog:
    epoch: int
    steps: int
    duration_s: float
    ms_per_step: float
    metrics: Dict[str, float]
    val_metrics: Dict[str, float] = field(default_factory=dict)

    def row(self) -> Dict[str, Any]:
        row: Dict[str, Any] = {
            "epoch": self.epoch,
            "steps": self.steps,
            "duration_s": round(self.duration_s, 3),
            "ms_per_step": round(self.ms_per_step, 3),
        }
        row.update({k: v for k, v in self.metrics.items()})
        row.update({f"val_{k}": v for k, v in self.val_metrics.items()})
        return row


@dataclass
class FitResult:
    state: TrainState
    history: List[EpochLog]
    best_metric: Optional[float]
    best_epoch: Optional[int]
    stopped_early: bool


def _improved(current: float, best: Optional[float], mode: str) -> bool:
    # NaN best is replaceable by anything non-NaN; an INFINITE best is a
    # legitimate record (val PSNR hits +inf on identical shaved patches and
    # this codebase deliberately preserves it) — treating it as replaceable
    # would let every later WORSE epoch overwrite the best weights.
    if np.isnan(current):
        return False
    if best is None or np.isnan(best):
        return True
    return current < best if mode == "min" else current > best


def _scale_injected_lr(state: TrainState, factor: float, min_lr: float) -> TrainState:
    """Rescale the learning rate inside an inject_hyperparams opt state."""
    import jax.numpy as jnp

    opt_state = state.opt_state
    if not hasattr(opt_state, "hyperparams") or "learning_rate" not in opt_state.hyperparams:
        raise ValueError(
            "reduce_lr_on_plateau requires make_optimizer(..., inject_lr=True)."
        )
    lr = opt_state.hyperparams["learning_rate"]
    new_lr = jnp.maximum(lr * factor, min_lr)
    hyperparams = dict(opt_state.hyperparams)
    hyperparams["learning_rate"] = new_lr
    return state.replace(opt_state=opt_state._replace(hyperparams=hyperparams))


def make_plateau_state(spec: Dict[str, Any]) -> Dict[str, Any]:
    """Normalize a reduce_lr_on_plateau spec into mutable callback state.

    Semantics match keras.callbacks.ReduceLROnPlateau exactly (the vanilla
    seg reference relies on it, unet_vinillia.py:281): improvement means
    beating best by MORE than ``min_delta`` (Keras default 1e-4 — without it
    the sub-1e-4 improvements typical of a plateau keep resetting the wait
    counter and the reduction never fires), and ``cooldown`` epochs after a
    reduction freeze the wait counter while still tracking best.
    """
    return {
        "monitor": spec.get("monitor", "val_loss"),
        "mode": spec.get("mode", "min"),
        "factor": spec.get("factor", 0.5),
        "patience": spec.get("patience", 5),
        "min_lr": spec.get("min_lr", 1e-6),
        "min_delta": spec.get("min_delta", 1e-4),
        "cooldown": spec.get("cooldown", 0),
        "best": None,
        "wait": 0,
        "cooldown_counter": 0,
    }


def plateau_update(rlp: Dict[str, Any], current: float) -> bool:
    """One epoch of ReduceLROnPlateau state; True = reduce the LR now.

    Mirrors Keras's on_epoch_end order: cooldown decrements first (and holds
    wait at 0), best updates whenever the metric beats it by min_delta (even
    during cooldown), and the wait counter only advances outside cooldown.
    """
    if rlp["cooldown_counter"] > 0:
        rlp["cooldown_counter"] -= 1
        rlp["wait"] = 0
    in_cooldown = rlp["cooldown_counter"] > 0

    best = rlp["best"]
    if best is None or np.isnan(best):
        # Keras initialises best to the mode's worst value, so a +inf first
        # metric in 'min' mode is NOT an improvement (inf < inf is false)
        best = np.inf if rlp["mode"] == "min" else -np.inf
    if rlp["mode"] == "min":
        improved = current < best - rlp["min_delta"]
    else:
        improved = current > best + rlp["min_delta"]

    if improved:
        rlp["best"] = current
        rlp["wait"] = 0
        return False
    if in_cooldown:
        return False
    rlp["wait"] += 1
    if rlp["wait"] >= rlp["patience"]:
        rlp["wait"] = 0
        rlp["cooldown_counter"] = rlp["cooldown"]
        return True
    return False


def repeat(dataset):
    """Endlessly re-iterate a finite dataset — ``fit`` consumes an infinite
    train iterator, and a finite one would surface StopIteration from the
    transfer thread mid-epoch."""
    while True:
        yield from dataset


def fit(
    state: TrainState,
    train_iter: Iterable,
    train_step: Callable,
    steps_per_epoch: int,
    epochs: int,
    *,
    initial_epoch: int = 0,
    rng: Optional[jax.Array] = None,
    val_data: Optional[Iterable] = None,
    val_step: Optional[Callable] = None,
    monitor: str = "val_loss",
    monitor_mode: str = "min",
    patience: Optional[int] = None,
    restore_best_weights: bool = True,
    ckpt: Optional[CheckpointManager] = None,
    ckpt_every: int = 1,
    mesh=None,
    log_dir: Optional[str | Path] = None,
    samples_per_step: Optional[int] = None,
    reduce_lr_on_plateau: Optional[Dict[str, Any]] = None,
    profile_dir: Optional[str | Path] = None,
    verbose: int = 1,
    tb_writer=None,
    stop_on_nan: bool = True,
    val_per_sample: bool = False,
    pre_val_hook: Optional[Callable[[TrainState], TrainState]] = None,
    cache_val_on_device: bool = False,
    metric_finalizers: Optional[Dict[str, Callable]] = None,
) -> FitResult:
    """Run the training loop.

    - ``train_iter``: infinite iterator of host batches (array or tuple).
    - ``train_step(state, batch, rng) -> (state, metrics)`` — jitted.
    - ``val_data``: re-iterable of host batches; ``val_step(state, batch)``.
    - ``mesh``: if given, host batches are device_put sharded on 'data'.
    - ``ckpt``: best-metric checkpointing + step-level resume source.
    - ``ckpt_every``: checkpoint cadence in epochs (default 1 = the
      reference's every-epoch ModelCheckpoint). On remote-TPU tunnels the
      device->host state pull dominates epoch time for 100M+ models
      (~1.7 GB/save for the 138M configs); N>1 trades best-model retention
      granularity for wall-clock. The final epoch (and the early-stop
      epoch) always checkpoints so resume/export see the run's end state.
    - ``val_per_sample``: ``val_step`` returns ``(B,)`` per-sample vectors
      (see ``lift_per_sample``). On a single-process mesh, validation batches
      are then padded to a data-axis-divisible shape and SHARDED, with padded
      rows masked inside a jitted reduction — each chip does 1/N of the val
      work instead of replicating the whole batch (VERDICT r2 #3).
    - ``metric_finalizers``: for POOLED metrics (see
      ``adunet.metrics.PooledMetric``): train/val steps emit component sums
      under ``"{name}#{component}"`` keys; after the epoch's summation
      (masked per-sample sums on the sharded val path, per-step sums on the
      train path), ``metrics[name] = finalizer({component: sum})`` — i.e.
      the metric pools over everything the epoch saw, exactly like Keras's
      stateful metrics (which reset per epoch and accumulate per batch).
      Component keys never appear in the logged metrics themselves.
    """
    rng = rng if rng is not None else jax.random.key(0)
    history: List[EpochLog] = []
    best_metric: Optional[float] = None
    best_epoch: Optional[int] = None
    best_params_host = None
    best_stats_host = None
    best_pool: Dict[str, float] = {}
    best_on_disk = True  # vacuously true until a best exists
    wait = 0
    stopped_early = False

    # ReduceLROnPlateau (Keras semantics: separate monitor/patience from
    # early stopping, min_delta/cooldown included; requires an
    # inject_hyperparams optimizer)
    rlp = make_plateau_state(reduce_lr_on_plateau) if reduce_lr_on_plateau is not None else None

    csv_writer = None
    csv_file = None
    if log_dir is not None:
        log_dir = Path(log_dir)
        log_dir.mkdir(parents=True, exist_ok=True)

    train_it = iter(train_iter)

    # jitted masked reduction for the sharded val path: per-sample vectors ×
    # padding mask -> per-key sums over the sample axis; only the reduced
    # values ((,) scalars, or (K,) component vectors for pooled metrics)
    # cross back to host
    import jax.numpy as jnp

    masked_val = None
    if val_per_sample and mesh is not None and val_step is not None:

        @jax.jit
        def masked_val(state_, batch_, mask_):
            out = val_step(state_, batch_)

            def reduce(v):
                v = jnp.asarray(v)
                # select, don't multiply: a legitimate +inf per-sample metric
                # (identical shaved patches -> inf PSNR) in a PADDED row would
                # turn inf * 0.0 into NaN and poison the epoch sum
                m = mask_.reshape(mask_.shape + (1,) * (v.ndim - 1))
                return jnp.sum(jnp.where(m > 0, v, 0.0), axis=0)

            return {k: reduce(v) for k, v in out.items()}

    def put(batch):
        if mesh is not None:
            return shard_batch(batch, mesh)
        return batch

    # Host pipeline: pull + device_put upcoming batches from transfer threads
    # while the dispatched step computes. device_put can block its calling
    # thread (e.g. over a remote-TPU transfer tunnel), so the overlap must
    # come from threads, not just async dispatch. DOUBLE-buffered (VERDICT r2
    # #6): two batches in flight on two workers — concurrent puts multiplex
    # the transfer link, covering per-put latency that a single staged batch
    # leaves exposed. The iterator is advanced on the CALLING thread (worker
    # threads would race on next(train_it)); only the device_put runs async.
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    import os as _os

    prefetch_depth = max(1, int(_os.environ.get("ADUNET_PREFETCH_DEPTH", "2")))
    transfer_pool = ThreadPoolExecutor(max_workers=prefetch_depth)

    def stage_next():
        batch = next(train_it)
        return transfer_pool.submit(put, batch)

    pending_batches = deque()  # futures carried across epochs

    # the transfer thread must not outlive fit() on ANY exit path
    try:

        def batch_size_of(batch) -> int:
            leaf = jax.tree_util.tree_leaves(batch)[0]
            return int(leaf.shape[0])

        # Validation batches are identical every epoch; optionally prepare
        # (pad + shard/replicate + device_put) them ONCE and keep them
        # device-resident — re-decoding and re-transferring the val set per
        # epoch costs seconds on a high-latency device link. Opt-in: the val
        # set must fit in device memory alongside the model.
        val_device_cache = [] if (cache_val_on_device and val_data is not None) else None
        _shard_val = (
            val_per_sample and mesh is not None and jax.process_count() == 1
        )

        def _prepare_val_batches():
            for vbatch in val_data:
                n = batch_size_of(vbatch)
                if _shard_val:
                    sb, smask, n = pad_and_shard_ragged(vbatch, mesh)
                    item = ("sharded", (sb, smask), n)
                else:
                    vb = _replicate_tree(vbatch, mesh) if mesh is not None else vbatch
                    item = ("plain", vb, n)
                if val_device_cache is not None:
                    val_device_cache.append(item)
                yield item

        for epoch in range(initial_epoch, epochs):
            # first-class profiling (the reference disabled its profiler and
            # scraped logs instead — SURVEY.md §5): trace the first epoch
            if profile_dir is not None and epoch == initial_epoch:
                jax.profiler.start_trace(str(profile_dir))
            t0 = time.perf_counter()
            images_seen = 0
            acc = None  # metric sums stay on device; one host sync per epoch
            while len(pending_batches) < prefetch_depth:
                pending_batches.append(stage_next())
            for _ in range(steps_per_epoch):
                batch = pending_batches.popleft().result()
                pending_batches.append(stage_next())
                rng, step_rng = jax.random.split(rng)
                images_seen += samples_per_step or batch_size_of(batch)
                state, metrics = train_step(state, batch, step_rng)
                acc = (
                    metrics
                    if acc is None
                    else jax.tree_util.tree_map(lambda a, b: a + b, acc, metrics)
                )
            jax.block_until_ready(acc)
            duration = time.perf_counter() - t0
            if profile_dir is not None and epoch == initial_epoch:
                try:
                    jax.profiler.stop_trace()
                except Exception:
                    pass
            raw_train = {k: np.asarray(v) for k, v in acc.items()}
            train_metrics = {
                k: float(v) / steps_per_epoch
                for k, v in raw_train.items()
                if "#" not in k
            }
            for name, fin in (metric_finalizers or {}).items():
                comps = {
                    k.split("#", 1)[1]: raw_train[k]
                    for k in raw_train
                    if k.startswith(name + "#")
                }
                if comps:
                    train_metrics[name] = float(fin(comps))

            # failure detection: a non-finite mean loss means the run is
            # diverged/poisoned — stop before checkpointing the bad state
            # (costs nothing: the epoch mean is already on host)
            if stop_on_nan and not np.isfinite(train_metrics.get("loss", 0.0)):
                print(
                    f"[fit] non-finite training loss at epoch {epoch + 1}; "
                    "stopping (set stop_on_nan=False to disable).",
                    flush=True,
                )
                stopped_early = True
                break

            tail_t = {"val": 0.0, "ckpt": 0.0, "best": 0.0}
            val_metrics: Dict[str, float] = {}
            if val_data is not None and val_step is not None:
                _tv0 = time.perf_counter()
                if pre_val_hook is not None:
                    # e.g. precise-BN statistics re-estimation: the returned
                    # state is used for validation AND kept (checkpoints then
                    # carry the refreshed statistics)
                    state = pre_val_hook(state)
                # metric SUMS accumulate on device; ONE host sync per epoch.
                # Per-batch float() pulls each pay a full device round trip —
                # ~2 s x batches x keys per epoch on a remote-TPU link.
                vacc = None
                vcount = 0.0
                if val_device_cache is not None and len(val_device_cache):
                    val_iter = val_device_cache  # prepared once, reused
                else:
                    val_iter = _prepare_val_batches()
                for prepared in val_iter:
                    kind, payload, n = prepared
                    if kind == "sharded":
                        sb, smask = payload
                        sums = masked_val(state, sb, smask)
                    else:
                        out = val_step(state, payload)
                        # scalar batch means x n, or per-sample vectors (and
                        # pooled-metric component arrays) summed over the
                        # sample axis — both reduce to sample-weighted sums
                        sums = {
                            k: (
                                jnp.sum(v, axis=0)
                                if getattr(v, "ndim", 0)
                                else v * float(n)
                            )
                            for k, v in out.items()
                        }
                    vacc = (
                        sums
                        if vacc is None
                        else jax.tree_util.tree_map(lambda a, b: a + b, vacc, sums)
                    )
                    vcount += n
                if vacc is not None:
                    raw = {k: np.asarray(v) for k, v in vacc.items()}
                    val_metrics = {
                        k: float(v) / vcount for k, v in raw.items() if "#" not in k
                    }
                    for name, fin in (metric_finalizers or {}).items():
                        comps = {
                            k.split("#", 1)[1]: raw[k]
                            for k in raw
                            if k.startswith(name + "#")
                        }
                        if comps:
                            val_metrics[name] = float(fin(comps))
                tail_t["val"] = time.perf_counter() - _tv0

            log = EpochLog(
                epoch=epoch + 1,
                steps=steps_per_epoch,
                duration_s=duration,
                ms_per_step=1000.0 * duration / max(steps_per_epoch, 1),
                metrics=train_metrics,
                val_metrics=val_metrics,
            )
            history.append(log)

            if verbose:
                parts = [f"{k}: {v:.4f}" for k, v in train_metrics.items()]
                parts += [f"val_{k}: {v:.4f}" for k, v in val_metrics.items()]
                ips = images_seen / duration
                print(
                    f"Epoch {epoch + 1}/{epochs} - {duration:.1f}s - "
                    f"{log.ms_per_step:.0f}ms/step - {ips:.1f} img/s - " + " - ".join(parts),
                    flush=True,
                )

            if log_dir is not None:
                row = log.row()
                if csv_writer is None:
                    csv_file = open(log_dir / "epoch_metrics.csv", "a", newline="")
                    csv_writer = csv.DictWriter(csv_file, fieldnames=list(row.keys()))
                    if csv_file.tell() == 0:
                        csv_writer.writeheader()
                csv_writer.writerow(row)
                csv_file.flush()
            if tb_writer is not None:
                for k, v in train_metrics.items():
                    tb_writer.add_scalar(f"train/{k}", v, epoch + 1)
                for k, v in val_metrics.items():
                    tb_writer.add_scalar(f"val/{k}", v, epoch + 1)
                tb_writer.add_scalar("perf/ms_per_step", log.ms_per_step, epoch + 1)
                tb_writer.add_scalar("perf/images_per_sec", images_seen / duration, epoch + 1)

            monitored_pool = {**train_metrics, **{f"val_{k}": v for k, v in val_metrics.items()}}
            current = monitored_pool.get(monitor)

            if rlp is not None:
                rlp_current = monitored_pool.get(rlp["monitor"])
                if rlp_current is not None:
                    if plateau_update(rlp, rlp_current):
                        state = _scale_injected_lr(state, rlp["factor"], rlp["min_lr"])
                        if verbose:
                            new_lr = float(
                                np.asarray(state.opt_state.hyperparams["learning_rate"])
                            )
                            print(f"ReduceLROnPlateau: lr -> {new_lr:.2e}", flush=True)

            saved_this_epoch = False
            if ckpt is not None and ((epoch + 1) % max(1, ckpt_every) == 0
                                     or (epoch + 1) == epochs):
                _tc0 = time.perf_counter()
                ckpt.save(epoch + 1, state, metrics=monitored_pool)
                tail_t["ckpt"] = time.perf_counter() - _tc0
                saved_this_epoch = True

            if current is not None:
                if _improved(current, best_metric, monitor_mode):
                    best_metric = current
                    best_epoch = epoch + 1
                    best_pool = dict(monitored_pool)
                    best_on_disk = saved_this_epoch
                    wait = 0
                    if restore_best_weights:
                        # retain the best weights as a DEVICE-side copy
                        # (sharding preserved, no host round-trip — the old
                        # device_get pulled ~550 MB/improving-epoch through
                        # the remote tunnel for the 138M configs); host
                        # fallback if HBM can't hold the extra tree
                        _tb0 = time.perf_counter()
                        try:
                            best_params_dev = _device_copy(state.params)
                            best_stats_dev = (
                                _device_copy(state.batch_stats)
                                if state.batch_stats is not None else None
                            )
                            # jit dispatch is async: an OOM from the extra
                            # full-params copy would otherwise surface in the
                            # NEXT train step, outside this fallback
                            jax.block_until_ready(best_params_dev)
                            if best_stats_dev is not None:
                                jax.block_until_ready(best_stats_dev)
                        except Exception:
                            best_params_dev = jax.device_get(state.params)
                            best_stats_dev = (
                                jax.device_get(state.batch_stats)
                                if state.batch_stats is not None else None
                            )
                        best_params_host = best_params_dev
                        best_stats_host = best_stats_dev
                        tail_t["best"] = time.perf_counter() - _tb0
                else:
                    wait += 1
                    if patience is not None and patience > 0 and wait >= patience:
                        stopped_early = True
                        if ckpt is not None and not saved_this_epoch:
                            # the stop epoch always checkpoints (resume/export
                            # fidelity under a sparse ckpt_every cadence)
                            ckpt.save(epoch + 1, state, metrics=monitored_pool)
                        if verbose:
                            best_str = (  # best stays None if every epoch was NaN
                                f"{best_metric:.4f}" if best_metric is not None else "n/a"
                            )
                            print(
                                f"Early stopping at epoch {epoch + 1} "
                                f"(best {monitor}={best_str} @ epoch {best_epoch}).",
                                flush=True,
                            )
                        break
            # per-phase tail timings on their own line (NOT the metrics line:
            # multi-host lockstep tooling diffs that line across processes,
            # and wall times legitimately differ per process)
            if verbose and max(tail_t.values()) >= 0.5:
                print(
                    f"  [epoch tail: val {tail_t['val']:.1f}s"
                    f" ckpt {tail_t['ckpt']:.1f}s"
                    f" best-pull {tail_t['best']:.1f}s]",
                    flush=True,
                )

        if restore_best_weights and best_params_host is not None:
            # restore onto each leaf's CURRENT sharding: a bare device_put
            # would collapse replicated (or model-sharded) params onto the
            # default device — wrong placement for the post-fit eval/save
            # path, and a full 138M tree on one chip for the TP configs
            def _put_like(host_tree, live_tree):
                return jax.tree_util.tree_map(
                    lambda h, l: jax.device_put(h, l.sharding), host_tree, live_tree
                )

            state = state.replace(params=_put_like(best_params_host, state.params))
            if best_stats_host is not None:
                state = state.replace(
                    batch_stats=_put_like(best_stats_host, state.batch_stats)
                )
            if ckpt is not None and not best_on_disk and best_epoch is not None:
                # A sparse ckpt_every cadence (or an early stop between
                # cadence points) can leave the run's true-best epoch with no
                # on-disk checkpoint — downstream restore_best consumers
                # (evaluate --restore_best, export) would then load weights up
                # to ckpt_every-1 epochs worse than the best the run reported.
                # Persist the restored-best state once, keyed by its epoch and
                # carrying its monitored metrics so best-step selection agrees
                # with the in-memory record. (The saved opt_state is the final
                # epoch's; params/batch_stats are the best epoch's — weight
                # consumers are unaffected, and exact-optimizer resume uses
                # the LATEST checkpoint, which this save does not displace.)
                try:
                    # force: Orbax's should_save gate silently drops saves at
                    # steps <= latest_step, and the backfilled best epoch
                    # precedes the final/stop epoch by construction
                    ckpt.save(best_epoch, state, metrics=best_pool, force=True)
                except Exception as exc:  # keep fit() usable even if the
                    # manager refuses an out-of-order step on some backend
                    print(f"[fit] best-epoch backfill save failed: {exc}", flush=True)

    finally:
        # close on EVERY exit path, not just the clean one (rows flush per
        # write, so only the handle leaks — but it leaks for process life)
        if csv_file is not None:
            csv_file.close()
        transfer_pool.shutdown(wait=False, cancel_futures=True)

    return FitResult(
        state=state,
        history=history,
        best_metric=best_metric,
        best_epoch=best_epoch,
        stopped_early=stopped_early,
    )

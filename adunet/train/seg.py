"""Segmentation train/eval steps with on-device augmentation and BN stats.

Rebuild of the protocol trainer's hot loops
(/root/reference/Segmenation/code/train_adaptive_unet.py:538-546): one XLA
program per step covering augmentation (rot90/flips/scale-jitter-crop via
static-shape coordinate sampling), forward, hybrid loss, backward, Adam, and
the BatchNorm running-statistics update (Keras momentum semantics via the
flax mutable collection).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Dict

import jax

from adunet.data.augment import augment_pair_batch, flip_pair_batch
from adunet.metrics.seg import PooledMetric, dice_coefficient, iou_score
from adunet.train.state import TrainState

__all__ = [
    "make_seg_train_step",
    "make_seg_eval_step",
    "metric_finalizers_of",
    "make_bn_refresh_step",
    "precise_batch_stats",
    "snapshot_refresh_batches",
    "make_precise_bn_program",
]


def make_seg_train_step(
    model,
    loss_fn: Callable[[jax.Array, jax.Array], jax.Array],
    augment: bool | str = True,
    donate: bool = True,
    extra_metrics: Dict[str, Callable] | None = None,
):
    """Returns jitted (state, (images, masks), rng) -> (state, metrics).

    ``augment``: True/'full' = rot90+flips+scale-jitter (protocol trainer);
    'flips' = LR/UD flips only (vanilla trainer); False/'none' = off.
    """
    mode = {True: "full", False: "none"}.get(augment, augment)

    def step(state: TrainState, batch, rng: jax.Array):
        images, masks = batch
        if mode == "full":
            images, masks = augment_pair_batch(images, masks, rng)
        elif mode == "flips":
            images, masks = flip_pair_batch(images, masks, rng)

        def compute_loss(params):
            variables = {"params": params}
            if state.batch_stats is not None:
                variables["batch_stats"] = state.batch_stats
                pred, new_vars = state.apply_fn(
                    variables, images, train=True, mutable=["batch_stats"]
                )
                new_stats = new_vars.get("batch_stats")
            else:
                pred = state.apply_fn(variables, images, train=True)
                new_stats = None
            loss = loss_fn(masks, pred)
            return loss, (pred, new_stats)

        (loss, (pred, new_stats)), grads = jax.value_and_grad(compute_loss, has_aux=True)(
            state.params
        )
        new_state = state.apply_gradients(grads=grads)
        if new_stats is not None:
            new_state = new_state.replace(batch_stats=new_stats)
        metrics = {
            "loss": loss,
            "dice": dice_coefficient(masks, pred),
            "iou": iou_score(masks, pred),
        }
        for name, fn in (extra_metrics or {}).items():
            if isinstance(fn, PooledMetric):
                # component sums accumulate across the epoch's steps in
                # fit(); metric_finalizers[name] pools them — the Keras
                # stateful-metric convention (reset per epoch, accumulate
                # per batch) rather than a mean of per-batch values
                for comp, v in fn.stats(masks, pred).items():
                    metrics[f"{name}#{comp}"] = v
            else:
                metrics[name] = fn(masks, pred)
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_seg_eval_step(
    model,
    loss_fn: Callable[[jax.Array, jax.Array], jax.Array],
    extra_metrics: Dict[str, Callable] | None = None,
    per_sample: bool = False,
):
    """Returns jitted (state, (images, masks)) -> batch metrics (no augment,
    BN running averages).

    ``per_sample=True`` lifts every plain metric to a ``(B,)`` vector
    (singleton-batch vmap) so fit() can shard ragged val batches over the
    mesh and mask padding — exact for batch-mean-of-per-sample metrics
    (Dice/IoU here). Metrics that POOL over the batch (whole-batch Dice,
    precision/recall, hard mIoU) must be passed as
    :class:`adunet.metrics.PooledMetric`: their per-sample component sums
    are emitted under ``"{name}#{component}"`` keys and fit() applies the
    matching ``metric_finalizers[name]`` to the masked epoch sums, yielding the
    exact whole-val-set pooled value. With ``per_sample=False`` pooled
    metrics fall back to their plain batch value (the reference's Keras
    per-batch-mean convention).
    """
    fns: Dict[str, Callable] = {
        "loss": loss_fn,
        "dice": dice_coefficient,
        "iou": iou_score,
        **(extra_metrics or {}),
    }
    plain = {k: f for k, f in fns.items() if not isinstance(f, PooledMetric)}
    pooled = {k: f for k, f in fns.items() if isinstance(f, PooledMetric)}

    @partial(jax.jit)
    def step(state: TrainState, batch) -> Dict[str, jax.Array]:
        images, masks = batch
        variables = {"params": state.params}
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats
        pred = state.apply_fn(variables, images, train=False)
        if per_sample:
            from adunet.train.sr import lift_per_sample

            out = {name: lift_per_sample(fn)(masks, pred) for name, fn in plain.items()}
            for name, pm in pooled.items():
                comps = lift_per_sample(pm.stats)(masks, pred)  # {comp: (B, ...)}
                out.update({f"{name}#{c}": v for c, v in comps.items()})
            return out
        out = {name: fn(masks, pred) for name, fn in plain.items()}
        out.update({name: pm.batch_fn(masks, pred) for name, pm in pooled.items()})
        return out

    return step


def metric_finalizers_of(extra_metrics: Dict[str, Callable] | None) -> Dict[str, Callable]:
    """Extract fit()'s ``metric_finalizers`` mapping from an extra-metrics dict."""
    return {
        name: fn.finalize
        for name, fn in (extra_metrics or {}).items()
        if isinstance(fn, PooledMetric)
    }


def make_bn_refresh_step(momentum: float | None = None):
    """One jitted accumulation step for precise-BN re-estimation.

    ``momentum`` defaults to the models' single-sourced BatchNorm momentum
    (adunet.nn.blocks.BN_MOMENTUM) — the EMA inversion below amplifies any
    mismatch by 1/(1-m), so it must track the layer, not a local constant.

    Diagnosis (round-3, VERDICT r2 #2): with BatchNorm momentum 0.99 the
    running statistics are an exponential average over the LAST ~100 train
    batches. When activations keep drifting (fixed-LR protocol B) or the
    corpus is small, the EMA chases a moving target and can sit far from the
    stats of ANY real batch — eval-mode predictions collapse while train-mode
    dice is ~0.96 (the checked-in protocol-B seed-42 run). Precise-BN
    (Wu & Johnson, arXiv:2105.07576) replaces the EMA with population
    statistics recomputed from the CURRENT weights over N batches:
    mean = E_b[mean_b], var = E_b[var_b + mean_b^2] - mean^2.

    Each call runs one train-mode forward and returns the accumulator with
    this batch's (mean, var + mean^2) contribution added. The per-batch
    stats are recovered by inverting the EMA update new = m*old + (1-m)*b.
    """
    if momentum is None:
        from adunet.nn.blocks import BN_MOMENTUM

        momentum = BN_MOMENTUM

    @jax.jit
    def step(state: TrainState, images, acc):
        contrib = _bn_batch_second_moments(state, images, momentum)
        return jax.tree_util.tree_map(lambda a, c: a + c, acc, contrib)

    return step


def _walk_bn_stats(node, fn_mean, fn_var):
    """Map over a flax batch_stats tree: arrays nest under exactly
    {'mean','var'} leaves; ``fn_var`` gets its sibling mean for second-moment
    math. The ONE tree walker behind every precise-BN transform here."""
    out = {}
    for k, v in node.items():
        if hasattr(v, "items"):
            out[k] = _walk_bn_stats(v, fn_mean, fn_var)
        elif k == "var":
            out[k] = fn_var(v, node["mean"])
        else:
            out[k] = fn_mean(v)
    return out


def _bn_batch_second_moments(state: TrainState, images, momentum: float):
    """One train-mode forward -> this batch's (mean_b, var_b + mean_b^2).

    Per-batch stats are recovered by inverting the BN EMA update
    new = m*old + (1-m)*b; the var slot then carries the second moment so
    contributions sum across batches."""
    import jax.numpy as jnp

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    _, new_vars = state.apply_fn(variables, images, train=True, mutable=["batch_stats"])
    est = jax.tree_util.tree_map(
        lambda new, old: (new - momentum * old) / (1.0 - momentum),
        new_vars["batch_stats"],
        state.batch_stats,
    )
    return _walk_bn_stats(est, lambda m: m, lambda v, m: v + jnp.square(m))


@partial(jax.jit, static_argnames=("n",))
def _finalize_precise_stats(acc, n: int):
    """Accumulated (Σmean_b, Σ[var_b + mean_b²]) -> population (mean, var).

    Jitted as ONE program: the tree walk issues ~2 ops per BN layer, and
    running those eagerly costs a dispatch each — dozens of RPCs per epoch
    on a remote-device link. The variance clamp absorbs the tiny negative
    excursions float32 EMA inversion (amplified 1/(1-m)x) can produce."""
    import jax.numpy as jnp

    return _walk_bn_stats(
        acc,
        lambda m: m / n,
        lambda v, m: jnp.maximum(v / n - jnp.square(m / n), 1e-12),
    )


def precise_batch_stats(state: TrainState, image_batches, refresh_step, put=None):
    """Replace ``state.batch_stats`` with population stats over the batches.

    ``image_batches``: iterable of image arrays (no masks); ``put``: optional
    device-placement fn (mesh replication). Returns the state unchanged when
    the iterable is empty.
    """
    import jax.numpy as jnp

    acc = jax.tree_util.tree_map(jnp.zeros_like, state.batch_stats)
    n = 0
    for images in image_batches:
        if put is not None:
            images = put(images)
        acc = refresh_step(state, images, acc)
        n += 1
    if n == 0:
        return state
    return state.replace(batch_stats=_finalize_precise_stats(acc, n))


def snapshot_refresh_batches(dataset, n_batches: int, put=None):
    """Decode ``n_batches`` image batches for precise-BN WITHOUT consuming the
    dataset's shuffle-epoch counter.

    Iterating the training dataset advances its per-epoch shuffle seed, so a
    naive ``islice(iter(train_ds), n)`` at setup time would shift every
    training epoch's batch order relative to a run without ``--precise_bn`` —
    silently breaking same-seed reproducibility across the flag (and the
    shared-trajectory claim of the round-3 EMA-vs-precise-BN diagnosis).
    Refresh batches only need to be a representative un-augmented sample:
    take pairs in deterministic dataset order, wrapping if the corpus is
    smaller than ``n_batches`` full batches.

    Multi-host: selection draws from the dataset's GLOBAL pair list (set by
    build_isic_dataset before process-sharding), not the process-local
    shard. ``put`` is typically ``replicate(x, mesh)``, whose contract is
    that every process passes the same full value — process-local pairs
    differ per host and would silently produce divergent BN statistics (and
    so divergent checkpoints) across hosts.
    """
    import numpy as np

    pairs = getattr(dataset, "global_pairs", dataset.pairs)
    bs = dataset.batch_size
    batches = []
    for b in range(n_batches):
        sel = [pairs[(b * bs + j) % len(pairs)] for j in range(bs)]
        images = np.stack([dataset._load_pair(*p)[0] for p in sel])
        batches.append(put(images) if put is not None else images)
    return batches


def make_precise_bn_program(momentum: float | None = None):
    """Whole precise-BN re-estimation as ONE jitted program.

    ``run(state, stack)`` with ``stack`` of shape (N, B, H, W, C) scans the N
    refresh batches on device and returns the precise population statistics
    tree. One dispatch per validation pass — the per-batch variant
    (:func:`precise_batch_stats`) pays a host->device round trip per batch,
    which on a high-latency transfer link costs ~1-2 s x N every epoch.
    """
    import jax.numpy as jnp

    if momentum is None:
        from adunet.nn.blocks import BN_MOMENTUM

        momentum = BN_MOMENTUM

    @jax.jit
    def run(state: TrainState, stack):
        def body(acc, images):
            contrib = _bn_batch_second_moments(state, images, momentum)
            return jax.tree_util.tree_map(lambda a, c: a + c, acc, contrib), None

        acc0 = jax.tree_util.tree_map(jnp.zeros_like, state.batch_stats)
        acc, _ = jax.lax.scan(body, acc0, stack)
        return _finalize_precise_stats(acc, stack.shape[0])

    return run

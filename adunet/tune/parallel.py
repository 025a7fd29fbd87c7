"""Mesh-parallel trial evaluation for the hyperparameter tuner.

The reference's optuna study evaluates trials strictly sequentially on a
single GPU (Super_resolution/code/u_net_vanilla_optuna.py:331 —
``study.optimize`` with the default ``n_jobs=1``). On TPU the natural
resource is a device mesh, so this module evaluates a *batch* of trials
simultaneously:

- trials that share every shape-affecting hyperparameter (here: batch size;
  the model width is fixed by the reference's search space) are stacked on
  a leading **trial axis**;
- the continuous per-trial hyperparameters become traced arrays — the
  learning rate rides in the optimizer state via ``optax.inject_hyperparams``
  and the combined-loss weights (alpha, beta, gamma) enter the loss as data;
- one jit-compiled ``vmap`` train step advances every lane at once, with the
  trial axis sharded across the mesh (``PartitionSpec('trial')``). Lanes
  never communicate: the data batch is replicated, the models are
  lane-local, so XLA partitions the batch into an embarrassingly parallel
  program — K trials in roughly one trial's wall-clock.

Every lane sees exactly the data stream and init the sequential tuner gives
each trial (same seed → same shuffle order and same initial weights), so a
batched study explores the same space as a sequential one; only the
sampler's conditioning differs (constant-liar batched asks,
``Study.ask_batch``). Intra-trial median pruning is intentionally absent in
batched mode: lanes advance in lockstep and a pruned lane's MXU slot cannot
be reassigned mid-flight, so the honest trade — standard for batched HPO —
is wall-clock parallelism instead of early stopping.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

__all__ = ["BatchedVanillaSRTuner", "group_trials_by"]


def group_trials_by(trials: Sequence, key: str) -> Dict[object, List]:
    """Group asked trials by a shape-affecting parameter (insertion-ordered)."""
    groups: Dict[object, List] = {}
    for t in trials:
        groups.setdefault(t.params[key], []).append(t)
    return groups


class BatchedVanillaSRTuner:
    """Evaluates groups of vanilla-SR trials as one vmapped program.

    Mirrors the sequential ``run_config`` in adunet.cli.tune (the rebuild of
    u_net_vanilla_optuna.py:111-196): same data split, same per-trial init
    seed, same combined loss, same best-val-loss objective — lane ``i`` of a
    batched run reproduces what sequential trial ``i`` would have computed.
    """

    def __init__(
        self,
        lr_images: np.ndarray,
        hr_images: np.ndarray,
        train_idx: Sequence[int],
        val_idx: Sequence[int],
        *,
        base_channels: int = 64,
        seed: int = 42,
        perceptual_fn=None,
        mesh=None,
        lane_width=None,
    ):
        import jax
        import jax.numpy as jnp

        from adunet.losses import make_perceptual_fn
        from adunet.models import VanillaSRUNet

        self._jax, self._jnp = jax, jnp
        self.lr_images, self.hr_images = lr_images, hr_images
        self.train_idx = np.asarray(train_idx)
        self.val_idx = np.asarray(val_idx)
        self.seed = seed
        self.mesh = mesh
        self.lane_width = lane_width
        self.image_size = int(hr_images.shape[1])
        self.model = VanillaSRUNet(base_channels=base_channels)
        self.perceptual_fn = perceptual_fn or make_perceptual_fn(input_size=self.image_size)
        self._step_cache: dict = {}
        # ONE optimizer for the tuner's lifetime: TrainState's treedef embeds
        # tx's init/update closures, so a fresh make_optimizer per group would
        # give every group a structurally distinct pytree and defeat the jit
        # cache (each run_group would re-trace). The injected-lr placeholder
        # is irrelevant — _stacked_state overwrites hyperparams per group.
        from adunet.train import make_optimizer

        self._tx = make_optimizer(1.0, inject_lr=True)

    # ------------------------------------------------------------- internals

    def _lane_width(self, n_trials: int) -> int:
        """Pad the trial axis (padded lanes are discarded duplicates of the
        last trial — correctness is unaffected, only the pad's MXU time is
        wasted).

        Two padding sources compose:
        - ``lane_width``: a fixed floor so every group of the same batch size
          shares ONE program shape. Without it each distinct group size K is
          a fresh XLA compile — and a TPE study's asks split unevenly across
          the batch-size groups, so an unpadded study can pay more compile
          wall-clock than train wall-clock. The dup lanes ride an existing
          dispatch; a recompile is minutes.
        - mesh divisibility: the trial axis must split evenly over the
          ``trial`` mesh axis (bounded by mesh_size - 1 extra lanes).
        """
        width = max(n_trials, int(self.lane_width or 0))
        if self.mesh is None:
            return width
        n_dev = math.prod(self.mesh.devices.shape)
        return -(-width // n_dev) * n_dev

    def _stacked_state(self, lrs: np.ndarray):
        """One init (the sequential tuner seeds every trial identically),
        broadcast onto the trial axis, with per-lane learning rates injected
        into the stacked optimizer state."""
        jax, jnp = self._jax, self._jnp
        from adunet.train import create_train_state

        base = create_train_state(
            self.model,
            jax.random.key(self.seed),
            jnp.zeros((1, self.image_size, self.image_size, 3)),
            self._tx,
        )
        g = len(lrs)
        state = jax.tree.map(lambda x: jnp.stack([jnp.asarray(x)] * g), base)
        hyper = dict(state.opt_state.hyperparams)
        hyper["learning_rate"] = jnp.asarray(lrs, dtype=jnp.float32)
        state = state.replace(opt_state=state.opt_state._replace(hyperparams=hyper))
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            state = jax.device_put(state, NamedSharding(self.mesh, P("trial")))
        return state

    def _steps(self):
        """(train_step, val_step), vmapped over the trial axis, cached across
        groups (the lane count only changes the input shapes, not the trace)."""
        if self._step_cache:
            return self._step_cache["train"], self._step_cache["val"]

        jax, jnp = self._jax, self._jnp
        from adunet.losses import mse_loss, ssim_loss

        perceptual_fn = self.perceptual_fn

        def lane_loss(params, state, abg, lr_b, hr_b, hr_feats, train):
            variables = {"params": params}
            if state.batch_stats is not None:
                variables["batch_stats"] = state.batch_stats
                if train:
                    pred, new_vars = state.apply_fn(
                        variables, lr_b, train=True, mutable=["batch_stats"]
                    )
                    new_stats = new_vars.get("batch_stats")
                else:
                    pred, new_stats = state.apply_fn(variables, lr_b, train=False), None
            else:
                pred = state.apply_fn(variables, lr_b, train=train)
                new_stats = None
            fp = perceptual_fn(jnp.clip(pred.astype(jnp.float32), 0.0, 1.0))
            loss = (
                abg[0] * mse_loss(hr_b, pred)
                + abg[1] * ssim_loss(hr_b, pred)
                + abg[2] * jnp.mean(jnp.square(hr_feats - fp))
            )
            return loss, new_stats

        def lane_train(state, abg, lr_b, hr_b, hr_feats):
            (loss, new_stats), grads = jax.value_and_grad(
                lane_loss, has_aux=True
            )(state.params, state, abg, lr_b, hr_b, hr_feats, True)
            new_state = state.apply_gradients(grads=grads)
            if new_stats is not None:
                new_state = new_state.replace(batch_stats=new_stats)
            return new_state, loss

        def lane_val(state, abg, lr_b, hr_b, hr_feats):
            loss, _ = lane_loss(state.params, state, abg, lr_b, hr_b, hr_feats, False)
            return loss

        def batched_train(state, abgs, batch):
            lr_b, hr_b = batch
            # the HR feature tower is lane-invariant: hoist it out of the
            # vmap so the VGG forward runs once per batch, not once per lane
            hr_feats = perceptual_fn(jnp.clip(hr_b.astype(jnp.float32), 0.0, 1.0))
            return jax.vmap(lane_train, in_axes=(0, 0, None, None, None))(
                state, abgs, lr_b, hr_b, hr_feats
            )

        def batched_val(state, abgs, batch):
            lr_b, hr_b = batch
            hr_feats = perceptual_fn(jnp.clip(hr_b.astype(jnp.float32), 0.0, 1.0))
            return jax.vmap(lane_val, in_axes=(0, 0, None, None, None))(
                state, abgs, lr_b, hr_b, hr_feats
            )

        if self.mesh is not None:
            # shard_map, not bare GSPMD: vmapping conv over stacked lane
            # kernels lowers to a grouped convolution whose group axis the
            # partitioner cannot split (feature_group_count == lane count);
            # shard_mapping the trial axis instead gives every device a
            # purely local vmap over its own lanes — embarrassingly
            # parallel, zero collectives, exactly the intended program.
            from jax.sharding import PartitionSpec as P

            shard_map = jax.shard_map

            lanes, rep = P("trial"), P()
            batched_train = shard_map(
                batched_train, mesh=self.mesh,
                in_specs=(lanes, lanes, rep), out_specs=(lanes, lanes),
                check_vma=False,
            )
            batched_val = shard_map(
                batched_val, mesh=self.mesh,
                in_specs=(lanes, lanes, rep), out_specs=lanes,
                check_vma=False,
            )
        train = jax.jit(batched_train, donate_argnums=0)
        val = jax.jit(batched_val)
        self._step_cache.update(train=train, val=val)
        return train, val

    # ------------------------------------------------------------- public

    def run_group(
        self,
        configs: Sequence[Dict[str, float]],
        batch_size: int,
        epochs: int,
        on_epoch=None,
    ) -> List[List[float]]:
        """Train one group of same-batch-size trials in lockstep.

        ``configs``: per-trial dicts with lr/alpha/beta/gamma. Returns the
        per-trial validation-loss curve (one value per epoch), from which the
        caller reports/tells (the sequential objective's value is the curve
        minimum).

        ``on_epoch(epoch, last_vals)``: optional callback with the epoch's
        per-trial validation losses; returning truthy stops the whole group
        early (curves end at that epoch). Single-lane groups use this for
        live median pruning — the sequential study drives THIS runner rather
        than a per-trial jit so the trial hyperparameters (lr via
        inject_hyperparams, loss weights as data) stay traced and the study
        compiles one program per batch size instead of one per trial; on a
        remote-compile backend a per-trial compile costs more wall-clock
        than the trial's own training."""
        jax, jnp = self._jax, self._jnp
        from adunet.data import ArrayDataset
        from adunet.train import repeat

        n_real = len(configs)
        width = self._lane_width(n_real)
        padded = list(configs) + [configs[-1]] * (width - n_real)
        lrs = np.asarray([c["lr"] for c in padded], dtype=np.float32)
        abgs = jnp.asarray(
            [[c["alpha"], c["beta"], c["gamma"]] for c in padded], dtype=jnp.float32
        )
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            abgs = jax.device_put(abgs, NamedSharding(self.mesh, P("trial")))

        state = self._stacked_state(lrs)
        train_step, val_step = self._steps()

        train_ds = ArrayDataset(
            self.lr_images[self.train_idx], self.hr_images[self.train_idx],
            batch_size=batch_size, shuffle=True, seed=self.seed,
        )
        val_ds = ArrayDataset(
            self.lr_images[self.val_idx], self.hr_images[self.val_idx],
            batch_size=batch_size, shuffle=False, seed=self.seed,
        )

        curves: List[List[float]] = [[] for _ in range(width)]
        it = repeat(train_ds)
        for _epoch in range(epochs):
            for _ in range(train_ds.steps_per_epoch):
                lr_b, hr_b = next(it)
                state, _loss = train_step(state, abgs, (jnp.asarray(lr_b), jnp.asarray(hr_b)))
            vals, weights = [], []
            for lr_b, hr_b in val_ds:
                out = val_step(state, abgs, (jnp.asarray(lr_b), jnp.asarray(hr_b)))
                vals.append(np.asarray(out))
                weights.append(lr_b.shape[0])
            epoch_val = np.average(np.stack(vals, axis=0), axis=0, weights=weights)
            for lane in range(width):
                curves[lane].append(float(epoch_val[lane]))
            if on_epoch is not None and on_epoch(_epoch, [c[-1] for c in curves[:n_real]]):
                break
        return curves[:n_real]

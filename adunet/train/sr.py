"""SR train/eval steps — single jitted programs covering the whole hot path.

The reference's step is Keras fit() over host-degraded patches
(Super_resolution/code/train_adaptive_unet.py:622-632, HOT LOOP #2) with the
LR degradation in Python/cv2 threads (HOT LOOP #1). Here both loops fuse into
one XLA program: the HR batch lands in HBM once; degradation (matmul resize),
forward, loss, backward and Adam all run on-chip. Under a Mesh with the batch
sharded on 'data' and params replicated, XLA inserts the gradient all-reduce
over ICI automatically.

Training degrades at DATA_LR_SHRINK=0.5 regardless of model scale, matching
the reference's deliberate constant (train_adaptive_unet.py:60,438); the
evaluator degrades at the requested scale (evaluate_model.py:233-239). Both
conventions are explicit arguments here.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from adunet.metrics.psnr_ssim import mse_per_image, psnr, ssim, ssim_multiscale
from adunet.ops import degrade, rgb_to_luma_bt601
from adunet.train.state import TrainState

__all__ = [
    "sr_loss_and_metrics",
    "make_sr_train_step",
    "make_sr_eval_step",
    "make_vanilla_sr_train_step",
    "make_vanilla_sr_val_step",
    "make_sr_device_cache_train_step",
    "DATA_LR_SHRINK",
]

# constant LR degradation factor for training (reference :60)
DATA_LR_SHRINK = 0.5


def _as_f01(x: jax.Array) -> jax.Array:
    """Normalise a host batch on device: uint8 wire format -> [0,1] f32.

    Shipping uint8 quarters host->device transfer volume (images are uint8
    at the source); the cast+scale fuses into the step's first op.
    """
    if x.dtype == jnp.uint8:
        return x.astype(jnp.float32) * (1.0 / 255.0)
    return x


def _lr_hr_of(batch, data_scale: float) -> Tuple[jax.Array, jax.Array]:
    """Resolve a batch into (lr, hr).

    A bare array is an HR batch whose LR counterpart is synthesised on device
    (the reference's main path); an ``(lr, hr)`` tuple carries real LR pixels
    from a paired directory (the reference's --low_res_dir alt path,
    train_adaptive_unet.py:123-197). The branch resolves at trace time — the
    two layouts are distinct XLA programs. uint8 batches normalise on device.
    """
    if isinstance(batch, (tuple, list)):
        lr_batch, hr_batch = batch
        return _as_f01(lr_batch), _as_f01(hr_batch)
    hr_batch = _as_f01(batch)
    return degrade(hr_batch, data_scale), hr_batch


def sr_loss_and_metrics(loss_fn, hr, pred) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    loss = loss_fn(hr, pred)
    clipped = jnp.clip(pred.astype(jnp.float32), 0.0, 1.0)
    return loss, {"psnr": jnp.mean(psnr(hr.astype(jnp.float32), clipped))}


def make_sr_train_step(
    model,
    loss_fn: Callable[[jax.Array, jax.Array], jax.Array],
    data_scale: float = DATA_LR_SHRINK,
    donate: bool = True,
    grad_accum: int = 1,
    batch_sharding=None,
):
    """Returns jitted (state, hr_batch) -> (state, metrics).

    ``hr_batch``: (B, P, P, 3) float32 HR patches in [0, 1]. LR inputs are
    synthesised on device with the cv2-exact degradation.

    ``grad_accum=k`` splits the batch into k sequential micro-batches
    (lax.scan) and applies ONE optimizer update on the averaged gradients —
    activation memory drops to B/k per micro-batch while the update equals
    the full-batch step exactly (the loss is a batch mean and gradients are
    linear, so the mean of micro-gradients IS the full-batch gradient, up to
    float summation order). This is how the 138M-param deep configs reach
    large effective batches inside one chip's HBM without rematerialising
    more levels. B must be divisible by k.

    ``batch_sharding``: optional NamedSharding for each MICRO-batch under
    grad_accum on a mesh — re-pins the micro-batch's sample axis to 'data'
    so every chip keeps 1/D of each micro-batch (the reshape otherwise
    leaves GSPMD free to serialise whole micro-batches onto subsets of the
    mesh). Micro-batch size B/k must stay divisible by the data-axis size.
    """
    if grad_accum < 1:
        raise ValueError(f"grad_accum must be >= 1, got {grad_accum}.")

    def step(state: TrainState, batch, rng: jax.Array | None = None):
        del rng  # SR training is deterministic given the host patch stream
        if grad_accum == 1:
            lr_batch, hr_batch = _lr_hr_of(batch, data_scale)

            def compute_loss(params):
                pred = state.apply_fn({"params": params}, lr_batch)
                return sr_loss_and_metrics(loss_fn, hr_batch, pred)

            (loss, metrics), grads = jax.value_and_grad(compute_loss, has_aux=True)(state.params)
            new_state = state.apply_gradients(grads=grads)
            metrics = {"loss": loss, **metrics}
            return new_state, metrics

        def split(x):
            if x.shape[0] % grad_accum:
                raise ValueError(
                    f"batch size {x.shape[0]} is not divisible by "
                    f"grad_accum={grad_accum}."
                )
            return x.reshape((grad_accum, x.shape[0] // grad_accum) + x.shape[1:])

        micro_batches = jax.tree_util.tree_map(split, batch)

        def micro_loss(params, mb):
            if batch_sharding is not None:
                mb = jax.tree_util.tree_map(
                    lambda x: jax.lax.with_sharding_constraint(x, batch_sharding), mb
                )
            lr_b, hr_b = _lr_hr_of(mb, data_scale)
            pred = state.apply_fn({"params": params}, lr_b)
            return sr_loss_and_metrics(loss_fn, hr_b, pred)

        def body(acc, mb):
            (loss, metrics), grads = jax.value_and_grad(micro_loss, has_aux=True)(
                state.params, mb
            )
            acc_g, acc_s = acc
            acc_g = jax.tree_util.tree_map(lambda a, g: a + g, acc_g, grads)
            scalars = {"loss": loss, **metrics}
            acc_s = jax.tree_util.tree_map(
                lambda a, s: a + s.astype(jnp.float32), acc_s, scalars
            )
            return (acc_g, acc_s), None

        zero_g = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        zero_s = {"loss": jnp.zeros((), jnp.float32), "psnr": jnp.zeros((), jnp.float32)}
        (grads, sums), _ = jax.lax.scan(body, (zero_g, zero_s), micro_batches)
        grads = jax.tree_util.tree_map(lambda g: g / grad_accum, grads)
        new_state = state.apply_gradients(grads=grads)
        return new_state, {k: v / grad_accum for k, v in sums.items()}

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_sr_eval_step(model, eval_scale: float, eval_shave: int):
    """Returns jitted (state, hr_batch) -> per-patch metric vectors.

    Implements the reference's eval tail (train_adaptive_unet.py:673-693 /
    evaluate_model.py:106-121): degrade at ``eval_scale``, predict, clip,
    BT.601 luma, border shave, PSNR/SSIM/MS-SSIM/MSE per patch.
    """

    @partial(jax.jit)
    def step(state: TrainState, batch):
        variables = {"params": state.params}
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats
        lr_batch, hr_batch = _lr_hr_of(batch, eval_scale)
        pred = state.apply_fn(variables, lr_batch)
        pred = jnp.clip(pred.astype(jnp.float32), 0.0, 1.0)
        hr = hr_batch.astype(jnp.float32)

        pred_y = rgb_to_luma_bt601(pred)
        hr_y = rgb_to_luma_bt601(hr)
        if eval_shave > 0:
            pred_y = pred_y[:, eval_shave:-eval_shave, eval_shave:-eval_shave, :]
            hr_y = hr_y[:, eval_shave:-eval_shave, eval_shave:-eval_shave, :]

        from adunet.metrics.psnr_ssim import msssim_power_factors_for

        size = min(pred_y.shape[-3], pred_y.shape[-2])
        kwargs = {"power_factors": msssim_power_factors_for(size)}

        return {
            "psnr_y": psnr(hr_y, pred_y),
            "ssim_y": ssim(hr_y, pred_y),
            "msssim_y": ssim_multiscale(hr_y, pred_y, **kwargs),
            "mse_y": mse_per_image(hr_y, pred_y),
        }

    return step


def lift_per_sample(fn: Callable) -> Callable:
    """Lift a batch-mean loss/metric to per-sample values.

    Singleton-batch vmap: each sample is evaluated as its own batch of one,
    so any ``fn(y_true, y_pred) -> scalar`` that means over the batch becomes
    a ``(B,)`` vector whose mean equals the original batch value (equal-sized
    samples). This is what lets fit() shard ragged validation batches over
    the mesh and mask padded rows instead of replicating the whole batch on
    every chip (VERDICT r2 #3).
    """
    return jax.vmap(lambda t, p: fn(t[None], p[None]))


def make_sr_val_step(model, loss_fn, data_scale: float = DATA_LR_SHRINK,
                     per_sample: bool = False):
    """Validation loss/psnr on grid patches, matching fit()'s val metrics.

    ``per_sample=True`` returns ``(B,)`` vectors instead of batch means so
    the caller can shard the batch and mask padding.
    """

    @partial(jax.jit)
    def step(state: TrainState, batch):
        variables = {"params": state.params}
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats
        lr_batch, hr_batch = _lr_hr_of(batch, data_scale)
        pred = state.apply_fn(variables, lr_batch)
        if per_sample:
            hr = hr_batch.astype(jnp.float32)
            clipped = jnp.clip(pred.astype(jnp.float32), 0.0, 1.0)
            return {
                "loss": lift_per_sample(loss_fn)(hr_batch, pred),
                "psnr": psnr(hr, clipped),
            }
        loss, metrics = sr_loss_and_metrics(loss_fn, hr_batch, pred)
        return {"loss": loss, **metrics}

    return step


def make_vanilla_sr_train_step(model, loss_fn, donate: bool = True):
    """Paired-batch train step for BatchNorm SR models (the vanilla baseline,
    u-net-vinillia.py:128-241): batch = (lr, hr), running statistics updated
    through the flax mutable collection."""

    def step(state: TrainState, batch, rng: jax.Array | None = None):
        del rng
        lr_batch, hr_batch = batch

        def compute_loss(params):
            variables = {"params": params}
            if state.batch_stats is not None:
                variables["batch_stats"] = state.batch_stats
                pred, new_vars = state.apply_fn(
                    variables, lr_batch, train=True, mutable=["batch_stats"]
                )
                new_stats = new_vars.get("batch_stats")
            else:
                pred = state.apply_fn(variables, lr_batch, train=True)
                new_stats = None
            loss = loss_fn(hr_batch, pred)
            clipped = jnp.clip(pred.astype(jnp.float32), 0.0, 1.0)
            psnr_val = jnp.mean(psnr(hr_batch.astype(jnp.float32), clipped))
            return loss, (psnr_val, new_stats)

        (loss, (psnr_val, new_stats)), grads = jax.value_and_grad(
            compute_loss, has_aux=True
        )(state.params)
        new_state = state.apply_gradients(grads=grads)
        if new_stats is not None:
            new_state = new_state.replace(batch_stats=new_stats)
        return new_state, {"loss": loss, "psnr": psnr_val}

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_vanilla_sr_val_step(model, loss_fn, per_sample: bool = False):
    """Paired-batch validation step (inference-mode BatchNorm)."""

    @partial(jax.jit)
    def step(state: TrainState, batch):
        lr_batch, hr_batch = batch
        variables = {"params": state.params}
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats
        pred = state.apply_fn(variables, lr_batch, train=False)
        clipped = jnp.clip(pred.astype(jnp.float32), 0.0, 1.0)
        psnr_v = psnr(hr_batch.astype(jnp.float32), clipped)
        if per_sample:
            return {
                "loss": lift_per_sample(loss_fn)(hr_batch, pred),
                "psnr": psnr_v,
            }
        return {
            "loss": loss_fn(hr_batch, pred),
            "psnr": jnp.mean(psnr_v),
        }

    return step


def make_sr_device_cache_train_step(
    model,
    loss_fn,
    images_u8: jax.Array,
    patch_size: int,
    batch_size: int,
    data_scale: float = DATA_LR_SHRINK,
    donate: bool = True,
    batch_sharding=None,
    grad_accum: int = 1,
):
    """Train step sampling its own batch from a device-resident corpus.

    The host supplies only a PRNG key per step: image choice, crop, LR
    degradation, forward, backward and Adam are one XLA program over HBM
    (zero per-step host->device traffic — see adunet.data.device_cache).
    fit() drives it with a dummy batch iterator + samples_per_step.
    ``batch_sharding``: optional NamedSharding to spread the sampled batch
    over a mesh's data axis (GSPMD then distributes the whole step).

    ``grad_accum=k`` keeps the effective batch at ``batch_size`` while only
    ever materialising activations for ``batch_size/k`` samples: the full HR
    batch is sampled up-front from the SAME key the k=1 step would use (a
    (B, P, P, 3) pixel array — negligible next to one micro-batch's U-Net
    activations), then degrade/forward/backward run per micro-batch under
    lax.scan and ONE update applies the averaged gradients. Identical data
    to the k=1 step with the same rng, so the update matches full-batch math
    exactly up to float summation order. This is how the 138M deep configs
    train from the device cache at large effective batches.
    """
    from adunet.data.device_cache import sample_patch_batch

    if grad_accum < 1:
        raise ValueError(f"grad_accum must be >= 1, got {grad_accum}.")
    if batch_size % grad_accum:
        raise ValueError(
            f"batch_size={batch_size} is not divisible by grad_accum={grad_accum}."
        )

    def step(state: TrainState, batch, rng: jax.Array):
        del batch  # the corpus lives on device; rng IS the data source
        hr_batch = sample_patch_batch(images_u8, rng, batch_size, patch_size)

        if grad_accum == 1:
            if batch_sharding is not None:
                hr_batch = jax.lax.with_sharding_constraint(hr_batch, batch_sharding)
            lr_batch = degrade(hr_batch, data_scale, patch_size)

            def compute_loss(params):
                pred = state.apply_fn({"params": params}, lr_batch)
                return sr_loss_and_metrics(loss_fn, hr_batch, pred)

            (loss, metrics), grads = jax.value_and_grad(compute_loss, has_aux=True)(state.params)
            new_state = state.apply_gradients(grads=grads)
            return new_state, {"loss": loss, **metrics}

        micro = hr_batch.reshape(
            (grad_accum, batch_size // grad_accum) + hr_batch.shape[1:]
        )

        def micro_loss(params, hr_mb):
            if batch_sharding is not None:
                hr_mb = jax.lax.with_sharding_constraint(hr_mb, batch_sharding)
            lr_mb = degrade(hr_mb, data_scale, patch_size)
            pred = state.apply_fn({"params": params}, lr_mb)
            return sr_loss_and_metrics(loss_fn, hr_mb, pred)

        def body(acc, hr_mb):
            (loss, metrics), grads = jax.value_and_grad(micro_loss, has_aux=True)(
                state.params, hr_mb
            )
            acc_g, acc_s = acc
            acc_g = jax.tree_util.tree_map(lambda a, g: a + g, acc_g, grads)
            scalars = {"loss": loss, **metrics}
            acc_s = jax.tree_util.tree_map(
                lambda a, s: a + s.astype(jnp.float32), acc_s, scalars
            )
            return (acc_g, acc_s), None

        zero_g = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        zero_s = {"loss": jnp.zeros((), jnp.float32), "psnr": jnp.zeros((), jnp.float32)}
        (grads, sums), _ = jax.lax.scan(body, (zero_g, zero_s), micro)
        grads = jax.tree_util.tree_map(lambda g: g / grad_accum, grads)
        new_state = state.apply_gradients(grads=grads)
        return new_state, {k: v / grad_accum for k, v in sums.items()}

    return jax.jit(step, donate_argnums=(0,) if donate else ())

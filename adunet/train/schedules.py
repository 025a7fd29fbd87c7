"""LR schedules and optimizer construction.

``cosine_decay_schedule`` reproduces Keras CosineDecay(initial_lr,
decay_steps, alpha) used by seg protocol A
(/root/reference/Segmenation/code/train_adaptive_unet.py:451-460).
Adam hyperparameters are the Keras defaults (b1=0.9, b2=0.999, eps=1e-7).
"""

from __future__ import annotations

import jax.numpy as jnp
import optax

__all__ = ["cosine_decay_schedule", "make_optimizer"]


def cosine_decay_schedule(initial_lr: float, decay_steps: int, alpha: float = 0.0):
    def schedule(step):
        frac = jnp.minimum(step / max(decay_steps, 1), 1.0)
        cosine = 0.5 * (1.0 + jnp.cos(jnp.pi * frac))
        return initial_lr * ((1.0 - alpha) * cosine + alpha)

    return schedule


def make_optimizer(
    learning_rate,
    *,
    cosine_decay_steps: int | None = None,
    cosine_alpha: float = 0.0,
    inject_lr: bool = False,
) -> optax.GradientTransformation:
    """Adam with Keras-default epsilon; optional cosine schedule.

    ``inject_lr=True`` wraps with optax.inject_hyperparams so the learning
    rate lives in the optimizer state and can be rescaled mid-training
    (ReduceLROnPlateau support in the fit loop).
    """
    if cosine_decay_steps is not None:
        if inject_lr:
            # inject_hyperparams re-evaluates an injected SCHEDULE every
            # update, so a ReduceLROnPlateau rescale of
            # hyperparams['learning_rate'] is silently overwritten one step
            # later — the combination cannot do what either caller expects
            raise ValueError(
                "cosine_decay_steps and inject_lr are mutually exclusive: the "
                "schedule would overwrite any runtime learning-rate edit on "
                "the next optimizer update."
            )
        learning_rate = cosine_decay_schedule(learning_rate, cosine_decay_steps, cosine_alpha)
    if inject_lr:
        return optax.inject_hyperparams(optax.adam)(
            learning_rate=learning_rate, b1=0.9, b2=0.999, eps=1e-7
        )
    return optax.adam(learning_rate, b1=0.9, b2=0.999, eps=1e-7)

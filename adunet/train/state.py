"""Train state: params + optimizer + (optional) BatchNorm statistics."""

from __future__ import annotations

from typing import Any, Optional

import jax
import optax
from flax import core
from flax import struct
from flax.training import train_state


class TrainState(train_state.TrainState):
    """flax TrainState extended with mutable batch statistics (seg BN models)."""

    batch_stats: Optional[core.FrozenDict[str, Any]] = struct.field(default=None)


def create_train_state(
    model,
    rng: jax.Array,
    sample_input,
    tx: optax.GradientTransformation,
    train: bool = False,
) -> TrainState:
    """Initialise model variables and wrap them in a TrainState."""
    variables = jax.jit(model.init, static_argnames=("train",))(rng, sample_input, train=train)
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        tx=tx,
        batch_stats=variables.get("batch_stats"),
    )

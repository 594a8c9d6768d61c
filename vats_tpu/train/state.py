"""Train state: params + optimizer + progress counters.

The reference tracks ``tokens_seen`` through its token-budget loop and
serializes it with every checkpoint
(/root/reference/utils/transformers/nlp/checkpointing.py:24-82); here it is a
field of the jitted state so step/token accounting stays on device.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.training import train_state as flax_train_state


class TrainState(flax_train_state.TrainState):
    tokens_seen: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.zeros((), jnp.int32)
    )
    skipped_steps: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.zeros((), jnp.int32)
    )


def create_train_state(
    model,
    tx: optax.GradientTransformation,
    rng: jax.Array,
    sample_batch: jnp.ndarray,
    params: Optional[Any] = None,
) -> TrainState:
    if params is None:
        variables = model.init(rng, sample_batch)
        params = variables["params"]
    return TrainState.create(
        apply_fn=model.apply,
        params=params,
        tx=tx,
        tokens_seen=jnp.zeros((), dtype=jnp.int32),
        skipped_steps=jnp.zeros((), dtype=jnp.int32),
    )

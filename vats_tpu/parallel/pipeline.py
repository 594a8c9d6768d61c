"""GPipe-style pipeline parallelism over a ``stage`` mesh axis.

The last entry in SURVEY.md §2.12's parallelism checklist (the reference has
none; marked optional/low-priority there, provided for completeness).

Design: layer-stacked parameters are sharded along their leading (layer)
axis across S pipeline stages; activations flow stage-to-stage with
``jax.lax.ppermute`` while M microbatches fill the pipe (M + S - 1 ticks,
bubble fraction (S-1)/(M+S-1)).  Everything runs inside one ``shard_map`` —
XLA overlaps each tick's compute with the activation transfer.

The ``stage`` dimension reuses any free mesh axis (callers usually dedicate
``seq`` or ``expert``); the helper is agnostic — pass ``axis_name``.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map


def pipeline_apply(
    block_fn: Callable,
    stacked_params,
    x: jnp.ndarray,
    *,
    mesh: Mesh,
    axis_name: str,
    num_microbatches: int,
):
    """Run ``block_fn`` over pipeline stages.

    block_fn(stage_params, h) -> h applies ONE stage's layers (each stage
    receives its [L/S, ...] slice of ``stacked_params``).
    x: [M * mb, ...] batch, split into M microbatches.
    Returns [M * mb, ...] outputs identical to applying all stages
    sequentially.
    """
    s = mesh.shape[axis_name]
    m = num_microbatches
    if x.shape[0] % m != 0:
        raise ValueError(f"batch {x.shape[0]} not divisible by microbatches {m}")
    mb = x.shape[0] // m
    x_mb = x.reshape(m, mb, *x.shape[1:])

    def local_fn(params_local, x_rep):
        stage = jax.lax.axis_index(axis_name)
        ticks = m + s - 1
        perm = [(d, (d + 1) % s) for d in range(s)]

        state = jnp.zeros_like(x_rep[0])
        outputs = jnp.zeros_like(x_rep)

        def tick(t, carry):
            state, outputs = carry
            # stage 0 injects microbatch t from the (replicated) input
            inject = jnp.logical_and(stage == 0, t < m)
            incoming = jnp.where(
                inject,
                jax.lax.dynamic_index_in_dim(
                    x_rep, jnp.minimum(t, m - 1), axis=0, keepdims=False
                ),
                state,
            )
            active = jnp.logical_and(t - stage >= 0, t - stage < m)
            computed = block_fn(params_local, incoming)
            new_state = jnp.where(active, computed, incoming)
            # last stage emits microbatch t - (s-1)
            emit = jnp.logical_and(stage == s - 1, active)
            out_idx = jnp.clip(t - (s - 1), 0, m - 1)
            outputs = jax.lax.cond(
                emit,
                lambda o: jax.lax.dynamic_update_index_in_dim(
                    o, new_state, out_idx, axis=0
                ),
                lambda o: o,
                outputs,
            )
            # rotate activations to the next stage
            state = jax.lax.ppermute(new_state, axis_name, perm)
            return state, outputs

        _, outputs = jax.lax.fori_loop(0, ticks, tick, (state, outputs))
        # only the last stage holds real outputs; zero elsewhere + psum
        # broadcasts them so the out_spec can be replicated
        outputs = jnp.where(stage == s - 1, outputs, jnp.zeros_like(outputs))
        return jax.lax.psum(outputs, axis_name)

    # params: leading (layer) axis sharded over stages; x: replicated
    param_specs = jax.tree_util.tree_map(
        lambda p: P(axis_name, *([None] * (p.ndim - 1))), stacked_params
    )
    try:
        mapped = shard_map(
            local_fn, mesh=mesh,
            in_specs=(param_specs, P()),
            out_specs=P(),
            check_vma=False,
        )
    except TypeError:  # pragma: no cover
        mapped = shard_map(
            local_fn, mesh=mesh,
            in_specs=(param_specs, P()),
            out_specs=P(),
            check_rep=False,
        )
    out = mapped(stacked_params, x_mb)
    return out.reshape(m * mb, *x.shape[1:])

"""Sharded init / train-step construction over a device mesh.

Given a model whose params carry logical axis names (flax
``with_logical_partitioning``), this resolves every parameter (and optimizer
state) to a NamedSharding via the rules table in vats_tpu.parallel.mesh, jits
init and train-step with those shardings, and lets XLA insert the
collectives: psum over ``data``/``fsdp`` for grads, all_gather/reduce_scatter
for FSDP params, all_to_all over ``expert`` for MoE dispatch, and collectives
over ``tensor`` for TP — all riding ICI.

The reference has no distributed training at all (SURVEY.md §2.12); this
module is the TPU-native parallelism layer.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax.core import meta as flax_meta
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from vats_tpu.parallel.mesh import (
    DEFAULT_LOGICAL_AXIS_RULES,
    logical_to_mesh_spec,
)


def tree_shardings(tree: Any, mesh: Mesh, rules=None) -> Any:
    """Map a (possibly abstract) pytree with LogicallyPartitioned boxes to a
    matching tree of NamedShardings (replicated where unannotated)."""
    rules = rules or DEFAULT_LOGICAL_AXIS_RULES

    def f(x):
        if isinstance(x, flax_meta.AxisMetadata):
            names = getattr(x, "names", None) or ()
            return NamedSharding(mesh, logical_to_mesh_spec(names, rules, mesh))
        return NamedSharding(mesh, PartitionSpec())

    return jax.tree_util.tree_map(
        f, tree, is_leaf=lambda x: isinstance(x, flax_meta.AxisMetadata)
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over data+fsdp."""
    return NamedSharding(
        mesh, logical_to_mesh_spec(("batch",), mesh=mesh)
    )


def choose_mesh_shape(
    n_devices: int, *, context_parallel: bool = False
) -> Dict[str, int]:
    """A sensible default factorization of n devices over the 5 mesh axes,
    exercising dp/fsdp/ep/tp when enough devices exist.  With
    ``context_parallel`` the ``seq`` axis gets 2 shards (for models routing
    attention through ring/Ulysses, configs' ``context_parallel`` field)."""
    if context_parallel:
        if n_devices >= 8 and n_devices % 8 == 0:
            return dict(
                data=n_devices // 8, fsdp=2, expert=1, tensor=2, seq=2
            )
        if n_devices == 4:
            return dict(data=1, fsdp=2, expert=1, tensor=1, seq=2)
        if n_devices == 2:
            return dict(data=1, fsdp=1, expert=1, tensor=1, seq=2)
        raise ValueError(
            f"context-parallel mesh needs an even device count, got {n_devices}"
        )
    if n_devices >= 8 and n_devices % 8 == 0:
        return dict(
            data=n_devices // 8, fsdp=2, expert=2, tensor=2, seq=1
        )
    if n_devices == 4:
        return dict(data=1, fsdp=2, expert=1, tensor=2, seq=1)
    if n_devices == 2:
        return dict(data=1, fsdp=2, expert=1, tensor=1, seq=1)
    return dict(data=1, fsdp=n_devices, expert=1, tensor=1, seq=1)


def make_sharded_train(
    model,
    training_args,
    mesh: Mesh,
    sample_batch: Dict[str, jnp.ndarray],
    *,
    num_training_steps: int = 1000,
    rules=None,
    model_init_fn: Optional[Callable] = None,
    train_step_fn: Optional[Callable] = None,
    tx=None,
) -> Tuple[Callable, Callable, Any]:
    """Build (sharded_init, sharded_train_step, state_shardings).

    sharded_init(rng) -> TrainState laid out per the logical rules.
    sharded_train_step(state, batch, rng) -> (state, metrics), donated state.

    Defaults target TextLM-shaped batches ({'input_ids', ...}); other model
    families pass ``model_init_fn(rng) -> variables`` and a matching
    ``train_step_fn(state, batch, rng)`` (e.g. vision models with
    ``make_vision_train_step``'s raw function and an image-keyed batch).
    """
    from vats_tpu.train.loop import make_train_step_fn
    from vats_tpu.train.optimizer import create_optimizer
    from vats_tpu.train.state import TrainState

    rules = rules or DEFAULT_LOGICAL_AXIS_RULES
    if tx is None:
        tx = create_optimizer(training_args, num_training_steps)
    if model_init_fn is None:
        def model_init_fn(rng):
            return model.init(rng, sample_batch["input_ids"])

    def init_fn(rng):
        variables = model_init_fn(rng)
        return TrainState.create(
            apply_fn=model.apply,
            params=variables["params"],
            tx=tx,
            tokens_seen=jnp.zeros((), jnp.int32),
            skipped_steps=jnp.zeros((), jnp.int32),
        )

    abstract_state = jax.eval_shape(init_fn, jax.random.PRNGKey(0))
    state_shardings = tree_shardings(abstract_state, mesh, rules)
    data_sharding = batch_sharding(mesh)
    batch_shardings = jax.tree_util.tree_map(lambda _: data_sharding, sample_batch)

    with mesh:
        sharded_init = jax.jit(init_fn, out_shardings=state_shardings)

    raw_step = train_step_fn or make_train_step_fn(model, training_args)

    with mesh:
        sharded_step = jax.jit(
            raw_step,
            in_shardings=(
                state_shardings,
                batch_shardings,
                NamedSharding(mesh, PartitionSpec()),
            ),
            out_shardings=(state_shardings, None),
            donate_argnums=(0,),
        )

    def wrapped_init(rng):
        with mesh, nn.logical_axis_rules(rules):
            return sharded_init(rng)

    def wrapped_step(state, batch, rng):
        with mesh, nn.logical_axis_rules(rules):
            return sharded_step(state, batch, rng)

    return wrapped_init, wrapped_step, state_shardings

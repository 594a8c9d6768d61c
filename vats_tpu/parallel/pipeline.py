"""GPipe-style pipeline parallelism over a ``stage`` mesh axis.

The last entry in SURVEY.md §2.12's parallelism checklist (the reference has
none; marked optional/low-priority there, provided for completeness).

Design: layer-stacked parameters are sharded along their leading (layer)
axis across S pipeline stages; activations flow stage-to-stage with
``jax.lax.ppermute`` while M microbatches fill the pipe (M + S - 1 ticks,
bubble fraction (S-1)/(M+S-1)).  Everything runs inside one ``shard_map`` —
XLA overlaps each tick's compute with the activation transfer.

The ``stage`` dimension reuses any free mesh axis (callers usually dedicate
``seq`` or ``expert``); the helpers are agnostic — pass ``axis_name``.

Two entry points:

  * :func:`pipeline_apply` — generic: any per-stage ``block_fn`` over a
    PYTREE of per-microbatch state (each leaf [batch, ...], batch split
    into microbatches).
  * :func:`pipeline_text_lm_apply` — drives :class:`vats_tpu.models.TextLM`'s
    scan-layout parameters through the pipe: embed and head run outside the
    shard_map (replicated / data-sharded as the caller arranged), the
    num_layers block stack runs staged.  Gradient parity vs the sequential
    model is tested in tests/test_pipeline.py.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map


def _shard_map(fn, mesh, in_specs, out_specs):
    try:
        return shard_map(
            fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )
    except TypeError:  # pragma: no cover
        return shard_map(
            fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_rep=False,
        )


def pipeline_apply(
    block_fn: Callable,
    stacked_params,
    x,
    *,
    mesh: Mesh,
    axis_name: str,
    num_microbatches: int,
):
    """Run ``block_fn`` over pipeline stages.

    block_fn(stage_params, state) -> state applies ONE stage's layers (each
    stage receives its [L/S, ...] slice of ``stacked_params``).
    x: a pytree whose leaves are [M * mb, ...] batches (or a single array),
    split into M microbatches along axis 0.
    Returns the same pytree structure with every microbatch having passed
    through all stages in order — identical to applying the stages
    sequentially.
    """
    s = mesh.shape[axis_name]
    m = num_microbatches
    leaves = jax.tree_util.tree_leaves(x)
    if not leaves:
        raise ValueError("pipeline_apply needs at least one state leaf")
    batch = leaves[0].shape[0]
    for leaf in leaves:
        if leaf.shape[0] != batch:
            raise ValueError(
                f"all state leaves must share the batch axis: "
                f"{leaf.shape[0]} != {batch}"
            )
    if batch % m != 0:
        raise ValueError(f"batch {batch} not divisible by microbatches {m}")
    mb = batch // m
    x_mb = jax.tree_util.tree_map(
        lambda a: a.reshape(m, mb, *a.shape[1:]), x
    )

    def local_fn(params_local, x_rep):
        stage = jax.lax.axis_index(axis_name)
        ticks = m + s - 1
        perm = [(d, (d + 1) % s) for d in range(s)]

        tmap = jax.tree_util.tree_map
        state = tmap(lambda a: jnp.zeros_like(a[0]), x_rep)
        outputs = tmap(jnp.zeros_like, x_rep)

        def tick(t, carry):
            state, outputs = carry
            # stage 0 injects microbatch t from the (replicated) input
            inject = jnp.logical_and(stage == 0, t < m)
            t_idx = jnp.minimum(t, m - 1)
            incoming = tmap(
                lambda rep, st: jnp.where(
                    inject,
                    jax.lax.dynamic_index_in_dim(
                        rep, t_idx, axis=0, keepdims=False
                    ),
                    st,
                ),
                x_rep, state,
            )
            active = jnp.logical_and(t - stage >= 0, t - stage < m)
            computed = block_fn(params_local, incoming)
            new_state = tmap(
                lambda c, i: jnp.where(active, c, i), computed, incoming
            )
            # last stage emits microbatch t - (s-1)
            emit = jnp.logical_and(stage == s - 1, active)
            out_idx = jnp.clip(t - (s - 1), 0, m - 1)
            outputs = jax.lax.cond(
                emit,
                lambda o: tmap(
                    lambda ob, ns: jax.lax.dynamic_update_index_in_dim(
                        ob, ns, out_idx, axis=0
                    ),
                    o, new_state,
                ),
                lambda o: o,
                outputs,
            )
            # rotate activations to the next stage
            state = tmap(
                lambda a: jax.lax.ppermute(a, axis_name, perm), new_state
            )
            return state, outputs

        _, outputs = jax.lax.fori_loop(0, ticks, tick, (state, outputs))
        # only the last stage holds real outputs; zero elsewhere + psum
        # broadcasts them so the out_spec can be replicated
        def collect(o):
            z = jnp.where(stage == s - 1, o, jnp.zeros_like(o))
            return jax.lax.psum(z, axis_name)

        return tmap(collect, outputs)

    # params: leading (layer) axis sharded over stages; x: replicated
    param_specs = jax.tree_util.tree_map(
        lambda p: P(axis_name, *([None] * (p.ndim - 1))), stacked_params
    )
    x_specs = jax.tree_util.tree_map(lambda _: P(), x_mb)
    mapped = _shard_map(
        local_fn, mesh, in_specs=(param_specs, x_specs), out_specs=x_specs
    )
    out = mapped(stacked_params, x_mb)
    return jax.tree_util.tree_map(
        lambda a: a.reshape(m * mb, *a.shape[2:]), out
    )


def pipeline_text_lm_apply(
    model,
    variables,
    input_ids: jnp.ndarray,
    padding_mask: Optional[jnp.ndarray] = None,
    *,
    mesh: Mesh,
    axis_name: str = "stage",
    num_microbatches: int,
):
    """TextLM forward with the block stack staged across ``axis_name``.

    ``variables`` must be in scan layout (``cfg.scan_layers=True`` — params
    under ``layers/block`` stacked on a leading layer axis).  num_layers must
    divide the stage count.  Embed, final norm and lm_head run outside the
    pipe.  Returns (logits [B, T, V] fp32, aux_loss scalar) — same numbers
    as ``model.apply`` (tests/test_pipeline.py asserts gradient parity).

    Training integration: VERDICT r2 item 9.  Deterministic only (pipeline
    training runs with dropout folded out — the reference has no dropout in
    its own hot configs either).
    """
    from flax import linen as nn

    from vats_tpu.models.text_lm import TransformerBlock, resolve_dtype
    from vats_tpu.nn.norms import RMSNorm

    cfg = model.cfg
    p = variables["params"]
    if "layers" not in p:
        raise ValueError(
            "pipeline_text_lm_apply needs scan-layout params "
            "(cfg.scan_layers=True); got per-layer subtrees"
        )
    s = mesh.shape[axis_name]
    if cfg.num_layers % s != 0:
        raise ValueError(
            f"num_layers ({cfg.num_layers}) must divide into {s} stages"
        )
    dtype = resolve_dtype(cfg.dtype)
    param_dtype = resolve_dtype(cfg.param_dtype)

    embed = nn.Embed(
        num_embeddings=cfg.vocab_size,
        features=cfg.d_model,
        dtype=dtype,
        param_dtype=param_dtype,
    )
    x = embed.apply(
        {"params": p["token_embed"]}, input_ids.astype(jnp.int32)
    )

    blk = TransformerBlock(cfg)
    b = input_ids.shape[0]
    state = {
        "x": x,
        # per-example aux shares: summed at the end = sum of block auxes
        "aux": jnp.zeros((b,), jnp.float32),
    }
    if padding_mask is not None:
        state["mask"] = padding_mask.astype(jnp.int8)

    mb = b // num_microbatches

    def stage_fn(stage_params, st):
        mask = st["mask"].astype(bool) if "mask" in st else None

        def body(carry, layer_params):
            h, aux = carry
            h, _, a = blk.apply(
                {"params": layer_params}, h, mask, None, None, None, 0, True
            )
            return (h, aux + a.astype(jnp.float32) / mb), None

        (h, aux), _ = jax.lax.scan(
            body, (st["x"], st["aux"]), stage_params
        )
        out = {"x": h, "aux": aux}
        if "mask" in st:
            out["mask"] = st["mask"]
        return out

    out_state = pipeline_apply(
        stage_fn,
        p["layers"]["block"],
        state,
        mesh=mesh,
        axis_name=axis_name,
        num_microbatches=num_microbatches,
    )
    x = out_state["x"]
    total_aux = jnp.sum(out_state["aux"])

    norm = RMSNorm(cfg.d_model, cfg.rms_norm_eps, dtype, param_dtype)
    # TextLM names its final norm module RMSNorm_0 (sole anonymous RMSNorm)
    x = norm.apply({"params": p["RMSNorm_0"]}, x)

    if cfg.tie_weights:
        logits = embed.apply(
            {"params": p["token_embed"]},
            x.astype(param_dtype),
            method=nn.Embed.attend,
        )
    else:
        head = nn.DenseGeneral(
            features=cfg.vocab_size, use_bias=False,
            dtype=dtype, param_dtype=param_dtype,
        )
        logits = head.apply({"params": p["lm_head"]}, x)
    return logits.astype(jnp.float32), total_aux

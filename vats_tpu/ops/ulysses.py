"""Ulysses sequence parallelism: all-to-all head/sequence exchange.

The alternative to ring attention (SURVEY.md §2.12): instead of rotating KV
blocks, one ``all_to_all`` over the ``seq`` mesh axis converts
sequence-sharded Q/K/V into head-sharded full-sequence tensors, each device
runs ordinary full attention on its head slice, and a second all_to_all
restores sequence sharding.  Two collectives total — cheaper than a ring
when the window/causal structure doesn't let ring steps skip, and it
composes with the flash kernel since each device sees the full sequence.

Requires num_q_heads % seq_shards == 0 and num_kv_heads % seq_shards == 0.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from vats_tpu.ops.attention_xla import dot_product_attention


def ulysses_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    mesh: Mesh,
    scale: float,
    causal: bool = True,
    left_window: int = -1,
    right_window: int = -1,
    kv_valid: Optional[jnp.ndarray] = None,
    axis_name: str = "seq",
    batch_axes: tuple = ("data", "fsdp"),
) -> jnp.ndarray:
    """q: [B, T, Hq, hd]; k/v: [B, T, G, hd], sequence-sharded on T.

    kv_valid: optional [B, T] bool padding mask (True = real), sharded like k
    on T; it is all-gathered inside so every head shard masks the full
    sequence.  Returns [B, T, Hq, hd] with the same sharding.
    """
    n = mesh.shape[axis_name]
    hq, g = q.shape[2], k.shape[2]
    if hq % n != 0 or g % n != 0:
        raise ValueError(
            f"Ulysses needs heads divisible by seq shards: Hq={hq}, G={g}, "
            f"shards={n} (use ring_attention otherwise)"
        )

    def local_fn(q_l, k_l, v_l, valid_l):
        # [B, T/n, H, hd] -> all_to_all -> [B, T, H/n, hd]
        def seq_to_head(x):
            return jax.lax.all_to_all(
                x, axis_name, split_axis=2, concat_axis=1, tiled=True
            )

        def head_to_seq(x):
            return jax.lax.all_to_all(
                x, axis_name, split_axis=1, concat_axis=2, tiled=True
            )

        qh = seq_to_head(q_l)
        kh = seq_to_head(k_l)
        vh = seq_to_head(v_l)
        valid_full = jax.lax.all_gather(
            valid_l, axis_name, axis=1, tiled=True
        )  # [B, T]
        out = dot_product_attention(
            qh, kh, vh,
            scale=scale,
            causal=causal,
            left_window=left_window,
            right_window=right_window,
            kv_valid=valid_full,
        )
        return head_to_seq(out)

    if kv_valid is None:
        kv_valid = jnp.ones(q.shape[:2], dtype=bool)
    bspec = batch_axes if any(mesh.shape.get(a, 1) > 1 for a in batch_axes) else None
    spec = P(bspec, axis_name, None, None)
    mspec = P(bspec, axis_name)
    try:
        mapped = shard_map(
            local_fn, mesh=mesh, in_specs=(spec, spec, spec, mspec),
            out_specs=spec, check_vma=False,
        )
    except TypeError:  # pragma: no cover - older jax kwarg name
        mapped = shard_map(
            local_fn, mesh=mesh, in_specs=(spec, spec, spec, mspec),
            out_specs=spec, check_rep=False,
        )
    return mapped(q, k, v, kv_valid)

"""Ring attention: context-parallel attention over the ``seq`` mesh axis.

The reference has no sequence/context parallelism of any kind (SURVEY.md
§2.12, §5) — long context is handled only by sliding windows.  This is the
TPU-native addition: Q, K, V are sharded along the sequence axis across the
``seq`` mesh ring; KV blocks rotate around the ring via ``jax.lax.ppermute``
(point-to-point over ICI) while each device accumulates its queries' partial
attention with the online-softmax correction — communication overlaps with
compute, total traffic equals one all-gather but is pipelined.

Causal masking accounts for each KV block's absolute offset (blocks entirely
in the future are masked; XLA removes their contribution cheaply since the
mask makes exp() zero).  Sliding windows are honored the same way.

The inner per-block math reuses the grouped-KV layout of
ops.attention_xla (no repeated KV heads).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from vats_tpu.ops.attention_xla import DEFAULT_MASK_VALUE


def _block_attention_stats(q, k, v, scale, q_pos, k_pos, causal, left_window,
                           right_window, kv_valid=None):
    """Partial attention of q against one KV block -> (scores_exp@V, m, l).

    q: [B, Tq, G, N, hd] fp32; k/v: [B, Tk, G, hd] fp32; kv_valid: optional
    [B, Tk] bool (True = real token) for this block.
    Returns (o_partial [B, Tq, G, N, hd], m [B, G, N, Tq, 1], l like m).
    """
    s = jnp.einsum("btgnd,bsgd->bgnts", q, k) * scale  # [B,G,N,Tq,Tk]
    mask = jnp.ones((q_pos.shape[0], k_pos.shape[0]), dtype=bool)
    qp = q_pos[:, None]
    kp = k_pos[None, :]
    if causal:
        mask &= kp <= qp
    elif right_window >= 0:
        mask &= (kp - qp) <= right_window
    if left_window >= 0:
        mask &= (qp - kp) <= left_window
    mask = mask[None, None, None]  # [1,1,1,Tq,Tk]
    if kv_valid is not None:
        mask = mask & kv_valid[:, None, None, None, :]  # [B,1,1,Tq,Tk]
    s = jnp.where(mask, s, DEFAULT_MASK_VALUE)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = jnp.where(mask, p, 0.0)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.einsum("bgnts,bsgd->btgnd", p, v)
    return o, m, l


def ring_attention(
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
    """Context-parallel attention.

    q: [B, T, Hq, hd]; k/v: [B, T, G, hd], all sharded on T over
    ``axis_name`` (and on B over ``batch_axes``).  kv_valid: optional [B, T]
    bool padding mask (True = real token), sharded like k on T — the validity
    shard rotates around the ring with its KV block.  Returns [B, T, Hq, hd]
    with the same sharding.
    """
    n_seq = mesh.shape[axis_name]
    b, t, hq, hd = q.shape
    g = k.shape[2]
    n = hq // g
    t_local = t // n_seq
    if kv_valid is None:
        kv_valid = jnp.ones((b, t), dtype=bool)

    def local_fn(q_l, k_l, v_l, valid_l):
        idx = jax.lax.axis_index(axis_name)
        qf = q_l.astype(jnp.float32).reshape(b_local(q_l), t_local, g, n, hd)
        q_pos = idx * t_local + jnp.arange(t_local)

        m_acc = jnp.full((qf.shape[0], g, n, t_local, 1), -jnp.inf, jnp.float32)
        l_acc = jnp.zeros_like(m_acc)
        o_acc = jnp.zeros_like(qf)

        k_blk = k_l.astype(jnp.float32)
        v_blk = v_l.astype(jnp.float32)
        valid_blk = valid_l

        def step(i, carry):
            m_acc, l_acc, o_acc, k_blk, v_blk, valid_blk = carry
            src = (idx - i) % n_seq  # which shard this block came from
            k_pos = src * t_local + jnp.arange(t_local)
            o_p, m_p, l_p = _block_attention_stats(
                qf, k_blk, v_blk, scale, q_pos, k_pos,
                causal, left_window, right_window, kv_valid=valid_blk,
            )
            m_new = jnp.maximum(m_acc, m_p)
            alpha = jnp.exp(m_acc - m_new)
            beta = jnp.exp(m_p - m_new)
            l_new = alpha * l_acc + beta * l_p
            # o accumulators are unnormalized sums of exp() @ V;
            # reshape correction factors [B,G,N,Tq,1] -> [B,Tq,G,N,1]
            alpha_o = jnp.transpose(alpha, (0, 3, 1, 2, 4))
            beta_o = jnp.transpose(beta, (0, 3, 1, 2, 4))
            o_new = o_acc * alpha_o + o_p * beta_o
            # rotate KV (and its validity) to the next device
            perm = [(d, (d + 1) % n_seq) for d in range(n_seq)]
            k_nxt = jax.lax.ppermute(k_blk, axis_name, perm)
            v_nxt = jax.lax.ppermute(v_blk, axis_name, perm)
            valid_nxt = jax.lax.ppermute(valid_blk, axis_name, perm)
            return m_new, l_new, o_new, k_nxt, v_nxt, valid_nxt

        m_acc, l_acc, o_acc, _, _, _ = jax.lax.fori_loop(
            0, n_seq, step, (m_acc, l_acc, o_acc, k_blk, v_blk, valid_blk)
        )
        l_o = jnp.transpose(l_acc, (0, 3, 1, 2, 4))
        out = o_acc / jnp.maximum(l_o, 1e-30)
        return out.reshape(qf.shape[0], t_local, hq, hd).astype(q_l.dtype)

    def b_local(x):
        return x.shape[0]

    bspec = batch_axes if any(mesh.shape.get(a, 1) > 1 for a in batch_axes) else None
    qspec = P(bspec, axis_name, None, None)
    mspec = P(bspec, axis_name)
    try:  # jax >= 0.8 renamed check_rep -> check_vma
        mapped = shard_map(
            local_fn, mesh=mesh, in_specs=(qspec, qspec, qspec, mspec),
            out_specs=qspec, check_vma=False,
        )
    except TypeError:
        mapped = shard_map(
            local_fn, mesh=mesh, in_specs=(qspec, qspec, qspec, mspec),
            out_specs=qspec, check_rep=False,
        )
    return mapped(q, k, v, kv_valid)

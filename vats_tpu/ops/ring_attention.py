"""Ring attention: context-parallel attention over the ``seq`` mesh axis.

The reference has no sequence/context parallelism of any kind (SURVEY.md
§2.12, §5) — long context is handled only by sliding windows.  This is the
TPU-native addition: Q, K, V are sharded along the sequence axis across the
``seq`` mesh ring; KV blocks rotate around the ring via ``jax.lax.ppermute``
(point-to-point over ICI) while each device accumulates its queries' partial
attention with the online-softmax correction — communication overlaps with
compute, total traffic equals one all-gather but is pipelined.

Memory/scale design (this is the op that exists FOR 32k+ contexts):

  * **Blockwise inner loop** — scores are materialized only per
    (q_chunk × k_chunk) tile ([B, G, N, qc, kc] fp32, default 512×512),
    never per whole KV shard: at T_local=16k the full-block scores the
    round-2 version kept live would be ~terabytes.  The q-chunk scan
    carries that chunk's online-softmax stats; the k-chunk scan streams the
    rotating KV shard through them (the XLA mirror of the Pallas flash
    kernel's grid).
  * **Whole-block skipping** — a ring step whose KV shard is entirely
    masked for every local query (future shard under causal, or past the
    sliding window) skips all compute via ``lax.cond`` (the rotation still
    runs; it is the loop carry).
  * **Window-bounded trip count** — under causal + ``left_window`` the
    number of ring steps that can contribute is static:
    ``1 + floor((left_window + t_local - 1) / t_local)`` — hops fully
    outside the window are never taken at all (SURVEY §5: "window bounds
    make ring passes mostly skippable").
  * KV rotates in its storage dtype (bf16 traffic over ICI); upcasts to
    fp32 happen per chunk inside the tile compute.

Causal masking accounts for each KV block's absolute offset; sliding
windows are honored the same way.  The inner per-block math reuses the
grouped-KV layout of ops.attention_xla (no repeated KV heads).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from vats_tpu.ops.attention_xla import DEFAULT_MASK_VALUE


def _pick_chunk(t_local: int, target: int) -> int:
    """Largest divisor of t_local that is <= target (chunk shapes must tile
    the shard exactly; static shapes keep XLA happy)."""
    c = min(t_local, target)
    while t_local % c != 0:
        c -= 1
    return c


def _tile_update(q_c, k_c, v_c, scale, q_pos_c, k_pos_c, causal, left_window,
                 right_window, valid_c, m, l, o):
    """One online-softmax update of a q chunk's stats from one KV chunk.

    q_c: [B, qc, G, N, hd] (storage dtype); k_c/v_c: [B, kc, G, hd];
    valid_c: [B, kc] bool; m/l: [B, G, N, qc, 1] fp32; o: [B, qc, G, N, hd]
    fp32 (unnormalized).  Only the [B, G, N, qc, kc] tile is live."""
    s = jnp.einsum(
        "btgnd,bsgd->bgnts", q_c, k_c, preferred_element_type=jnp.float32
    ) * scale
    mask = jnp.ones((q_pos_c.shape[0], k_pos_c.shape[0]), dtype=bool)
    qp = q_pos_c[:, None]
    kp = k_pos_c[None, :]
    if causal:
        mask &= kp <= qp
    elif right_window >= 0:
        mask &= (kp - qp) <= right_window
    if left_window >= 0:
        mask &= (qp - kp) <= left_window
    mask = mask[None, None, None]  # [1,1,1,qc,kc]
    mask = mask & valid_c[:, None, None, None, :]
    s = jnp.where(mask, s, DEFAULT_MASK_VALUE)

    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m, m_cur)
    alpha = jnp.exp(m - m_new)
    p = jnp.exp(s - m_new)
    p = jnp.where(mask, p, 0.0)
    l_new = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
    alpha_o = jnp.transpose(alpha, (0, 3, 1, 2, 4))  # [B,qc,G,N,1]
    o_new = o * alpha_o + jnp.einsum(
        "bgnts,bsgd->btgnd", p, v_c.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    return m_new, l_new, o_new


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
    q_chunk: int = 512,
    k_chunk: int = 512,
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
    qc = _pick_chunk(t_local, q_chunk)
    kc = _pick_chunk(t_local, k_chunk)
    nq, nk = t_local // qc, t_local // kc
    if kv_valid is None:
        kv_valid = jnp.ones((b, t), dtype=bool)

    # ring steps that can possibly contribute: under causal + sliding window
    # a KV shard i hops back is fully outside every local query's window once
    # i*t_local - (t_local - 1) > left_window — those hops never run
    n_steps = n_seq
    if causal and left_window >= 0:
        n_steps = min(n_seq, 1 + (left_window + t_local - 1) // t_local)

    def local_fn(q_l, k_l, v_l, valid_l):
        idx = jax.lax.axis_index(axis_name)
        bl = q_l.shape[0]
        q_pos = idx * t_local + jnp.arange(t_local)
        # chunked views, chunk axis leading for lax.scan
        q_ch = q_l.reshape(bl, nq, qc, g, n, hd).transpose(1, 0, 2, 3, 4, 5)
        qpos_ch = q_pos.reshape(nq, qc)

        m0 = jnp.full((nq, bl, g, n, qc, 1), -jnp.inf, jnp.float32)
        l0 = jnp.zeros_like(m0)
        o0 = jnp.zeros((nq, bl, qc, g, n, hd), jnp.float32)

        def step(i, carry):
            m_acc, l_acc, o_acc, k_blk, v_blk, valid_blk = carry
            src = (idx - i) % n_seq  # which shard this block came from
            k_pos0 = src * t_local

            # whole-block skip: the shard is entirely in the future (causal)
            # or entirely left of the window for every local query
            skip = jnp.asarray(False)
            if causal:
                skip = skip | (src > idx)
                if left_window >= 0:
                    skip = skip | (
                        (idx - src) * t_local - (t_local - 1) > left_window
                    )
            else:
                if right_window >= 0:
                    skip = skip | (
                        (src - idx) * t_local - (t_local - 1) > right_window
                    )
                if left_window >= 0:
                    skip = skip | (
                        (idx - src) * t_local - (t_local - 1) > left_window
                    )

            k_ch = k_blk.reshape(bl, nk, kc, g, hd).transpose(1, 0, 2, 3, 4)
            v_ch = v_blk.reshape(bl, nk, kc, g, hd).transpose(1, 0, 2, 3, 4)
            valid_ch = valid_blk.reshape(bl, nk, kc).transpose(1, 0, 2)

            def compute(operands):
                m_a, l_a, o_a = operands

                def q_body(_, xs):
                    q_c, qpos_c, m_c, l_c, o_c = xs

                    def k_body(carry2, xs2):
                        k_c, v_c, val_c, j = xs2
                        m_c, l_c, o_c = carry2
                        kpos_c = k_pos0 + j * kc + jnp.arange(kc)
                        return (
                            _tile_update(
                                q_c, k_c, v_c, scale, qpos_c, kpos_c,
                                causal, left_window, right_window,
                                val_c, m_c, l_c, o_c,
                            ),
                            None,
                        )

                    (m_c, l_c, o_c), _ = jax.lax.scan(
                        k_body, (m_c, l_c, o_c),
                        (k_ch, v_ch, valid_ch, jnp.arange(nk)),
                    )
                    return None, (m_c, l_c, o_c)

                _, (m_n, l_n, o_n) = jax.lax.scan(
                    q_body, None, (q_ch, qpos_ch, m_a, l_a, o_a)
                )
                return m_n, l_n, o_n

            m_acc, l_acc, o_acc = jax.lax.cond(
                skip, lambda ops: ops, compute, (m_acc, l_acc, o_acc)
            )

            # rotate KV (and its validity) to the next device — in storage
            # dtype: bf16 shards halve the ICI bytes vs an fp32 upcast
            perm = [(d, (d + 1) % n_seq) for d in range(n_seq)]
            k_nxt = jax.lax.ppermute(k_blk, axis_name, perm)
            v_nxt = jax.lax.ppermute(v_blk, axis_name, perm)
            valid_nxt = jax.lax.ppermute(valid_blk, axis_name, perm)
            return m_acc, l_acc, o_acc, k_nxt, v_nxt, valid_nxt

        m_acc, l_acc, o_acc, _, _, _ = jax.lax.fori_loop(
            0, n_steps, step, (m0, l0, o0, k_l, v_l, valid_l)
        )
        l_o = jnp.transpose(l_acc, (0, 1, 4, 2, 3, 5))  # [nq,B,qc,G,N,1]
        out = o_acc / jnp.maximum(l_o, 1e-30)
        out = out.transpose(1, 0, 2, 3, 4, 5).reshape(bl, t_local, hq, hd)
        return out.astype(q_l.dtype)

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

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


def _ring_attention_xla(
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


# --------------------------------------------------------------------------
# Ring-flash: the ppermute rotation stays in XLA; every local tile compute
# runs through the Pallas flash kernel (ops/flash_attention.py) with a
# STATIC per-hop ``q_pos_offset`` into the kernel's causal/window masking.
#
# The per-hop offset is static because the ring is unrolled: at hop i a
# device holds the KV shard from ``(idx - i) % n_seq``, so the query-vs-key
# absolute offset is ``i * t_local`` for the un-wrapped devices and
# ``(i - n_seq) * t_local`` for the wrapped ones — two compile-time
# constants selected by one scalar ``lax.cond`` (wrapped shards are
# entirely in the future, so under causal masking the wrapped branch is
# statically dead and the cond degenerates to a skip).
#
# Per-hop partial results merge by the standard (o, lse) log-sum-exp
# combine; the backward is the ring-flash backward proper: the SAME Pallas
# backward kernels run per hop against the globally-merged (lse, di)
# statistics — each hop then yields exactly that KV shard's slice of the
# global gradient — with dK/dV accumulators rotating alongside their KV
# shard and one final ppermute sending them home.
# --------------------------------------------------------------------------

import dataclasses
import functools

from vats_tpu.ops.flash_attention import (
    NUM_LANES,
    _flash_bwd_kernels,
    _flash_forward,
    bwd_block_defaults,
)


@dataclasses.dataclass(frozen=True)
class _RingCfg:
    axis_name: str
    n_seq: int
    t_local: int
    scale: float
    causal: bool
    left_window: int
    right_window: int
    block_q: int
    block_k: int
    bwd_block_q: int
    bwd_block_k: int
    interpret: bool
    use_segids: bool


def _ring_steps(cfg: _RingCfg):
    """Static per-hop plan: list of (past_alive, future_alive).

    ``past``  = un-wrapped sources (idx >= i), offset  i * t_local >= 0;
    ``future``= wrapped sources   (idx <  i), offset (i - n) * t_local < 0.
    A branch is dead when the whole shard lies outside the causal/window
    bounds for every local query — those hops never touch the kernel."""
    tl, n = cfg.t_local, cfg.n_seq
    plan = []
    for i in range(n):
        past = True
        if i > 0 and cfg.left_window >= 0 and i * tl - (tl - 1) > cfg.left_window:
            past = False
        future = i > 0 and not cfg.causal
        if future and cfg.right_window >= 0 and (n - i) * tl - (tl - 1) > cfg.right_window:
            future = False
        plan.append((past, future))
    while plan and plan[-1] == (False, False):
        plan.pop()
    return plan


def _merge(o, lse, o_i, lse_i):
    """Combine normalized per-hop outputs via their logsumexps (fp32)."""
    # the kernel stores a 1e30 sentinel for zero-mass rows; treat as -inf
    lse_i = jnp.where(lse_i > 1e29, -jnp.inf, lse_i)
    m = jnp.maximum(lse, lse_i)
    finite = m > -jnp.inf
    m_safe = jnp.where(finite, m, 0.0)
    a = jnp.where(finite, jnp.exp(lse - m_safe), 0.0)
    b = jnp.where(finite, jnp.exp(lse_i - m_safe), 0.0)
    # floor well above FLT_MIN: subnormals flush to zero on TPU/XLA-CPU,
    # and a+b == 0 exactly on fully-masked rows (0/0 -> NaN otherwise)
    denom = jnp.maximum(a + b, 1e-30)
    o_new = (
        o * (a / denom)[..., None]
        + o_i.astype(jnp.float32) * (b / denom)[..., None]
    )
    lse_new = jnp.where(finite, m_safe + jnp.log(a + b), -jnp.inf)
    return o_new, lse_new


def _fwd_clamp_blocks(cfg: _RingCfg):
    tl = cfg.t_local
    bq = -(-min(cfg.block_q, max(tl, 8)) // 8) * 8
    bk = -(-min(cfg.block_k, max(tl, 8)) // NUM_LANES) * NUM_LANES
    return bq, bk


def _ring_flash_fwd_impl(q, k, v, valid, qseg, kseg, cfg: _RingCfg):
    """q: [B, Hq, tl, D]; k/v: [B, G, tl, D]; valid/qseg/kseg: [B, tl].
    Returns (out [B, Hq, tl, D] q.dtype, lse [B, Hq, tl] fp32)."""
    idx = jax.lax.axis_index(cfg.axis_name)
    b, hq, tl, d = q.shape
    bq, bk = _fwd_clamp_blocks(cfg)
    plan = _ring_steps(cfg)
    perm = [(s, (s + 1) % cfg.n_seq) for s in range(cfg.n_seq)]

    o = jnp.zeros((b, hq, tl, d), jnp.float32)
    lse = jnp.full((b, hq, tl), -jnp.inf, jnp.float32)
    blk = (k, v, valid, kseg)

    for i, (past, future) in enumerate(plan):
        k_i, v_i, valid_i, kseg_i = blk

        def compute(offset, k_i=k_i, v_i=v_i, valid_i=valid_i, kseg_i=kseg_i):
            o_i, lse8 = _flash_forward(
                q, k_i, v_i, valid_i, qseg, kseg_i, cfg.scale, cfg.causal,
                cfg.left_window, cfg.right_window, bq, bk, cfg.interpret,
                cfg.use_segids, return_lse=True, q_pos_offset=offset,
            )
            return o_i, lse8[:, :, 0, :tl]

        def dead():
            return (
                jnp.zeros((b, hq, tl, d), q.dtype),
                jnp.full((b, hq, tl), 1e30, jnp.float32),
            )

        if i == 0:
            o_i, lse_i = compute(0)
        elif past and future:
            o_i, lse_i = jax.lax.cond(
                idx >= i,
                functools.partial(compute, i * tl),
                functools.partial(compute, (i - cfg.n_seq) * tl),
            )
        elif past:
            o_i, lse_i = jax.lax.cond(
                idx >= i, functools.partial(compute, i * tl), dead
            )
        elif future:
            o_i, lse_i = jax.lax.cond(
                idx < i,
                functools.partial(compute, (i - cfg.n_seq) * tl),
                dead,
            )
        else:  # rotation-only hop (a later hop still needs the shard)
            o_i = None
        if o_i is not None:
            o, lse = _merge(o, lse, o_i, lse_i)
        if i < len(plan) - 1:
            blk = tuple(
                jax.lax.ppermute(x, cfg.axis_name, perm) for x in blk
            )

    return o.astype(q.dtype), lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _ring_flash(q, k, v, valid, qseg, kseg, cfg):
    out, _ = _ring_flash_fwd_impl(q, k, v, valid, qseg, kseg, cfg)
    return out


def _ring_flash_fwd(q, k, v, valid, qseg, kseg, cfg):
    out, lse = _ring_flash_fwd_impl(q, k, v, valid, qseg, kseg, cfg)
    return out, (q, k, v, valid, qseg, kseg, out, lse)


def _ring_flash_bwd(cfg: _RingCfg, res, do):
    q, k, v, valid, qseg, kseg, out, lse = res
    idx = jax.lax.axis_index(cfg.axis_name)
    b, hq, tl, d = q.shape
    g = k.shape[1]
    bq, bk = _fwd_clamp_blocks(cfg)
    bwd_bq, bwd_bk = bwd_block_defaults(
        bq, bk, cfg.bwd_block_q, cfg.bwd_block_k
    )
    plan = _ring_steps(cfg)
    perm = [(s, (s + 1) % cfg.n_seq) for s in range(cfg.n_seq)]

    # globally-merged row statistics: rows with no mass anywhere get a +big
    # sentinel so every per-hop p = exp(s - lse) underflows to zero
    lse_safe = jnp.where(jnp.isfinite(lse), lse, 1e30)
    di = jnp.sum(
        do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
    )  # [B, Hq, tl]

    dq = jnp.zeros((b, hq, tl, d), jnp.float32)
    dk_t = jnp.zeros((b, g, tl, d), jnp.float32)  # travels with its shard
    dv_t = jnp.zeros((b, g, tl, d), jnp.float32)
    blk = (k, v, valid, kseg, dk_t, dv_t)

    for i, (past, future) in enumerate(plan):
        k_i, v_i, valid_i, kseg_i, dk_i, dv_i = blk

        def grads(offset, k_i=k_i, v_i=v_i, valid_i=valid_i, kseg_i=kseg_i):
            return _flash_bwd_kernels(
                q, k_i, v_i, do, lse_safe, di, valid_i, qseg, kseg_i,
                scale=cfg.scale, causal=cfg.causal,
                left_window=cfg.left_window, right_window=cfg.right_window,
                block_q=bwd_bq, block_k=bwd_bk, interpret=cfg.interpret,
                use_segids=cfg.use_segids, q_pos_offset=offset,
            )

        def dead():
            return (
                jnp.zeros((b, hq, tl, d), jnp.float32),
                jnp.zeros((b, g, tl, d), jnp.float32),
                jnp.zeros((b, g, tl, d), jnp.float32),
            )

        if i == 0:
            dq_i, dk_c, dv_c = grads(0)
        elif past and future:
            dq_i, dk_c, dv_c = jax.lax.cond(
                idx >= i,
                functools.partial(grads, i * tl),
                functools.partial(grads, (i - cfg.n_seq) * tl),
            )
        elif past:
            dq_i, dk_c, dv_c = jax.lax.cond(
                idx >= i, functools.partial(grads, i * tl), dead
            )
        elif future:
            dq_i, dk_c, dv_c = jax.lax.cond(
                idx < i,
                functools.partial(grads, (i - cfg.n_seq) * tl),
                dead,
            )
        else:
            dq_i = None
        if dq_i is not None:
            dq = dq + dq_i
            dk_i = dk_i + dk_c
            dv_i = dv_i + dv_c
        blk = (k_i, v_i, valid_i, kseg_i, dk_i, dv_i)
        if i < len(plan) - 1:
            blk = tuple(
                jax.lax.ppermute(x, cfg.axis_name, perm) for x in blk
            )

    # after len(plan)-1 hops a shard's grads sit len(plan)-1 devices ahead
    # of home; one distance-(len(plan)-1) ppermute returns them
    hops = len(plan) - 1
    dk_t, dv_t = blk[4], blk[5]
    if hops:
        home = [(s, (s - hops) % cfg.n_seq) for s in range(cfg.n_seq)]
        dk_t = jax.lax.ppermute(dk_t, cfg.axis_name, home)
        dv_t = jax.lax.ppermute(dv_t, cfg.axis_name, home)

    return (
        dq.astype(q.dtype), dk_t.astype(k.dtype), dv_t.astype(v.dtype),
        None, None, None,
    )


_ring_flash.defvjp(_ring_flash_fwd, _ring_flash_bwd)


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
    q_segment_ids: Optional[jnp.ndarray] = None,
    kv_segment_ids: Optional[jnp.ndarray] = None,
    axis_name: str = "seq",
    batch_axes: tuple = ("data", "fsdp"),
    q_chunk: int = 512,
    k_chunk: int = 512,
    impl: str = "flash",
    block_q: int = 1024,
    block_k: int = 1024,
    bwd_block_q: int = 0,
    bwd_block_k: int = 0,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Context-parallel attention (see module docstring).

    q: [B, T, Hq, hd]; k/v: [B, T, G, hd], all sharded on T over
    ``axis_name`` (and on B over ``batch_axes``).  kv_valid: optional [B, T]
    bool padding mask (True = real token); segment ids: optional [B, T] int
    packed-sequence ids — both sharded like k on T and rotated around the
    ring with their KV shard.  Returns [B, T, Hq, hd], same sharding.

    impl="flash" (default) runs every local tile through the Pallas flash
    kernel (SURVEY §5's ring-flash kernel; interpret mode auto-selected off
    TPU); impl="xla" is the blockwise XLA fallback (no segment-id support).
    """
    if impl == "xla":
        if q_segment_ids is not None or kv_segment_ids is not None:
            raise NotImplementedError(
                "segment ids need impl='flash' (masks rotate with KV shards)"
            )
        return _ring_attention_xla(
            q, k, v, mesh=mesh, scale=scale, causal=causal,
            left_window=left_window, right_window=right_window,
            kv_valid=kv_valid, axis_name=axis_name, batch_axes=batch_axes,
            q_chunk=q_chunk, k_chunk=k_chunk,
        )
    if impl != "flash":
        raise ValueError(f"unknown ring impl: {impl!r}")

    n_seq = mesh.shape[axis_name]
    b, t, hq, hd = q.shape
    g = k.shape[2]
    if t % n_seq != 0:
        raise ValueError(f"T={t} not divisible by seq shards {n_seq}")
    t_local = t // n_seq
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    use_segids = q_segment_ids is not None or kv_segment_ids is not None
    if kv_valid is None:
        kv_valid = jnp.ones((b, t), dtype=bool)
    if q_segment_ids is None:
        q_segment_ids = jnp.zeros((b, t), dtype=jnp.int32)
    if kv_segment_ids is None:
        kv_segment_ids = jnp.zeros((b, t), dtype=jnp.int32)

    cfg = _RingCfg(
        axis_name=axis_name, n_seq=n_seq, t_local=t_local, scale=float(scale),
        causal=bool(causal), left_window=int(left_window),
        right_window=int(right_window), block_q=int(block_q),
        block_k=int(block_k), bwd_block_q=int(bwd_block_q),
        bwd_block_k=int(bwd_block_k), interpret=bool(interpret),
        use_segids=use_segids,
    )

    # head-dim pad to the 8-sublane granule once, outside the ring (exact:
    # zero K columns don't change scores, zero V columns slice away)
    d_tgt = -(-hd // 8) * 8
    qt = jnp.transpose(q, (0, 2, 1, 3))
    kt = jnp.transpose(k, (0, 2, 1, 3))
    vt = jnp.transpose(v, (0, 2, 1, 3))
    if d_tgt != hd:
        pad = [(0, 0), (0, 0), (0, 0), (0, d_tgt - hd)]
        qt, kt, vt = (jnp.pad(x, pad) for x in (qt, kt, vt))

    def local_fn(q_l, k_l, v_l, valid_l, qseg_l, kseg_l):
        return _ring_flash(
            q_l, k_l, v_l, valid_l.astype(jnp.int32),
            qseg_l.astype(jnp.int32), kseg_l.astype(jnp.int32), cfg,
        )

    bspec = batch_axes if any(mesh.shape.get(a, 1) > 1 for a in batch_axes) else None
    hspec = P(bspec, None, axis_name, None)
    mspec = P(bspec, axis_name)
    kw = dict(
        mesh=mesh,
        in_specs=(hspec, hspec, hspec, mspec, mspec, mspec),
        out_specs=hspec,
    )
    try:  # jax >= 0.8 renamed check_rep -> check_vma
        mapped = shard_map(local_fn, check_vma=False, **kw)
    except TypeError:
        mapped = shard_map(local_fn, check_rep=False, **kw)
    out = mapped(qt, kt, vt, kv_valid, q_segment_ids, kv_segment_ids)
    if d_tgt != hd:
        out = out[..., :hd]
    return jnp.transpose(out, (0, 2, 1, 3))

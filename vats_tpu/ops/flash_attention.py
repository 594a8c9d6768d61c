"""Pallas TPU flash attention: causal / sliding-window / GQA / padding.

Replaces the reference's external CUDA dependency
``flash_attn_varlen_qkvpacked_func`` (/root/reference/configs/setup_env.py:14-20,
call site /root/reference/src/optimized_attention.py:628-635) with a
TPU-native kernel:

  * online softmax over KV blocks (m/l/acc in fp32 VMEM scratch) — the
    [T, S] score matrix is never materialized
  * causal + sliding-window masking with whole-block skipping: KV blocks
    entirely above the diagonal or left of the window are never loaded
  * GQA/MQA: the kv-head BlockSpec index_map folds the group structure
    (kv_head = q_head // heads_per_group) so K/V are never repeated in HBM —
    the reference materializes repeats via ``repeat_interleave``
    (/root/reference/utils/attention_utils.py:7-27)
  * padding via a [B, S] validity mask (TPU-idiomatic replacement for the
    flash-attn ``cu_seqlens`` unpad/re-pad dance)
  * custom VJP: forward saves (o, l, m) residuals; backward runs two Pallas
    kernels (dKV and dQ) with the same masking/skip structure.

Numerics follow the oracle in ops/attention_xla.py (fp32 softmax, mask value
-0.7*fp32_max); parity is asserted by tests/test_flash_attention.py.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend is unavailable when running CPU-only tests
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
NUM_LANES = 128


def _block_mask(
    q_ids: jnp.ndarray,
    k_ids: jnp.ndarray,
    *,
    causal: bool,
    left_window: int,
    right_window: int,
):
    """[block_q, block_k] bool mask from absolute position ids."""
    mask = jnp.ones(q_ids.shape[:1] + k_ids.shape[-1:], dtype=jnp.bool_)
    q = q_ids[:, None]
    k = k_ids[None, :]
    if causal:
        mask &= k <= q
    elif right_window >= 0:
        mask &= (k - q) <= right_window
    if left_window >= 0:
        mask &= (q - k) <= left_window
    return mask


def _fwd_kernel(
    q_ref,
    k_ref,
    v_ref,
    valid_ref,
    qseg_ref,
    kseg_ref,
    o_ref,
    m_scratch,
    l_scratch,
    acc_scratch,
    *,
    scale: float,
    causal: bool,
    left_window: int,
    right_window: int,
    block_q: int,
    block_k: int,
    kv_len: int,
    mask_value: float,
    use_segids: bool,
    q_pos_offset: int = 0,
):
    b_idx = pl.program_id(0)
    q_blk = pl.program_id(2)
    kv_blk = pl.program_id(3)
    num_kv_blocks = pl.num_programs(3)

    @pl.when(kv_blk == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    # q_pos_offset: absolute position of this shard's first query RELATIVE
    # to the KV block's first position — ring attention calls the kernel
    # per KV shard with a static per-hop offset so causal/window masking
    # (and the interior fast path) see absolute positions
    q_start = q_blk * block_q + q_pos_offset
    k_start = kv_blk * block_k

    # whole-block skip: causal (block fully above diagonal) and window
    run = True
    if causal:
        run = jnp.logical_and(run, k_start <= q_start + block_q - 1)
    if left_window >= 0:
        run = jnp.logical_and(run, k_start + block_k - 1 >= q_start - left_window)

    # interior blocks need NO masking at all (every (q, k) pair inside the
    # causal/window bounds and every kv column valid): the per-element
    # iota/compare/where battery costs more VPU time than the MXU matmul at
    # large blocks, so skipping it on interior blocks is most of the gap to
    # the speed-of-light kernel
    interior = jnp.logical_not(jnp.asarray(use_segids))
    if causal:
        interior = jnp.logical_and(interior, k_start + block_k - 1 <= q_start)
    elif right_window >= 0:
        interior = jnp.logical_and(
            interior, (k_start + block_k - 1) - q_start <= right_window
        )
    if left_window >= 0:
        interior = jnp.logical_and(
            interior, (q_start + block_q - 1) - k_start <= left_window
        )
    interior = jnp.logical_and(interior, jnp.all(valid_ref[b_idx] != 0))

    def _online_update(s, mask):
        """One streaming-softmax update from scores s ([block_q, block_k],
        already scaled and masked when mask is not None)."""
        m_prev = m_scratch[...]  # [block_q, NUM_LANES]
        l_prev = l_scratch[...]
        m_curr = jnp.max(s, axis=-1, keepdims=True)  # [block_q, 1]
        m_next = jnp.maximum(m_prev, jnp.broadcast_to(m_curr, m_prev.shape))

        alpha = jnp.exp(m_prev - m_next)  # correction for old stats
        p = jnp.exp(s - m_next[:, :1])  # [block_q, block_k]
        if mask is not None:
            # fully-masked rows: p is exp(mask_value - mask_value) = 1
            # there; zero them out via the mask to keep l exact
            p = jnp.where(mask, p, 0.0)

        l_curr = jnp.sum(p, axis=-1, keepdims=True)  # [block_q, 1]
        l_next = alpha * l_prev + jnp.broadcast_to(l_curr, l_prev.shape)

        m_scratch[...] = m_next
        l_scratch[...] = l_next

        v = v_ref[0, 0]  # [block_k, d]
        # p rounds to v's dtype for the MXU (flash-standard; exact for fp32)
        o_curr = jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )
        acc_scratch[...] = acc_scratch[...] * alpha[:, :1] + o_curr

    def _scores():
        # keep q/k in their storage dtype: bf16 x bf16 -> fp32 runs the MXU
        # at full rate (an fp32 upcast here measured 0.88x vs XLA at the
        # bench shape; softmax statistics stay fp32)
        q = q_ref[0, 0]  # [block_q, d]
        k = k_ref[0, 0]  # [block_k, d]
        s = jax.lax.dot_general(
            q,
            k,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [block_q, block_k]
        return s * scale

    @pl.when(jnp.logical_and(run, interior))
    def _compute_interior():
        _online_update(_scores(), None)

    @pl.when(jnp.logical_and(run, jnp.logical_not(interior)))
    def _compute_masked():
        s = _scores()
        q_ids = q_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0)[:, 0]
        k_ids = k_start + jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1)[0, :]
        mask = _block_mask(
            q_ids,
            k_ids,
            causal=causal,
            left_window=left_window,
            right_window=right_window,
        )
        # valid_ref block spans the full batch (Mosaic tiling: the
        # second-to-last block dim must be 8-divisible or the whole axis)
        mask &= (valid_ref[b_idx] != 0)[None, :]
        if use_segids:
            # packed sequences: tokens attend only within their own segment
            mask &= qseg_ref[b_idx][:, None] == kseg_ref[b_idx][None, :]
        s = jnp.where(mask, s, mask_value)
        _online_update(s, mask)

    @pl.when(kv_blk == num_kv_blocks - 1)
    def _store():
        l = l_scratch[...]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0, 0] = (acc_scratch[...] * l_inv[:, :1]).astype(o_ref.dtype)


def _fwd_kernel_lse(*refs, **kw):
    """Forward kernel variant that additionally stores the logsumexp.

    lse_ref layout: [1, 1, 8, block_q] — replicated over an 8-sublane axis so
    the block satisfies Mosaic's (8, 128) tiling rule (a bare [.., block_q]
    row vector cannot be tiled)."""
    (q_ref, k_ref, v_ref, valid_ref, qseg_ref, kseg_ref, o_ref, lse_ref,
     m_scratch, l_scratch, acc_scratch) = refs
    _fwd_kernel(
        q_ref, k_ref, v_ref, valid_ref, qseg_ref, kseg_ref, o_ref,
        m_scratch, l_scratch, acc_scratch, **kw,
    )
    kv_blk = pl.program_id(3)
    num_kv_blocks = pl.num_programs(3)

    @pl.when(kv_blk == num_kv_blocks - 1)
    def _store_lse():
        m = m_scratch[...][:, 0]  # [block_q]
        l = l_scratch[...][:, 0]
        lse = jnp.where(l == 0.0, 1e30, m + jnp.log(jnp.maximum(l, 1e-30)))
        lse_ref[0, 0] = jnp.broadcast_to(lse[None, :], (8, lse.shape[0]))


def _bwd_dkv_kernel(
    q_ref, do_ref, k_ref, v_ref, lse_ref, di_ref, valid_ref,
    qseg_ref, kseg_ref,
    dk_ref, dv_ref,
    dk_acc, dv_acc,
    *,
    scale: float,
    causal: bool,
    left_window: int,
    right_window: int,
    block_q: int,
    block_k: int,
    mask_value: float,
    use_segids: bool,
    ratio: int,
    q_pos_offset: int = 0,
):
    """Accumulate dK/dV for one KV block across all (q_head_in_group, q_block)
    pairs (innermost axis), so the output is per KV *group* [B, G, S, d] —
    no per-q-head dK/dV inflation (Hq/G× memory saved for GQA/MQA)."""
    b_idx = pl.program_id(0)
    kv_blk = pl.program_id(2)
    inner = pl.program_id(3)  # enumerates ratio * num_q_blocks
    num_inner = pl.num_programs(3)
    num_q_blocks = num_inner // ratio
    q_blk = jax.lax.rem(inner, num_q_blocks)

    @pl.when(inner == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    q_start = q_blk * block_q + q_pos_offset
    k_start = kv_blk * block_k
    run = True
    if causal:
        run = jnp.logical_and(run, k_start <= q_start + block_q - 1)
    if left_window >= 0:
        run = jnp.logical_and(run, k_start + block_k - 1 >= q_start - left_window)

    # interior blocks (fully inside the causal/window bounds, all kv valid,
    # no packing) skip the iota/compare/where battery entirely — the same
    # fast path that took the FORWARD from 0.88x to ~1x vs XLA
    interior = jnp.logical_not(jnp.asarray(use_segids))
    if causal:
        interior = jnp.logical_and(interior, k_start + block_k - 1 <= q_start)
    elif right_window >= 0:
        interior = jnp.logical_and(
            interior, (k_start + block_k - 1) - q_start <= right_window
        )
    if left_window >= 0:
        interior = jnp.logical_and(
            interior, (q_start + block_q - 1) - k_start <= left_window
        )
    interior = jnp.logical_and(interior, jnp.all(valid_ref[b_idx] != 0))

    def _tile_grads(masked):
        # storage-dtype matmul inputs (bf16 MXU path), fp32 accumulation
        q = q_ref[0, 0]  # [bq, d]
        do = do_ref[0, 0]
        k = k_ref[0, 0]  # [bk, d]
        v = v_ref[0, 0]
        lse = lse_ref[0, 0][0]  # [bq]
        di = di_ref[0, 0][0]  # [bq]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        if masked:
            q_ids = q_start + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, 1), 0
            )[:, 0]
            k_ids = k_start + jax.lax.broadcasted_iota(
                jnp.int32, (1, block_k), 1
            )[0, :]
            mask = _block_mask(
                q_ids, k_ids, causal=causal, left_window=left_window,
                right_window=right_window,
            )
            mask &= (valid_ref[b_idx] != 0)[None, :]
            if use_segids:
                mask &= qseg_ref[b_idx][:, None] == kseg_ref[b_idx][None, :]
            p = jnp.exp(jnp.where(mask, s, mask_value) - lse[:, None])
            p = jnp.where(mask, p, 0.0)  # [bq, bk]
        else:
            p = jnp.exp(s - lse[:, None])

        dv_acc[...] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # p^T @ do -> [bk, d]
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [bq, bk]
        ds = p * (dp - di[:, None]) * scale
        dk_acc[...] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # ds^T @ q -> [bk, d]

    @pl.when(jnp.logical_and(run, interior))
    def _compute_interior():
        _tile_grads(False)

    @pl.when(jnp.logical_and(run, jnp.logical_not(interior)))
    def _compute_masked():
        _tile_grads(True)

    @pl.when(inner == num_inner - 1)
    def _store():
        dk_ref[0, 0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[...].astype(dv_ref.dtype)


def _bwd_dq_kernel(
    q_ref, do_ref, k_ref, v_ref, lse_ref, di_ref, valid_ref,
    qseg_ref, kseg_ref,
    dq_ref,
    dq_acc,
    *,
    scale: float,
    causal: bool,
    left_window: int,
    right_window: int,
    block_q: int,
    block_k: int,
    mask_value: float,
    use_segids: bool,
    q_pos_offset: int = 0,
):
    """Accumulate dQ for one Q block across all KV blocks (innermost)."""
    b_idx = pl.program_id(0)
    q_blk = pl.program_id(2)
    kv_blk = pl.program_id(3)
    num_kv_blocks = pl.num_programs(3)

    @pl.when(kv_blk == 0)
    def _init():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    q_start = q_blk * block_q + q_pos_offset
    k_start = kv_blk * block_k
    run = True
    if causal:
        run = jnp.logical_and(run, k_start <= q_start + block_q - 1)
    if left_window >= 0:
        run = jnp.logical_and(run, k_start + block_k - 1 >= q_start - left_window)

    interior = jnp.logical_not(jnp.asarray(use_segids))
    if causal:
        interior = jnp.logical_and(interior, k_start + block_k - 1 <= q_start)
    elif right_window >= 0:
        interior = jnp.logical_and(
            interior, (k_start + block_k - 1) - q_start <= right_window
        )
    if left_window >= 0:
        interior = jnp.logical_and(
            interior, (q_start + block_q - 1) - k_start <= left_window
        )
    interior = jnp.logical_and(interior, jnp.all(valid_ref[b_idx] != 0))

    def _tile_dq(masked):
        q = q_ref[0, 0]
        do = do_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        lse = lse_ref[0, 0][0]
        di = di_ref[0, 0][0]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        if masked:
            q_ids = q_start + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, 1), 0
            )[:, 0]
            k_ids = k_start + jax.lax.broadcasted_iota(
                jnp.int32, (1, block_k), 1
            )[0, :]
            mask = _block_mask(
                q_ids, k_ids, causal=causal, left_window=left_window,
                right_window=right_window,
            )
            mask &= (valid_ref[b_idx] != 0)[None, :]
            if use_segids:
                mask &= qseg_ref[b_idx][:, None] == kseg_ref[b_idx][None, :]
            p = jnp.exp(jnp.where(mask, s, mask_value) - lse[:, None])
            p = jnp.where(mask, p, 0.0)
        else:
            p = jnp.exp(s - lse[:, None])
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - di[:, None]) * scale
        dq_acc[...] += jax.lax.dot(
            ds.astype(k.dtype), k, preferred_element_type=jnp.float32
        )

    @pl.when(jnp.logical_and(run, interior))
    def _compute_interior():
        _tile_dq(False)

    @pl.when(jnp.logical_and(run, jnp.logical_not(interior)))
    def _compute_masked():
        _tile_dq(True)

    @pl.when(kv_blk == num_kv_blocks - 1)
    def _store():
        dq_ref[0, 0] = dq_acc[...].astype(dq_ref.dtype)


def _pad_to(x, size, axis, value=0):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16)
)
def _flash_attention(
    q,
    k,
    v,
    kv_valid,
    q_seg,
    kv_seg,
    scale,
    causal,
    left_window,
    right_window,
    block_q,
    block_k,
    interpret,
    use_segids,
    bwd_block_q,
    bwd_block_k,
    q_pos_offset,
):
    return _flash_forward(
        q, k, v, kv_valid, q_seg, kv_seg, scale, causal, left_window,
        right_window, block_q, block_k, interpret, use_segids,
        q_pos_offset=q_pos_offset,
    )


def _flash_forward(
    q, k, v, kv_valid, q_seg, kv_seg, scale, causal, left_window,
    right_window, block_q, block_k, interpret, use_segids, return_lse=False,
    q_pos_offset=0,
):
    """q: [B, Hq, T, D]; k/v: [B, G, S, D]; kv_valid: [B, S] int32;
    q_seg: [B, T] / kv_seg: [B, S] int32 segment ids (packed sequences)."""
    b, hq, t, d = q.shape
    _, g, s, _ = k.shape
    ratio = hq // g

    t_pad = max(block_q, ((t + block_q - 1) // block_q) * block_q)
    s_pad = max(block_k, ((s + block_k - 1) // block_k) * block_k)
    qp = _pad_to(q, t_pad, 2)
    kp = _pad_to(k, s_pad, 2)
    vp = _pad_to(v, s_pad, 2)
    validp = _pad_to(kv_valid.astype(jnp.int32), s_pad, 1)
    # distinct pad sentinels so padded q rows never match padded kv columns
    qsegp = _pad_to(q_seg.astype(jnp.int32), t_pad, 1, value=-1)
    ksegp = _pad_to(kv_seg.astype(jnp.int32), s_pad, 1, value=-2)

    grid = (b, hq, t_pad // block_q, s_pad // block_k)

    kw = dict(
        scale=scale,
        causal=causal,
        left_window=left_window,
        right_window=right_window,
        block_q=block_q,
        block_k=block_k,
        kv_len=s,
        mask_value=DEFAULT_MASK_VALUE,
        use_segids=use_segids,
        q_pos_offset=q_pos_offset,
    )
    kernel = functools.partial(
        _fwd_kernel_lse if return_lse else _fwd_kernel, **kw
    )

    in_specs = [
        pl.BlockSpec((1, 1, block_q, d), lambda b_, h, qi, ki: (b_, h, qi, 0)),
        pl.BlockSpec(
            (1, 1, block_k, d),
            lambda b_, h, qi, ki, ratio=ratio: (b_, h // ratio, ki, 0),
        ),
        pl.BlockSpec(
            (1, 1, block_k, d),
            lambda b_, h, qi, ki, ratio=ratio: (b_, h // ratio, ki, 0),
        ),
        pl.BlockSpec((b, block_k), lambda b_, h, qi, ki: (0, ki)),
        pl.BlockSpec((b, block_q), lambda b_, h, qi, ki: (0, qi)),
        pl.BlockSpec((b, block_k), lambda b_, h, qi, ki: (0, ki)),
    ]
    o_spec = pl.BlockSpec((1, 1, block_q, d), lambda b_, h, qi, ki: (b_, h, qi, 0))
    o_shape = jax.ShapeDtypeStruct((b, hq, t_pad, d), q.dtype)
    if return_lse:
        out_specs = [
            o_spec,
            pl.BlockSpec((1, 1, 8, block_q), lambda b_, h, qi, ki: (b_, h, 0, qi)),
        ]
        out_shape = [
            o_shape,
            jax.ShapeDtypeStruct((b, hq, 8, t_pad), jnp.float32),
        ]
    else:
        out_specs = o_spec
        out_shape = o_shape
    if not _HAS_PLTPU:
        raise RuntimeError("pallas TPU backend unavailable")
    scratch_shapes = [
        pltpu.VMEM((block_q, NUM_LANES), jnp.float32),
        pltpu.VMEM((block_q, NUM_LANES), jnp.float32),
        pltpu.VMEM((block_q, d), jnp.float32),
    ]
    compiler_params = None
    if not interpret:
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        )

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        compiler_params=compiler_params,
        interpret=interpret,
    )(qp, kp, vp, validp, qsegp, ksegp)
    if return_lse:
        o, lse = out
        return o[:, :, :t], lse
    return out[:, :, :t]


def _flash_fwd_rule(
    q, k, v, kv_valid, q_seg, kv_seg, scale, causal, left_window,
    right_window, block_q, block_k, interpret, use_segids,
    bwd_block_q, bwd_block_k, q_pos_offset,
):
    o, lse = _flash_forward(
        q, k, v, kv_valid, q_seg, kv_seg, scale, causal, left_window,
        right_window, block_q, block_k, interpret, use_segids,
        return_lse=True, q_pos_offset=q_pos_offset,
    )
    return o, (q, k, v, kv_valid, q_seg, kv_seg, o, lse)


def _flash_bwd_kernels(
    q, k, v, do, lse2d, di2d, kv_valid, q_seg, kv_seg, *,
    scale, causal, left_window, right_window, block_q, block_k,
    interpret, use_segids, q_pos_offset=0,
):
    """Run the two Pallas backward kernels (dK/dV per KV group, dQ).

    q/do: [B, Hq, T, D]; k/v: [B, G, S, D]; lse2d/di2d: [B, Hq, T] fp32 —
    the TRUE row logsumexp and di = sum(do*o).  Callable with a lse/di
    computed over MORE than this (q, k) pair (ring attention passes the
    globally-merged statistics, making each per-shard call produce that
    shard's exact slice of the global gradient).  block_q/block_k here are
    the final backward blocks (caller applies defaults).  Returns fp32
    (dq, dk, dv) at the padded-free shapes."""
    b, hq, t, d = q.shape
    g, s = k.shape[1], k.shape[2]
    ratio = hq // g

    block_q = -(-min(block_q, max(t, 8)) // 8) * 8
    block_k = -(-min(block_k, max(s, 8)) // NUM_LANES) * NUM_LANES

    t_pad = max(block_q, ((t + block_q - 1) // block_q) * block_q)
    s_pad = max(block_k, ((s + block_k - 1) // block_k) * block_k)
    # Pad rows are harmless: their do rows are zero, so p^T@do and ds are 0.
    lse = jnp.broadcast_to(
        _pad_to(lse2d, t_pad, 2)[:, :, None, :], (b, hq, 8, t_pad)
    )
    qp = _pad_to(q, t_pad, 2)
    dop = _pad_to(do, t_pad, 2)
    kp = _pad_to(k, s_pad, 2)
    vp = _pad_to(v, s_pad, 2)
    validp = _pad_to(kv_valid.astype(jnp.int32), s_pad, 1)
    qsegp = _pad_to(q_seg.astype(jnp.int32), t_pad, 1, value=-1)
    ksegp = _pad_to(kv_seg.astype(jnp.int32), s_pad, 1, value=-2)

    di = _pad_to(di2d, t_pad, 2)
    di8 = jnp.broadcast_to(di[:, :, None, :], (b, hq, 8, t_pad))

    kw = dict(
        scale=scale, causal=causal, left_window=left_window,
        right_window=right_window, block_q=block_q, block_k=block_k,
        mask_value=DEFAULT_MASK_VALUE, use_segids=use_segids,
        q_pos_offset=q_pos_offset,
    )
    # dKV grid: (batch, kv_group, kv_block, q_head_in_group × q_block).
    # The innermost axis walks every query head of the group and every q
    # block; the scratch accumulates across all of them, so dK/dV come out
    # per *group* — no [B, Hq, S, d] inflation for GQA/MQA.
    nqb = t_pad // block_q

    def _h(g_, i):
        return g_ * ratio + i // nqb

    def _qi(i):
        return jax.lax.rem(i, nqb)

    q_spec = pl.BlockSpec(
        (1, 1, block_q, d), lambda b_, g_, ki, i: (b_, _h(g_, i), _qi(i), 0)
    )
    kv_spec = pl.BlockSpec(
        (1, 1, block_k, d), lambda b_, g_, ki, i: (b_, g_, ki, 0)
    )
    row_spec = pl.BlockSpec(
        (1, 1, 8, block_q), lambda b_, g_, ki, i: (b_, _h(g_, i), 0, _qi(i))
    )
    valid_spec = pl.BlockSpec((b, block_k), lambda b_, g_, ki, i: (0, ki))
    dkv_out_spec = pl.BlockSpec(
        (1, 1, block_k, d), lambda b_, g_, ki, i: (b_, g_, ki, 0)
    )
    compiler_params = None
    if not interpret:
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        )

    qseg_spec = pl.BlockSpec((b, block_q), lambda b_, g_, ki, i: (0, _qi(i)))
    kseg_spec = pl.BlockSpec((b, block_k), lambda b_, g_, ki, i: (0, ki))
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, **dict(kw, ratio=ratio)),
        grid=(b, g, s_pad // block_k, ratio * nqb),
        in_specs=[q_spec, q_spec, kv_spec, kv_spec, row_spec, row_spec,
                  valid_spec, qseg_spec, kseg_spec],
        out_specs=[dkv_out_spec, dkv_out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b, g, s_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((b, g, s_pad, d), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        compiler_params=compiler_params,
        interpret=interpret,
    )(qp, dop, kp, vp, lse, di8, validp, qsegp, ksegp)

    q_spec2 = pl.BlockSpec((1, 1, block_q, d), lambda b_, h, qi, ki: (b_, h, qi, 0))
    kv_spec2 = pl.BlockSpec(
        (1, 1, block_k, d),
        lambda b_, h, qi, ki, ratio=ratio: (b_, h // ratio, ki, 0),
    )
    row_spec2 = pl.BlockSpec((1, 1, 8, block_q), lambda b_, h, qi, ki: (b_, h, 0, qi))
    valid_spec2 = pl.BlockSpec((b, block_k), lambda b_, h, qi, ki: (0, ki))
    qseg_spec2 = pl.BlockSpec((b, block_q), lambda b_, h, qi, ki: (0, qi))
    kseg_spec2 = pl.BlockSpec((b, block_k), lambda b_, h, qi, ki: (0, ki))
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, **kw),
        grid=(b, hq, t_pad // block_q, s_pad // block_k),
        in_specs=[q_spec2, q_spec2, kv_spec2, kv_spec2, row_spec2, row_spec2,
                  valid_spec2, qseg_spec2, kseg_spec2],
        out_specs=q_spec2,
        out_shape=jax.ShapeDtypeStruct((b, hq, t_pad, d), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=compiler_params,
        interpret=interpret,
    )(qp, dop, kp, vp, lse, di8, validp, qsegp, ksegp)

    return dq[:, :, :t], dk[:, :, :s], dv[:, :, :s]


def bwd_block_defaults(block_q, block_k, bwd_block_q, bwd_block_k, t=None):
    """Backward block-size policy (shared by the custom VJP and the ring
    backward).  The backward kernels keep ~3x the forward\'s live VMEM
    (q/do/k/v blocks + two fp32 [bq, bk] intermediates); their blocks are
    tunable independently of the forward\'s.  Defaults from the
    tools/probe_flash_bwd.py sweep on a v5e (B=2, T=4096, causal, hd64):
    (bq=256, bk=1024) runs the fwd+bwd pair at 2.14x the XLA path, vs
    0.85x for the old (512, 512) cap — small q blocks pipeline the
    dKV kernel\'s inner accumulation loop, large k blocks keep the MXU
    fed.  SHORT sequences (t <= 512, the train tier) prefer full-T blocks:
    (512, 512) measured 4.69 ms vs the long-seq default\'s 5.50 at
    B=16/T=512/24h (tools/probe_flash_t512.py) — one grid row beats
    pipelining when there\'s nothing to pipeline."""
    if t is not None and t <= 512 and not bwd_block_q and not bwd_block_k:
        return min(block_q, t), min(block_k, t)
    block_q = bwd_block_q if bwd_block_q else min(block_q, 256)
    if bwd_block_k:
        block_k = bwd_block_k
    elif block_k >= 512:
        block_k = min(max(block_k, 512), 1024)
    # else: the caller explicitly tuned the forward block below 512 (VMEM
    # headroom at large head_dim) — respect it as an upper bound for the
    # backward too; pass bwd_block_k to override
    return block_q, block_k


def _flash_bwd_rule(
    scale, causal, left_window, right_window, block_q, block_k, interpret,
    use_segids, bwd_block_q, bwd_block_k, q_pos_offset, residuals, do,
):
    """Fused Pallas backward: separate dK/dV and dQ kernels sharing the
    forward\'s masking and block-skip structure.  The [T, S] probability
    matrix is never materialized; softmax is reconstructed per tile from the
    saved logsumexp, and di = sum(do*o) is shared by both kernels (guide\'s
    flash-backward recipe)."""
    q, k, v, kv_valid, q_seg, kv_seg, o, lse = residuals
    t = q.shape[2]
    block_q, block_k = bwd_block_defaults(
        block_q, block_k, bwd_block_q, bwd_block_k, t=t
    )
    di2d = jnp.sum(
        do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1
    )  # [B, Hq, T]
    # lse comes back from the forward [B, Hq, 8, T_pad] (sublane-replicated)
    dq, dk, dv = _flash_bwd_kernels(
        q, k, v, do, lse[:, :, 0, :t], di2d, kv_valid, q_seg, kv_seg,
        scale=scale, causal=causal, left_window=left_window,
        right_window=right_window, block_q=block_q, block_k=block_k,
        interpret=interpret, use_segids=use_segids,
        q_pos_offset=q_pos_offset,
    )
    return (
        dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
        None, None, None,
    )


_flash_attention.defvjp(_flash_fwd_rule, _flash_bwd_rule)


def _head_dim_pad_target(d: int) -> int:
    """Head dims the kernel runs at.  Mosaic accepts a last-dim block equal to
    the full (unpadded) array dim, but sub-8 remainders relayout poorly; pad
    odd head dims (66 -> 72) up to the 8-sublane granule.  Zero-padding the
    head dim is exact: QK^T is unchanged and padded V columns produce zero
    output columns that are sliced off."""
    return -(-d // 8) * 8


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: float,
    causal: bool = False,
    left_window: int = -1,
    right_window: int = -1,
    kv_valid: Optional[jnp.ndarray] = None,
    q_segment_ids: Optional[jnp.ndarray] = None,
    kv_segment_ids: Optional[jnp.ndarray] = None,
    block_q: int = 1024,
    block_k: int = 1024,
    bwd_block_q: Optional[int] = None,
    bwd_block_k: Optional[int] = None,
    interpret: bool = False,
    q_pos_offset: int = 0,
) -> jnp.ndarray:
    """Public API matching ops.dot_product_attention layouts.

    q: [B, T, Hq, D]; k, v: [B, S, G, D]; kv_valid: [B, S] bool (True=valid);
    q_segment_ids [B, T] / kv_segment_ids [B, S] int (packed sequences —
    tokens attend only within matching segment ids).
    ``q_pos_offset`` shifts every query's absolute position by a static
    amount relative to the KV positions — ring attention (context
    parallelism) uses it to run causal/window masking per rotating KV
    shard with the kernel's block-skip/interior structure intact.
    Returns [B, T, Hq, D] in q.dtype.
    """
    b, t, hq, d = q.shape
    _, s, g, _ = k.shape
    if hq % g != 0:
        raise ValueError(f"num q heads ({hq}) % kv groups ({g}) != 0")
    if kv_valid is None:
        kv_valid = jnp.ones((b, s), dtype=jnp.int32)
    use_segids = q_segment_ids is not None or kv_segment_ids is not None
    if q_segment_ids is None:
        q_segment_ids = jnp.zeros((b, t), dtype=jnp.int32)
    if kv_segment_ids is None:
        kv_segment_ids = jnp.zeros((b, s), dtype=jnp.int32)
    qt = jnp.transpose(q, (0, 2, 1, 3))
    kt = jnp.transpose(k, (0, 2, 1, 3))
    vt = jnp.transpose(v, (0, 2, 1, 3))
    d_tgt = _head_dim_pad_target(d)
    if d_tgt != d:
        # gradient of the pad is a slice, so padding outside the custom VJP
        # keeps the backward exact too
        qt = _pad_to(qt, d_tgt, 3)
        kt = _pad_to(kt, d_tgt, 3)
        vt = _pad_to(vt, d_tgt, 3)
    # clamp to the sequence length, then round the clamped block back up to
    # the TPU tile granule (8 sublanes / 128 lanes) — _pad_to absorbs the
    # remainder, and Mosaic rejects off-tile block shapes on hardware
    block_q = -(-min(block_q, max(t, 8)) // 8) * 8
    block_k = -(-min(block_k, max(s, 8)) // NUM_LANES) * NUM_LANES
    out = _flash_attention(
        qt, kt, vt, kv_valid.astype(jnp.int32),
        q_segment_ids.astype(jnp.int32), kv_segment_ids.astype(jnp.int32),
        float(scale), bool(causal), int(left_window), int(right_window),
        int(block_q), int(block_k), bool(interpret), use_segids,
        int(bwd_block_q) if bwd_block_q else 0,
        int(bwd_block_k) if bwd_block_k else 0,
        int(q_pos_offset),
    )
    if d_tgt != d:
        out = out[..., :d]
    return jnp.transpose(out, (0, 2, 1, 3))

"""Paged KV cache + Pallas decode attention kernel.

The serving-side replacement for the reference's eager per-token decode
(/root/reference/src/transformers/nlp/inference/generate.py:102-236, which
re-concatenates python-side tensors every step) and the TPU counterpart of
flash-attn's decode path the reference never had:

  * :class:`PagedKVCache` — K/V stored in fixed-size pages scattered across
    HBM ([layers, num_pages, kv_heads, page_size, head_dim]; a page carries
    all kv groups so one DMA moves G*ps*hd bytes); a per-sequence page table
    maps logical positions to physical pages, so sequences of different
    lengths share one physical pool (vLLM-style paged allocation)
  * :func:`paged_decode_attention` — one query token per sequence attends its
    whole paged history: grid (batch,), page table + lengths as
    scalar-prefetch (pages are DMA'd HBM->VMEM in double-buffered windowed
    chunks), online softmax in fp32, GQA folded (all Hq = G*N query heads
    computed per grid cell as G-batched matmuls against the paged KV stream)
  * an XLA reference implementation (``paged_decode_attention_xla``) used as
    the numerics oracle and CPU fallback.
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _pad_head_dim(head_dim: int) -> int:
    """Physical head dim of the page pools: padded up to a 128-lane multiple.

    Mosaic requires DMA slice shapes 128-aligned along the lane (last)
    dimension, so pools for head_dim 60/64/66/72 (every config tier's
    operating point) store 128 lanes; the pad lanes are zero and are sliced
    off after attention (zeros contribute nothing to q·k or p·v)."""
    return max(128, -(-head_dim // 128) * 128)


@struct.dataclass
class PagedKVCache:
    """Paged K/V pool shared by all sequences in the batch.

    A page holds ``page_size`` tokens for ALL kv groups ([G, ps, hd_phys]) —
    one DMA per (sequence, page) moves the whole group block (G x ps x hd),
    8x fewer and 8x larger copies than a per-(group, page) layout, which
    measured DMA-latency-bound at the 4.2B serving tier."""

    k_pages: jnp.ndarray  # [L, num_pages, G, page_size, hd_phys]
    v_pages: jnp.ndarray  # [L, num_pages, G, page_size, hd_phys]
    page_table: jnp.ndarray  # [B, pages_per_seq] physical page ids
    lengths: jnp.ndarray  # [B] valid tokens per sequence
    head_dim: int = struct.field(pytree_node=False, default=0)  # logical hd

    @classmethod
    def create(
        cls,
        num_layers: int,
        batch_size: int,
        max_seq_len: int,
        kv_heads: int,
        head_dim: int,
        *,
        page_size: int = 16,
        dtype: Any = jnp.bfloat16,
    ) -> "PagedKVCache":
        pages_per_seq = -(-max_seq_len // page_size)
        num_pages = batch_size * pages_per_seq
        shape = (
            num_layers, num_pages, kv_heads, page_size, _pad_head_dim(head_dim)
        )
        # identity allocation: sequence b owns pages [b*pps, (b+1)*pps);
        # a serving allocator can permute the table freely
        table = (
            jnp.arange(batch_size)[:, None] * pages_per_seq
            + jnp.arange(pages_per_seq)[None, :]
        ).astype(jnp.int32)
        return cls(
            k_pages=jnp.zeros(shape, dtype=dtype),
            v_pages=jnp.zeros(shape, dtype=dtype),
            page_table=table,
            lengths=jnp.zeros((batch_size,), dtype=jnp.int32),
            head_dim=head_dim,
        )

    @property
    def kv_heads(self) -> int:
        return self.k_pages.shape[2]

    @property
    def page_size(self) -> int:
        return self.k_pages.shape[3]

    @property
    def pages_per_seq(self) -> int:
        return self.page_table.shape[1]

    def _pad_kv(self, x: jnp.ndarray) -> jnp.ndarray:
        hd_phys = self.k_pages.shape[-1]
        if x.shape[-1] == hd_phys:
            return x
        pad = [(0, 0)] * (x.ndim - 1) + [(0, hd_phys - x.shape[-1])]
        return jnp.pad(x, pad)

    def append_token(
        self, layer_idx: int, k_new: jnp.ndarray, v_new: jnp.ndarray
    ) -> "PagedKVCache":
        """Write one token's K/V per sequence at each sequence's current
        length.  k_new/v_new: [B, G, hd].  ``advance`` separately."""
        k_new, v_new = self._pad_kv(k_new), self._pad_kv(v_new)
        b = k_new.shape[0]
        ps = self.page_size
        # rows already at capacity (lengths == max) would index one page past
        # the table; clamp so the masked-out pad token can't corrupt slot 0 of
        # a neighbouring page via XLA's clamped gather
        pos = jnp.minimum(self.lengths, self.pages_per_seq * ps - 1)
        logical_page = pos // ps  # [B]
        offset = pos % ps  # [B]
        phys = jnp.take_along_axis(
            self.page_table, logical_page[:, None], axis=1
        )[:, 0]  # [B]
        # advanced indices (phys [B], offset [B]) around the sliced G axis are
        # non-adjacent, so the broadcast result leads: [B, G, hd]
        k_pages = self.k_pages.at[layer_idx, phys, :, offset].set(
            k_new.astype(self.k_pages.dtype)
        )
        v_pages = self.v_pages.at[layer_idx, phys, :, offset].set(
            v_new.astype(self.v_pages.dtype)
        )
        return self.replace(k_pages=k_pages, v_pages=v_pages)

    def append_tokens(
        self, layer_idx: int, k_new: jnp.ndarray, v_new: jnp.ndarray
    ) -> "PagedKVCache":
        """Write T tokens per sequence starting at each sequence's current
        length (prefill).  k_new/v_new: [B, T, G, hd]."""
        k_new, v_new = self._pad_kv(k_new), self._pad_kv(v_new)
        b, t = k_new.shape[0], k_new.shape[1]
        ps = self.page_size
        pos = self.lengths[:, None] + jnp.arange(t)[None, :]  # [B, T]
        logical_page = pos // ps
        offset = pos % ps
        phys = jnp.take_along_axis(self.page_table, logical_page, axis=1)  # [B, T]
        k_pages = self.k_pages.at[layer_idx, phys, :, offset].set(
            k_new.astype(self.k_pages.dtype)
        )
        v_pages = self.v_pages.at[layer_idx, phys, :, offset].set(
            v_new.astype(self.v_pages.dtype)
        )
        return self.replace(k_pages=k_pages, v_pages=v_pages)

    def gather_dense(self, layer_idx: int):
        """Materialize a layer's pages as dense [B, S, G, hd] buffers
        (logical head dim; prefill-time convenience — decode uses the paged
        kernel)."""
        k = self.k_pages[layer_idx][self.page_table]  # [B, pps, G, ps, hdp]
        v = self.v_pages[layer_idx][self.page_table]
        b, pps, g, ps, hdp = k.shape
        hd = self.head_dim or hdp
        k = k.transpose(0, 1, 3, 2, 4).reshape(b, pps * ps, g, hdp)[..., :hd]
        v = v.transpose(0, 1, 3, 2, 4).reshape(b, pps * ps, g, hdp)[..., :hd]
        return k, v

    def advance(self, n: int = 1) -> "PagedKVCache":
        return self.replace(lengths=self.lengths + jnp.int32(n))

    def advance_by(self, counts: jnp.ndarray) -> "PagedKVCache":
        """Per-sequence advance (ragged prefill: each row's true length)."""
        return self.replace(lengths=self.lengths + counts.astype(jnp.int32))


def paged_decode_attention_xla(
    q: jnp.ndarray,
    k_pages: jnp.ndarray,
    v_pages: jnp.ndarray,
    page_table: jnp.ndarray,
    lengths: jnp.ndarray,
    *,
    scale: float,
) -> jnp.ndarray:
    """Oracle: q [B, Hq, hd]; k/v_pages [P, G, ps, hd_phys] (one layer;
    hd_phys may be 128-padded — the pad lanes are zero and are sliced off).

    Gathers each sequence's pages and runs masked attention in fp32."""
    b, hq, hd = q.shape
    _, g, ps, hd_phys = k_pages.shape
    n = hq // g
    pps = page_table.shape[1]
    # [B, pps, G, ps, hd_phys] -> [B, G, S, hd]
    k_seq = k_pages[page_table].transpose(0, 2, 1, 3, 4).reshape(
        b, g, pps * ps, hd_phys
    )[..., :hd]
    v_seq = v_pages[page_table].transpose(0, 2, 1, 3, 4).reshape(
        b, g, pps * ps, hd_phys
    )[..., :hd]
    qf = q.reshape(b, g, n, hd).astype(jnp.float32)
    s = jnp.einsum("bgnd,bgsd->bgns", qf, k_seq.astype(jnp.float32)) * scale
    valid = jnp.arange(pps * ps)[None, :] < lengths[:, None]  # [B, S]
    s = jnp.where(valid[:, None, None, :], s, DEFAULT_MASK_VALUE)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = jnp.where(valid[:, None, None, :], p, 0.0)
    denom = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)
    out = jnp.einsum("bgns,bgsd->bgnd", p / denom, v_seq.astype(jnp.float32))
    return out.reshape(b, hq, hd).astype(q.dtype)


def _decode_kernel(
    # scalar prefetch
    lengths_ref,
    page_table_ref,
    # inputs
    q_ref,
    k_pages_ref,
    v_pages_ref,
    # outputs
    o_ref,
    # scratch
    k_buf,
    v_buf,
    sems,
    *,
    scale: float,
    page_size: int,
    pages_per_seq: int,
    window: int,
    mask_value: float,
):
    """Chunked, double-buffered paged decode over grouped pages.

    Two DMA-efficiency levers vs the naive per-(group, page) design (which
    measured 6x slower than dense XLA at the 4.2B serving tier):

      * pages carry ALL kv groups ([G, ps, hd]) — one copy per (seq, page)
        moves G x more bytes, so the copy count drops G-fold and each copy
        is big enough to amortize DMA latency;
      * each chunk issues ``window`` page copies at once (they pipeline in
        the DMA engine) into one of two chunk buffers, and chunk c+1's
        copies are issued BEFORE computing chunk c — compute and HBM traffic
        overlap.

    Grid is (batch,); each cell computes all Hq = G*N query heads of one
    sequence as a G-batched dot_general against its paged history.
    """
    b = pl.program_id(0)
    length = lengths_ref[b]
    g, n_heads, hd = q_ref.shape[1], q_ref.shape[2], q_ref.shape[3]
    w = window  # pages per chunk; pages_per_seq % window == 0 (wrapper)

    q = q_ref[0].astype(jnp.float32)  # [G, N, hd]

    def issue(c, slot):
        base = c * w
        for j in range(w):  # static unroll: w copy pairs in flight
            pid = page_table_ref[b, base + j]
            pltpu.make_async_copy(
                k_pages_ref.at[pid], k_buf.at[slot, :, j], sems.at[slot, j, 0]
            ).start()
            pltpu.make_async_copy(
                v_pages_ref.at[pid], v_buf.at[slot, :, j], sems.at[slot, j, 1]
            ).start()

    def wait(slot):
        for j in range(w):
            pltpu.make_async_copy(
                k_pages_ref.at[0], k_buf.at[slot, :, j], sems.at[slot, j, 0]
            ).wait()
            pltpu.make_async_copy(
                v_pages_ref.at[0], v_buf.at[slot, :, j], sems.at[slot, j, 1]
            ).wait()

    num_used = jax.lax.div(length + page_size - 1, page_size)
    nc = jax.lax.div(num_used + w - 1, w)  # chunks actually needed

    @pl.when(nc > 0)
    def _():
        issue(0, 0)

    def body(c, carry):
        m_acc, l_acc, o_acc = carry
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < nc)
        def _():
            issue(c + 1, jax.lax.rem(c + 1, 2))

        wait(slot)
        # buffers are [G, w, ps, hd] (the DMA scatters each page across the
        # w axis), so the merge to [G, w*ps, hd] is a pure reshape
        k = k_buf[slot].reshape(g, w * page_size, hd).astype(jnp.float32)
        v = v_buf[slot].reshape(g, w * page_size, hd).astype(jnp.float32)

        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [G, N, w*ps]
        pos = c * w * page_size + jax.lax.broadcasted_iota(
            jnp.int32, (1, w * page_size), 1
        )[0]
        valid = pos < length
        s = jnp.where(valid[None, None, :], s * scale, mask_value)

        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_acc, m_cur)
        alpha = jnp.exp(m_acc - m_new)
        p = jnp.exp(s - m_new)
        p = jnp.where(valid[None, None, :], p, 0.0)
        l_new = alpha * l_acc + jnp.sum(p, axis=-1, keepdims=True)
        o_new = o_acc * alpha + jax.lax.dot_general(
            p, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        return m_new, l_new, o_new

    m0 = jnp.full((g, n_heads, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((g, n_heads, 1), jnp.float32)
    o0 = jnp.zeros((g, n_heads, hd), jnp.float32)
    m, l, o = jax.lax.fori_loop(0, nc, body, (m0, l0, o0))
    l_safe = jnp.where(l == 0.0, 1.0, l)
    o_ref[0] = (o / l_safe).astype(o_ref.dtype)


def paged_decode_attention(
    q: jnp.ndarray,
    k_pages: jnp.ndarray,
    v_pages: jnp.ndarray,
    page_table: jnp.ndarray,
    lengths: jnp.ndarray,
    *,
    scale: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """Pallas paged decode: q [B, Hq, hd] -> [B, Hq, hd] (one layer).

    The page pools may carry a 128-padded physical head dim; q is zero-padded
    to match inside (exact: pad lanes contribute nothing to q·k, and v's pad
    lanes are zero so the output pad is zero and sliced off)."""
    if not _HAS_PLTPU:
        return paged_decode_attention_xla(
            q, k_pages, v_pages, page_table, lengths, scale=scale
        )
    b, hq, hd = q.shape
    _, g, ps, hd_phys = k_pages.shape
    n = hq // g
    pps = page_table.shape[1]
    q_in = q.reshape(b, g, n, hd)
    if hd != hd_phys:
        q_in = jnp.pad(q_in, ((0, 0), (0, 0), (0, 0), (0, hd_phys - hd)))

    # pages per DMA chunk: largest power of two <= 8 dividing pages_per_seq
    window = 1
    for cand in (8, 4, 2):
        if pps % cand == 0:
            window = cand
            break

    kernel = functools.partial(
        _decode_kernel,
        scale=scale,
        page_size=ps,
        pages_per_seq=pps,
        window=window,
        mask_value=DEFAULT_MASK_VALUE,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, g, n, hd_phys), lambda b_, *_: (b_, 0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, g, n, hd_phys), lambda b_, *_: (b_, 0, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((2, g, window, ps, hd_phys), k_pages.dtype),
            pltpu.VMEM((2, g, window, ps, hd_phys), v_pages.dtype),
            pltpu.SemaphoreType.DMA((2, window, 2)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, g, n, hd_phys), q.dtype),
        interpret=interpret,
    )(lengths.astype(jnp.int32), page_table.astype(jnp.int32), q_in,
      k_pages, v_pages)
    return out[..., :hd].reshape(b, hq, hd)

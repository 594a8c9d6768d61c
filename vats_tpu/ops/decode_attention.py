"""Paged KV cache + Pallas decode attention kernel.

The serving-side replacement for the reference's eager per-token decode
(/root/reference/src/transformers/nlp/inference/generate.py:102-236, which
re-concatenates python-side tensors every step) and the TPU counterpart of
flash-attn's decode path the reference never had:

  * :class:`PagedKVCache` — K/V stored in fixed-size pages scattered across
    HBM ([layers, kv_heads, num_pages, page_size, head_dim]); a per-sequence
    page table maps logical positions to physical pages, so sequences of
    different lengths share one physical pool (vLLM-style paged allocation)
  * :func:`paged_decode_attention` — one query token per sequence attends its
    whole paged history: grid (batch, kv_head), page table + lengths as
    scalar-prefetch (pages are DMA'd HBM->VMEM with double buffering),
    online softmax in fp32, GQA folded (all N = Hq/G query heads of a group
    computed per grid cell against the group's single KV stream)
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


@struct.dataclass
class PagedKVCache:
    """Paged K/V pool shared by all sequences in the batch."""

    k_pages: jnp.ndarray  # [L, G, num_pages, page_size, hd]
    v_pages: jnp.ndarray  # [L, G, num_pages, page_size, hd]
    page_table: jnp.ndarray  # [B, pages_per_seq] physical page ids
    lengths: jnp.ndarray  # [B] valid tokens per sequence

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
        shape = (num_layers, kv_heads, num_pages, page_size, head_dim)
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
        )

    @property
    def page_size(self) -> int:
        return self.k_pages.shape[3]

    @property
    def pages_per_seq(self) -> int:
        return self.page_table.shape[1]

    def append_token(
        self, layer_idx: int, k_new: jnp.ndarray, v_new: jnp.ndarray
    ) -> "PagedKVCache":
        """Write one token's K/V per sequence at each sequence's current
        length.  k_new/v_new: [B, G, hd].  ``advance`` separately."""
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
        # the int layer index + (phys, offset) arrays are non-adjacent
        # advanced indices, so the broadcast result leads: [B, G, hd]
        k_pages = self.k_pages.at[layer_idx, :, phys, offset].set(
            k_new.astype(self.k_pages.dtype)
        )
        v_pages = self.v_pages.at[layer_idx, :, phys, offset].set(
            v_new.astype(self.v_pages.dtype)
        )
        return self.replace(k_pages=k_pages, v_pages=v_pages)

    def append_tokens(
        self, layer_idx: int, k_new: jnp.ndarray, v_new: jnp.ndarray
    ) -> "PagedKVCache":
        """Write T tokens per sequence starting at each sequence's current
        length (prefill).  k_new/v_new: [B, T, G, hd]."""
        b, t = k_new.shape[0], k_new.shape[1]
        ps = self.page_size
        pos = self.lengths[:, None] + jnp.arange(t)[None, :]  # [B, T]
        logical_page = pos // ps
        offset = pos % ps
        phys = jnp.take_along_axis(self.page_table, logical_page, axis=1)  # [B, T]
        k_pages = self.k_pages.at[layer_idx, :, phys, offset].set(
            k_new.astype(self.k_pages.dtype)
        )
        v_pages = self.v_pages.at[layer_idx, :, phys, offset].set(
            v_new.astype(self.v_pages.dtype)
        )
        return self.replace(k_pages=k_pages, v_pages=v_pages)

    def gather_dense(self, layer_idx: int):
        """Materialize a layer's pages as dense [B, S, G, hd] buffers
        (prefill-time convenience; decode uses the paged kernel)."""
        k = self.k_pages[layer_idx][:, self.page_table]  # [G, B, pps, ps, hd]
        v = self.v_pages[layer_idx][:, self.page_table]
        g, b, pps, ps, hd = k.shape
        k = k.transpose(1, 2, 3, 0, 4).reshape(b, pps * ps, g, hd)
        v = v.transpose(1, 2, 3, 0, 4).reshape(b, pps * ps, g, hd)
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
    """Oracle: q [B, Hq, hd]; k/v_pages [G, P, ps, hd] (one layer).

    Gathers each sequence's pages and runs masked attention in fp32."""
    b, hq, hd = q.shape
    g, _, ps, _ = k_pages.shape
    n = hq // g
    pps = page_table.shape[1]
    # [B, G, pps, ps, hd] -> [B, G, S, hd]
    k_seq = k_pages[:, page_table].transpose(1, 0, 2, 3, 4).reshape(
        b, g, pps * ps, hd
    )
    v_seq = v_pages[:, page_table].transpose(1, 0, 2, 3, 4).reshape(
        b, g, pps * ps, hd
    )
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
    mask_value: float,
):
    b = pl.program_id(0)
    g = pl.program_id(1)
    length = lengths_ref[b]
    n_heads, hd = q_ref.shape[2], q_ref.shape[3]

    q = q_ref[0, 0].astype(jnp.float32)  # [N, hd]

    def body(i, carry):
        m_acc, l_acc, o_acc = carry
        slot = jax.lax.rem(i, 2)
        page_id = page_table_ref[b, i]

        copy_k = pltpu.make_async_copy(
            k_pages_ref.at[g, page_id], k_buf.at[slot], sems.at[slot, 0]
        )
        copy_v = pltpu.make_async_copy(
            v_pages_ref.at[g, page_id], v_buf.at[slot], sems.at[slot, 1]
        )
        copy_k.start()
        copy_v.start()
        copy_k.wait()
        copy_v.wait()

        k = k_buf[slot].astype(jnp.float32)  # [ps, hd]
        v = v_buf[slot].astype(jnp.float32)

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [N, ps]
        pos = i * page_size + jax.lax.broadcasted_iota(
            jnp.int32, (1, page_size), 1
        )[0]
        valid = pos < length
        s = jnp.where(valid[None, :], s * scale, mask_value)

        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_acc, m_cur)
        alpha = jnp.exp(m_acc - m_new)
        p = jnp.exp(s - m_new)
        p = jnp.where(valid[None, :], p, 0.0)
        l_new = alpha * l_acc + jnp.sum(p, axis=-1, keepdims=True)
        o_new = o_acc * alpha + jax.lax.dot(
            p, v, preferred_element_type=jnp.float32
        )
        return m_new, l_new, o_new

    m0 = jnp.full((n_heads, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((n_heads, 1), jnp.float32)
    o0 = jnp.zeros((n_heads, hd), jnp.float32)
    num_used = jax.lax.div(length + page_size - 1, page_size)
    m, l, o = jax.lax.fori_loop(0, num_used, body, (m0, l0, o0))
    l_safe = jnp.where(l == 0.0, 1.0, l)
    o_ref[0, 0] = (o / l_safe).astype(o_ref.dtype)


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
    """Pallas paged decode: q [B, Hq, hd] -> [B, Hq, hd] (one layer)."""
    if not _HAS_PLTPU:
        return paged_decode_attention_xla(
            q, k_pages, v_pages, page_table, lengths, scale=scale
        )
    b, hq, hd = q.shape
    g, _, ps, _ = k_pages.shape
    n = hq // g
    pps = page_table.shape[1]
    q_in = q.reshape(b, g, n, hd)

    kernel = functools.partial(
        _decode_kernel,
        scale=scale,
        page_size=ps,
        pages_per_seq=pps,
        mask_value=DEFAULT_MASK_VALUE,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, g),
        in_specs=[
            pl.BlockSpec((1, 1, n, hd), lambda b_, g_, *_: (b_, g_, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 1, n, hd), lambda b_, g_, *_: (b_, g_, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, ps, hd), k_pages.dtype),
            pltpu.VMEM((2, ps, hd), v_pages.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, g, n, hd), q.dtype),
        interpret=interpret,
    )(lengths.astype(jnp.int32), page_table.astype(jnp.int32), q_in,
      k_pages, v_pages)
    return out.reshape(b, hq, hd)

"""Paged KV cache + Pallas decode attention kernel.

The serving-side replacement for the reference's eager per-token decode
(/root/reference/src/transformers/nlp/inference/generate.py:102-236, which
re-concatenates python-side tensors every step) and the TPU counterpart of
flash-attn's decode path the reference never had.

Design (every choice below was measured on a v5e against the alternative):

  * :class:`PagedKVCache` — K and V share ONE pool of **sequence-minor**
    pages ``[layers, num_pages, 2, kv_heads, head_dim_pad, page_size]`` with
    ``page_size`` a multiple of 128, so a page occupies whole lane tiles and
    one DMA streams a (k, v) pair for all groups (~262 KiB at the 4.2B
    serving tier).  head_dim pads only to the 8-sublane granule (60 -> 64,
    ~7%); the round-2 head-dim-minor layout paid the 128-lane tile pad
    (60 -> 128, 2.13x KV bytes) on every read and write.
  * **In-kernel appends** — XLA cannot scatter at a dynamic lane offset
    without rewriting the buffer (a per-layer ``.at[...].set`` measured
    ~460 us/layer; dynamic_update_slice the same): so during decode the
    cache write never goes through XLA at all.  The kernel receives the
    current token's K/V (``k_cur/v_cur``), attends it as one extra column,
    inserts it into its page in VMEM (the page is already streamed for
    attention), and DMAs that single page back — the pool rides
    ``input_output_aliases`` so the whole update is in-place.
  * :func:`paged_decode_attention` — grid cells cover ``rows_per_cell``
    sequences so many page DMAs are in flight per cell (a one-row cell is
    DMA-latency-bound: 2-3 sequential copies per cell measured ~350 us/layer
    at B=128); page table + lengths ride scalar prefetch; online softmax in
    fp32; GQA folded (all Hq = G*N query heads per row batched as one
    rows*G matmul batch — Mosaic matmuls take a single batch dim).
  * an XLA reference implementation (``paged_decode_attention_xla``) used as
    the numerics oracle and CPU fallback.
"""

from __future__ import annotations

import functools
import os
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


def quantize_kv(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-(token, group) symmetric int8 quantization of [..., hd] K or V.

    Returns (int8 values [..., hd], fp32 scale [...]); dequantized =
    values * scale[..., None].  The scale floor keeps all-zero vectors
    (never-written slots, padded rows) at scale 1e-8/127 -> dequant 0."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(xf / scale[..., None]), -127, 127).astype(jnp.int8)
    return q, scale


def _pad_head_dim(head_dim: int) -> int:
    """Physical (stored) head dim: padded to the 8-sublane granule.

    head_dim sits on the SUBLANE axis of the sequence-minor page layout;
    Mosaic requires DMA slice shapes 8-aligned there (and the pool array is
    stored tiled to 8 sublanes anyway), so storing the pad explicitly makes
    per-page DMA slices legal.  The pad rows are zero and contribute nothing
    to q.k or p.v."""
    return -(-head_dim // 8) * 8


@struct.dataclass
class PagedKVCache:
    """Paged K/V pool shared by all sequences in the batch.

    A page holds ``page_size`` tokens' K AND V for ALL kv groups
    ([2, G, hd_pad, ps]) — one DMA per (sequence, page) moves the whole
    block; per-(k/v, group, page) copies measured DMA-latency-bound."""

    kv_pages: jnp.ndarray  # [L, num_pages, 2, G, hd_pad, page_size]
    page_table: jnp.ndarray  # [B, pages_per_seq] physical page ids
    lengths: jnp.ndarray  # [B] valid tokens per sequence
    # int8-quantized pools carry per-(token, k/v, group) symmetric scales:
    # kv_scales [L, num_pages, 2, G_pad8, page_size] fp32 (fp32 because the
    # commit kernel inserts at a dynamic lane offset, which Mosaic supports
    # only for 32-bit types; G pads to the 8-sublane granule for legal DMA
    # slices).  dequantized = int8_value * scale.  None for bf16 pools.
    kv_scales: Optional[jnp.ndarray] = None
    head_dim: int = struct.field(pytree_node=False, default=0)  # logical hd
    # True only between create() and the first append: a fresh-cache prefill
    # (the generate/bench hot path) can skip the page gather entirely and
    # run plain causal attention over its own window.  Static (pytree_node
    # False): the flag is a trace-time property, constant inside any jitted
    # loop because every append path clears it.
    fresh: bool = struct.field(pytree_node=False, default=False)

    @classmethod
    def create(
        cls,
        num_layers: int,
        batch_size: int,
        max_seq_len: int,
        kv_heads: int,
        head_dim: int,
        *,
        page_size: int = 128,
        dtype: Any = jnp.bfloat16,
    ) -> "PagedKVCache":
        if page_size % 128 != 0:
            raise ValueError(
                f"page_size ({page_size}) must be a multiple of 128: pages "
                "are lane-tiled [.., head_dim, page_size] and a sub-128 lane "
                "dim would be stored padded to 128 anyway"
            )
        pages_per_seq = -(-max_seq_len // page_size)
        num_pages = batch_size * pages_per_seq
        shape = (
            num_layers, num_pages, 2, kv_heads, _pad_head_dim(head_dim),
            page_size,
        )
        # identity allocation: sequence b owns pages [b*pps, (b+1)*pps);
        # a serving allocator can permute the table freely
        table = (
            jnp.arange(batch_size)[:, None] * pages_per_seq
            + jnp.arange(pages_per_seq)[None, :]
        ).astype(jnp.int32)
        scales = None
        if jnp.dtype(dtype) == jnp.int8:
            scales = jnp.zeros(
                (num_layers, num_pages, 2, _pad_head_dim(kv_heads), page_size),
                dtype=jnp.float32,
            )
        return cls(
            kv_pages=jnp.zeros(shape, dtype=dtype),
            page_table=table,
            lengths=jnp.zeros((batch_size,), dtype=jnp.int32),
            kv_scales=scales,
            head_dim=head_dim,
            fresh=True,
        )

    @property
    def quantized(self) -> bool:
        return self.kv_scales is not None

    # convenience views kept for the oracle/tests (no copy: basic slicing)
    @property
    def k_pages(self) -> jnp.ndarray:  # [L, P, G, hd_pad, ps]
        return self.kv_pages[:, :, 0]

    @property
    def v_pages(self) -> jnp.ndarray:
        return self.kv_pages[:, :, 1]

    @property
    def kv_heads(self) -> int:
        return self.kv_pages.shape[3]

    @property
    def page_size(self) -> int:
        return self.kv_pages.shape[5]

    @property
    def pages_per_seq(self) -> int:
        return self.page_table.shape[1]

    def _pad_kv(self, x: jnp.ndarray) -> jnp.ndarray:
        """Zero-pad the trailing head_dim axis of [.., hd] to the stored pad."""
        hd_pad = self.kv_pages.shape[4]
        if x.shape[-1] == hd_pad:
            return x
        pad = [(0, 0)] * (x.ndim - 1) + [(0, hd_pad - x.shape[-1])]
        return jnp.pad(x, pad)

    def append_token(
        self, layer_idx: int, k_new: jnp.ndarray, v_new: jnp.ndarray
    ) -> "PagedKVCache":
        """Write one token's K/V per sequence at each sequence's current
        length, for one layer, through an XLA scatter.  k_new/v_new:
        [B, G, hd].  ``advance`` separately.

        NOTE: XLA lowers a dynamic lane-offset scatter as a rewrite of the
        pool (~460 us/layer measured at the 4.2B tier) — the decode hot path
        instead commits in-kernel (see ``paged_decode_attention`` with
        ``k_cur``); this method serves the CPU fallback and tests."""
        kv = jnp.stack(
            [self._pad_kv(k_new), self._pad_kv(v_new)], axis=1
        )  # [B, 2, G, hd_pad]
        ps = self.page_size
        # rows already at capacity (lengths == max) would index one page past
        # the table; clamp so the masked-out pad token can't corrupt slot 0
        # of a neighbouring page via XLA's clamped gather
        pos = jnp.minimum(self.lengths, self.pages_per_seq * ps - 1)
        phys = jnp.take_along_axis(
            self.page_table, (pos // ps)[:, None], axis=1
        )[:, 0]
        scales = None
        if self.quantized:
            kv, sc = quantize_kv(kv)  # sc [B, 2, G]
            g = sc.shape[-1]
            scales = self.kv_scales.at[layer_idx, phys, :, :g, pos % ps].set(
                sc
            )
        # advanced indices (phys [B], offset [B]) around sliced axes are
        # non-adjacent, so the broadcast result leads: [B, 2, G, hd_pad]
        kv_pages = self.kv_pages.at[layer_idx, phys, :, :, :, pos % ps].set(
            kv.astype(self.kv_pages.dtype)
        )
        return self.replace(kv_pages=kv_pages, kv_scales=scales, fresh=False)

    def append_tokens(
        self, layer_idx: int, k_new: jnp.ndarray, v_new: jnp.ndarray
    ) -> "PagedKVCache":
        """Write T tokens per sequence starting at each sequence's current
        length (prefill; once per generate call).  k_new/v_new: [B, T, G, hd]."""
        kv = jnp.stack(
            [self._pad_kv(k_new), self._pad_kv(v_new)], axis=2
        )  # [B, T, 2, G, hd_pad]
        ps = self.page_size
        t = k_new.shape[1]
        pos = self.lengths[:, None] + jnp.arange(t)[None, :]  # [B, T]
        phys = jnp.take_along_axis(self.page_table, pos // ps, axis=1)
        scales = None
        if self.quantized:
            kv, sc = quantize_kv(kv)  # sc [B, T, 2, G]
            g = sc.shape[-1]
            scales = self.kv_scales.at[layer_idx, phys, :, :g, pos % ps].set(
                sc
            )
        kv_pages = self.kv_pages.at[layer_idx, phys, :, :, :, pos % ps].set(
            kv.astype(self.kv_pages.dtype)
        )
        return self.replace(kv_pages=kv_pages, kv_scales=scales, fresh=False)

    def append_window_pages(
        self, layer_idx: int, k_new: jnp.ndarray, v_new: jnp.ndarray
    ) -> "PagedKVCache":
        """Fresh-cache prefill append: write the window as WHOLE pages.

        Requires every row at length 0 (the ``fresh`` invariant).  The
        generic ``append_tokens`` scatters per (row, token) along the
        page lane axis, which XLA lowers by materializing the ENTIRE pool
        transposed to token-major layout — 5.6 GB padded + a 2.8 GB copy
        at the B=192/384 bench shape (the allocation that capped the bf16
        decode batch).  Building [B*pages_used, 2, G, hd_pad, ps] pages
        from the window by reshape and scattering at PAGE granularity on
        the pool's leading axis keeps the pool layout intact: the update
        is a dynamic row write, no transposed pool copy.
        """
        b, t, g, _ = k_new.shape
        ps = self.page_size
        ppu = -(-t // ps)
        pad = ppu * ps - t
        kv = jnp.stack(
            [self._pad_kv(k_new), self._pad_kv(v_new)], axis=2
        )  # [B, T, 2, G, hd_pad]
        scales = None
        if self.quantized:
            kv, sc = quantize_kv(kv)  # sc [B, T, 2, G]
            gp = self.kv_scales.shape[3]
            sc = jnp.pad(sc, ((0, 0), (0, pad), (0, 0), (0, gp - g)))
            sc_pages = sc.reshape(b, ppu, ps, 2, gp).transpose(
                0, 1, 3, 4, 2
            ).reshape(b * ppu, 2, gp, ps)
        if pad:
            kv = jnp.pad(kv, ((0, 0), (0, pad)) + ((0, 0),) * 3)
        hdp = kv.shape[-1]
        pages = kv.reshape(b, ppu, ps, 2, g, hdp).transpose(
            0, 1, 3, 4, 5, 2
        ).reshape(b * ppu, 2, g, hdp, ps)
        pids = self.page_table[:, :ppu].reshape(-1)
        kv_pages = self.kv_pages.at[layer_idx, pids].set(
            pages.astype(self.kv_pages.dtype)
        )
        if self.quantized:
            scales = self.kv_scales.at[layer_idx, pids].set(sc_pages)
        return self.replace(kv_pages=kv_pages, kv_scales=scales, fresh=False)

    def gather_dense_t(self, layer_idx: int):
        """Materialize a layer's pages in the cache-native layout
        [B, G, hd_pad, S] (a pure reshape of the gathered pages — the
        prefill path attends via ``cached_decode_attention`` on this view).
        int8 pools are dequantized into bf16 here (prefill-only cost)."""
        kv = self.kv_pages[layer_idx][self.page_table]  # [B, pps, 2, G, hdp, ps]
        b, pps, _, g, hdp, ps = kv.shape
        if self.quantized:
            sc = self.kv_scales[layer_idx][self.page_table]  # [B,pps,2,Gp,ps]
            kv = (
                kv.astype(jnp.float32) * sc[:, :, :, :g, None, :]
            ).astype(jnp.bfloat16)
        kv = kv.transpose(2, 0, 3, 4, 1, 5).reshape(2, b, g, hdp, pps * ps)
        return kv[0], kv[1]

    def gather_dense(self, layer_idx: int):
        """Classic [B, S, G, hd] views (transposed copy; prefer
        :meth:`gather_dense_t` — head-dim-minor buffers pay the 128-lane
        tile pad)."""
        k, v = self.gather_dense_t(layer_idx)
        hd = self.head_dim or k.shape[2]
        k = k.transpose(0, 3, 1, 2)[..., :hd]
        v = v.transpose(0, 3, 1, 2)[..., :hd]
        return k, v

    def advance(self, n: int = 1) -> "PagedKVCache":
        return self.replace(lengths=self.lengths + jnp.int32(n))

    def advance_by(self, counts: jnp.ndarray) -> "PagedKVCache":
        """Per-sequence advance (ragged prefill: each row's true length)."""
        return self.replace(lengths=self.lengths + counts.astype(jnp.int32))


def paged_decode_attention_xla(
    q: jnp.ndarray,
    kv_pages: jnp.ndarray,
    page_table: jnp.ndarray,
    lengths: jnp.ndarray,
    *,
    scale: float,
    k_cur: Optional[jnp.ndarray] = None,
    v_cur: Optional[jnp.ndarray] = None,
    kv_scales: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Oracle: q [B, Hq, hd]; kv_pages [P, 2, G, hd_pad, ps] (one layer;
    hd_pad may be 8-sublane padded — the pad rows are zero and sliced off).
    ``lengths`` counts SETTLED history; when ``k_cur/v_cur`` [B, G, hd] are
    given the current (not-yet-appended) token is one extra, always-valid
    attention column.  int8 pools pass ``kv_scales`` [P, 2, G_pad, ps]
    (dequantized = value * scale; the current token stays unquantized).

    Gathers each sequence's pages and runs masked attention in fp32."""
    b, hq, hd = q.shape
    _, _, g, hd_pad, ps = kv_pages.shape
    n = hq // g
    pps = page_table.shape[1]
    gathered = kv_pages[page_table].astype(jnp.float32)
    if kv_scales is not None:
        sc = kv_scales[page_table]  # [B, pps, 2, G_pad, ps]
        gathered = gathered * sc[:, :, :, :g, None, :]
    # [B, pps, 2, G, hdp, ps] -> [2, B, G, S, hd]
    kv = gathered.transpose(2, 0, 3, 4, 1, 5).reshape(
        2, b, g, hd_pad, pps * ps
    ).transpose(0, 1, 2, 4, 3)[..., :hd]
    k_seq, v_seq = kv[0], kv[1]
    valid = jnp.arange(pps * ps)[None, :] < lengths[:, None]  # [B, S]
    if k_cur is not None:
        k_seq = jnp.concatenate([k_seq, k_cur[:, :, None, :]], axis=2)
        v_seq = jnp.concatenate([v_seq, v_cur[:, :, None, :]], axis=2)
        valid = jnp.concatenate(
            [valid, jnp.ones((b, 1), dtype=bool)], axis=1
        )
    qf = q.reshape(b, g, n, hd).astype(jnp.float32)
    s = jnp.einsum("bgnd,bgsd->bgns", qf, k_seq.astype(jnp.float32)) * scale
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
    layer_ref,
    # inputs (cur_ref present only when has_cur)
    *refs,
    scale: float,
    page_size: int,
    pages_per_seq: int,
    window: int,
    rows: int,
    mask_value: float,
    has_cur: bool,
    commit: bool,
    quantized: bool,
    ablate: Optional[str] = None,
):
    """Chunked, double-buffered paged decode over sequence-minor pages.

    Each grid cell covers ``rows`` sequences so rows*window page copies are
    in flight per chunk — a one-row cell is bound by the latency of its 2-3
    sequential page DMAs (measured 350 us/layer at B=128 vs the HBM
    roofline's ~90 us).  Pages carry K and V together ([2, G, hd, ps]); the
    hd contraction against q needs no in-VMEM transpose in either matmul.

    With ``commit``, each row's current page — already streamed for
    attention — gets the current token inserted at its lane slot in VMEM
    and is DMA'd back to the (input/output-aliased) pool: the append never
    touches XLA's scatter path.

    With ``quantized``, pages are int8 and a second pool of per-(token,
    k/v, group) fp32 scales streams alongside: k scales fold into the score
    COLUMNS (one [RG, ps] multiply, never touching hd), v scales fold into
    the probabilities before the p.v matmul.  The current token attends
    and seeds the softmax UNQUANTIZED; commit quantizes it in VMEM and
    writes both its page and its scales page back aliased.
    """
    idx = 0
    q_ref = refs[idx]; idx += 1
    cur_ref = None
    if has_cur:
        cur_ref = refs[idx]; idx += 1
    pool_ref = refs[idx]; idx += 1
    sc_pool_ref = None
    if quantized:
        sc_pool_ref = refs[idx]; idx += 1
    o_ref = refs[idx]; idx += 1
    pool_out_ref = sc_out_ref = None
    if commit:
        pool_out_ref = refs[idx]; idx += 1
        if quantized:
            sc_out_ref = refs[idx]; idx += 1
    kv_buf = refs[idx]; idx += 1
    sc_buf = None
    if quantized:
        sc_buf = refs[idx]; idx += 1
    wbuf = swbuf = None
    if commit:
        wbuf = refs[idx]; idx += 1
        if quantized:
            swbuf = refs[idx]; idx += 1
    sems = refs[idx]; idx += 1
    sc_sems = None
    if quantized:
        sc_sems = refs[idx]; idx += 1
    wsems = swsems = None
    if commit:
        wsems = refs[idx]; idx += 1
        if quantized:
            swsems = refs[idx]; idx += 1
    cell = pl.program_id(0)
    layer = layer_ref[0]
    g, n_heads, hd = q_ref.shape[2], q_ref.shape[3], q_ref.shape[4]
    w = window
    ps = page_size
    rg = rows * g  # Mosaic matmuls take ONE batch dim: fold (rows, G)

    # bf16 pools attend with native bf16 x bf16 -> f32 MXU passes (fp32
    # operand casts forced 4-8x slower fp32 passes plus a VPU conversion of
    # every streamed page); int8 pools keep the f32 dequant path
    mm_dtype = (
        jnp.bfloat16 if kv_buf.dtype == jnp.bfloat16 else jnp.float32
    )
    q = q_ref[0].astype(mm_dtype).reshape(rg, n_heads, hd)

    def issue(c, slot):
        if ablate in ("nodma", "skeleton"):
            return
        base = c * w
        for r in range(rows):
            for j in range(w):  # static unroll: rows*w copies in flight
                pid = page_table_ref[cell * rows + r, base + j]
                pltpu.make_async_copy(
                    pool_ref.at[layer, pid],
                    kv_buf.at[slot, r, j],
                    sems.at[slot, r, j],
                ).start()
                if quantized:
                    pltpu.make_async_copy(
                        sc_pool_ref.at[layer, pid],
                        sc_buf.at[slot, r, j],
                        sc_sems.at[slot, r, j],
                    ).start()

    def wait(slot):
        if ablate in ("nodma", "skeleton"):
            return
        for r in range(rows):
            for j in range(w):
                pltpu.make_async_copy(
                    pool_ref.at[layer, 0],
                    kv_buf.at[slot, r, j],
                    sems.at[slot, r, j],
                ).wait()
                if quantized:
                    pltpu.make_async_copy(
                        sc_pool_ref.at[layer, 0],
                        sc_buf.at[slot, r, j],
                        sc_sems.at[slot, r, j],
                    ).wait()

    # chunk count for the whole cell: the longest row decides; shorter rows
    # stream (and mask out) their already-allocated pages
    length = jnp.zeros((), jnp.int32)
    for r in range(rows):
        length = jnp.maximum(length, lengths_ref[cell * rows + r])
    # per-(row*group) length column [RG, 1] for masking the folded scores
    len_col = jnp.concatenate(
        [
            jnp.full((g, 1), lengths_ref[cell * rows + r], jnp.int32)
            for r in range(rows)
        ],
        axis=0,
    )
    num_used = jax.lax.div(length + ps - 1, ps)
    nc = jax.lax.div(num_used + w - 1, w)

    @pl.when(nc > 0)
    def _():
        issue(0, 0)

    if has_cur:
        # seed the online softmax with the current token's (always valid)
        # column: m = s_cur, l = 1, o = v_cur — no post-loop combine needed.
        # The token attends UNQUANTIZED (cur arrives in storage precision;
        # quantized mode pads its G axis to the scales-page sublane granule)
        # fp32 here regardless of mm_dtype: it's ONE column (VPU multiply +
        # reduce, no MXU), and Mosaic can't relayout bf16 through the
        # [RG, hd, 1] minor-dim insertion a dot_general would need
        cur_full = cur_ref[0].astype(jnp.float32)  # [rows, 2, G(_pad), hd]
        cur = cur_full[:, :, :g] if cur_full.shape[2] != g else cur_full
        k_cur = cur[:, 0].reshape(rg, hd)
        v_cur = cur[:, 1].reshape(rg, hd)
        s_cur = jnp.sum(
            q.astype(jnp.float32) * k_cur[:, None, :], axis=-1, keepdims=True
        ) * scale  # [RG, N, 1]
        m0 = s_cur
        l0 = jnp.ones((rg, n_heads, 1), jnp.float32)
        o0 = jnp.broadcast_to(
            v_cur[:, None, :], (rg, n_heads, hd)
        ).astype(jnp.float32)
    else:
        m0 = jnp.full((rg, n_heads, 1), -jnp.inf, jnp.float32)
        l0 = jnp.zeros((rg, n_heads, 1), jnp.float32)
        o0 = jnp.zeros((rg, n_heads, hd), jnp.float32)

    # per-row current-slot bookkeeping for the in-kernel append
    if commit:
        cur_pos = []
        for r in range(rows):
            len_r = lengths_ref[cell * rows + r]
            pos_r = jnp.minimum(len_r, pages_per_seq * ps - 1)
            cur_pos.append((pos_r // ps, pos_r % ps))
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, ps), 3)
        # fp32 staging: Mosaic only supports non-no-op minor-dim insertion
        # ([2, G, hd] -> [2, G, hd, 1]) for 32-bit types
        cur_f32 = cur_ref[0].astype(jnp.float32)  # [rows, 2, G(_pad), hd]
        if quantized:
            # in-kernel quantization of the committed token, over the
            # G-padded cur (pad groups are zero -> scale floor, dequant 0)
            amax = jnp.max(jnp.abs(cur_f32), axis=-1)  # [rows, 2, G_pad]
            cur_scale = jnp.maximum(amax, 1e-8) / 127.0
            cur_store = jnp.clip(
                jnp.round(cur_f32 / cur_scale[..., None]), -127.0, 127.0
            )[:, :, :g]  # page G axis is unpadded
            # store 0 (not the floor) for pad groups: keeps the kernel's
            # scales pool byte-equal to the XLA scatter append's
            gidx = jax.lax.broadcasted_iota(
                jnp.int32, cur_scale.shape, 2
            )
            cur_scale = jnp.where(gidx < g, cur_scale, 0.0)
            sc_lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, ps), 2)
        else:
            cur_store = cur_f32

        def stage_write(r, page_vals, sc_page_vals=None):
            """Insert row r's token into page_vals and DMA it home."""
            cpage, off = cur_pos[r]
            ins = jnp.where(
                lane == off, cur_store[r][:, :, :, None],
                page_vals.astype(jnp.float32),
            )
            wbuf[r] = ins.astype(wbuf.dtype)
            pid = page_table_ref[cell * rows + r, cpage]
            pltpu.make_async_copy(
                wbuf.at[r], pool_out_ref.at[layer, pid], wsems.at[r]
            ).start()
            if quantized:
                sc_ins = jnp.where(
                    sc_lane == off, cur_scale[r][:, :, None], sc_page_vals
                )
                swbuf[r] = sc_ins
                pltpu.make_async_copy(
                    swbuf.at[r], sc_out_ref.at[layer, pid], swsems.at[r]
                ).start()

    def body(c, carry):
        m_acc, l_acc, o_acc = carry
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < nc)
        def _():
            issue(c + 1, jax.lax.rem(c + 1, 2))

        wait(slot)
        if commit:
            # a row whose current page is in this chunk gets its token
            # inserted and the page written back (exactly one chunk matches
            # per row unless the slot opens a fresh page — handled below)
            for r in range(rows):
                cpage, off = cur_pos[r]
                for j in range(w):

                    @pl.when((c * w + j) == cpage)
                    def _(r=r, j=j):
                        stage_write(
                            r, kv_buf[slot, r, j],
                            sc_buf[slot, r, j] if quantized else None,
                        )

        if ablate == "skeleton":
            return m_acc, l_acc, o_acc
        if ablate == "nocompute":
            # DMA-cost isolation: touch the streamed buffer with one cheap
            # VPU read so the copies stay live, skip all matmul/softmax work
            probe = kv_buf[slot, :, 0, 0, :, :, 0].astype(jnp.float32)
            o_new = o_acc + jnp.sum(probe) * 1e-30
            return m_acc, l_acc, o_new

        # per-page matmuls (w static): kv_buf[slot, :, j, 0] is
        # [rows, G, hd, ps] -> folded [RG, hd, ps]; the hd contraction
        # against q needs no in-VMEM transpose of the streamed pages.
        # int8 pages: the per-token k scale multiplies the score COLUMNS
        # ([RG, ps], broadcast over heads) — hd never sees a dequant pass
        parts = []
        for j in range(w):
            kj = kv_buf[slot, :, j, 0].astype(mm_dtype).reshape(
                rg, hd, ps
            )
            s_j = jax.lax.dot_general(
                q, kj, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # [RG, N, ps]
            if quantized:
                ksc = sc_buf[slot, :, j, 0, :g].reshape(rg, ps)
                s_j = s_j * ksc[:, None, :]
            parts.append(s_j)
        s = jnp.concatenate(parts, axis=-1) if w > 1 else parts[0]
        pos = c * w * ps + jax.lax.broadcasted_iota(
            jnp.int32, (1, w * ps), 1
        )
        valid = pos < len_col  # [RG, w*ps]
        s = jnp.where(valid[:, None, :], s * scale, mask_value)

        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_acc, m_cur)
        alpha = jnp.exp(m_acc - m_new)
        p = jnp.exp(s - m_new)
        p = jnp.where(valid[:, None, :], p, 0.0)
        l_new = alpha * l_acc + jnp.sum(p, axis=-1, keepdims=True)
        o_new = o_acc * alpha
        for j in range(w):
            vj = kv_buf[slot, :, j, 1].astype(mm_dtype).reshape(
                rg, hd, ps
            )
            pj = p[..., j * ps:(j + 1) * ps]
            if quantized:
                # v's per-token scale folds into the probabilities (cheap
                # [RG, ps] multiply) instead of dequantizing the page
                vsc = sc_buf[slot, :, j, 1, :g].reshape(rg, ps)
                pj = pj * vsc[:, None, :]
            o_new = o_new + jax.lax.dot_general(
                pj.astype(mm_dtype), vj, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # [RG, N, hd]
        return m_new, l_new, o_new

    m, l, o = jax.lax.fori_loop(0, nc, body, (m0, l0, o0))

    if commit:
        # a row whose current page was NEVER streamed (it lies beyond the
        # cell's nc*w streamed pages — possible only when the slot opens a
        # fresh page, which holds no history) writes cur into an empty page.
        # Rows whose fresh page WAS streamed (a longer row in the cell set
        # nc) already committed inside the loop — exactly one write per row.
        zeros = jnp.zeros((2, g, hd, ps), wbuf.dtype)
        zeros_sc = (
            jnp.zeros(swbuf.shape[1:], jnp.float32) if quantized else None
        )
        for r in range(rows):
            cpage, _ = cur_pos[r]

            @pl.when(cpage >= nc * w)
            def _(r=r):
                stage_write(r, zeros, zeros_sc)

        for r in range(rows):  # exactly one write per row was started
            pltpu.make_async_copy(
                wbuf.at[r], pool_out_ref.at[layer, 0], wsems.at[r]
            ).wait()
            if quantized:
                pltpu.make_async_copy(
                    swbuf.at[r], sc_out_ref.at[layer, 0], swsems.at[r]
                ).wait()

    l_safe = jnp.where(l == 0.0, 1.0, l)
    o_ref[0] = (o / l_safe).reshape(rows, g, n_heads, hd).astype(o_ref.dtype)


def _run_decode_kernel(
    q, kv_pages, layer_idx, page_table, lengths, *, scale,
    k_cur=None, v_cur=None, kv_scales=None, commit=False, interpret=False,
):
    """Shared pallas_call builder.  kv_pages: the FULL pool
    [L, P, 2, G, hd_pad, ps]; kv_scales (int8 pools): [L, P, 2, G_pad, ps]
    fp32.  Returns out, plus the new pool(s) when commit:
    (out, new_pool) or (out, new_pool, new_scales)."""
    has_cur = k_cur is not None
    quantized = kv_scales is not None
    b, hq, hd = q.shape
    _, _, _, g, hd_pad, ps = kv_pages.shape
    n = hq // g
    pps = page_table.shape[1]
    gp = kv_scales.shape[3] if quantized else g

    def padded(x, tgt=None, axis=-1):
        tgt = hd_pad if tgt is None else tgt
        if x.shape[axis] == tgt:
            return x
        pad = [(0, 0)] * x.ndim
        pad[axis] = (0, tgt - x.shape[axis])
        return jnp.pad(x, pad)

    q_in = padded(q.reshape(b, g, n, hd))
    cur_in = None
    if has_cur:
        cur_in = jnp.stack([padded(k_cur), padded(v_cur)], axis=1)
        if quantized:
            # cur stays UNQUANTIZED for exact attention; ride in fp32 (tiny
            # buffer; bf16 here would both perturb the always-valid column
            # vs the oracle and round the in-kernel quantization away from
            # quantize_kv's fp32 result) and pad G to the scales-page
            # sublane granule so the quantizer emits G_pad-wide scales
            cur_in = padded(cur_in.astype(jnp.float32), gp, axis=2)
        else:
            cur_in = cur_in.astype(kv_pages.dtype)  # [B, 2, G, hd_pad]
    cur_g = gp if quantized else g

    # rows per grid cell / pages per chunk: target ~8 page copies in flight
    rows = 1
    for cand in (8, 4, 2):
        if b % cand == 0:
            rows = cand
            break
    window = 1
    if rows < 8:
        for cand in (2,):
            if pps % cand == 0 and rows * cand <= 8:
                window = cand
                break
    # tuning/ablation overrides (probe tools only)
    env_rows = os.environ.get("VATS_DECODE_ROWS")
    if env_rows and b % int(env_rows) == 0:
        rows = int(env_rows)
    env_window = os.environ.get("VATS_DECODE_WINDOW")
    if env_window:
        window = int(env_window)
    ablate = os.environ.get("VATS_DECODE_ABLATE") or None

    kernel = functools.partial(
        _decode_kernel,
        scale=scale,
        page_size=ps,
        pages_per_seq=pps,
        window=window,
        rows=rows,
        mask_value=DEFAULT_MASK_VALUE,
        has_cur=has_cur,
        commit=commit,
        quantized=quantized,
        ablate=ablate,
    )
    in_specs = [
        pl.BlockSpec(
            (1, rows, g, n, hd_pad), lambda c, *_: (c, 0, 0, 0, 0)
        ),
    ]
    inputs = [q_in.reshape(b // rows, rows, g, n, hd_pad)]
    if has_cur:
        in_specs.append(
            pl.BlockSpec(
                (1, rows, 2, cur_g, hd_pad), lambda c, *_: (c, 0, 0, 0, 0)
            )
        )
        inputs.append(cur_in.reshape(b // rows, rows, 2, cur_g, hd_pad))
    in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
    inputs.append(kv_pages)
    if quantized:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        inputs.append(kv_scales)

    o_spec = pl.BlockSpec(
        (1, rows, g, n, hd_pad), lambda c, *_: (c, 0, 0, 0, 0)
    )
    o_shape = jax.ShapeDtypeStruct((b // rows, rows, g, n, hd_pad), q.dtype)
    out_specs = o_spec
    out_shape = o_shape
    io_aliases = {}
    scratch = [
        pltpu.VMEM((2, rows, window, 2, g, hd_pad, ps), kv_pages.dtype),
    ]
    if quantized:
        scratch.append(pltpu.VMEM((2, rows, window, 2, gp, ps), jnp.float32))
    if commit:
        scratch.append(pltpu.VMEM((rows, 2, g, hd_pad, ps), kv_pages.dtype))
        if quantized:
            scratch.append(pltpu.VMEM((rows, 2, gp, ps), jnp.float32))
    scratch.append(pltpu.SemaphoreType.DMA((2, rows, window)))
    if quantized:
        scratch.append(pltpu.SemaphoreType.DMA((2, rows, window)))
    if commit:
        scratch.append(pltpu.SemaphoreType.DMA((rows,)))
        if quantized:
            scratch.append(pltpu.SemaphoreType.DMA((rows,)))
        out_specs = [o_spec, pl.BlockSpec(memory_space=pl.ANY)]
        out_shape = [
            o_shape, jax.ShapeDtypeStruct(kv_pages.shape, kv_pages.dtype)
        ]
        # aliasing indices count scalar-prefetch operands: inputs are
        # (lengths, table, layer, q, cur, pool[, scales]) -> pool is 5;
        # outputs (o, pool[, scales])
        io_aliases = {5: 1}
        if quantized:
            out_specs.append(pl.BlockSpec(memory_space=pl.ANY))
            out_shape.append(
                jax.ShapeDtypeStruct(kv_scales.shape, kv_scales.dtype)
            )
            io_aliases[6] = 2

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b // rows,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases=io_aliases,
        interpret=interpret,
        compiler_params=(
            None
            if interpret
            else pltpu.CompilerParams(
                has_side_effects=(
                    False
                    if os.environ.get("VATS_DECODE_NO_SIDE_EFFECTS") == "1"
                    else True
                )
            )
        ),
    )(
        lengths.astype(jnp.int32),
        page_table.astype(jnp.int32),
        jnp.asarray([layer_idx], jnp.int32),
        *inputs,
    )
    if commit and quantized:
        o, new_pool, new_scales = out
        o = o.reshape(b, g, n, hd_pad)[..., :hd].reshape(b, hq, hd)
        return o, new_pool, new_scales
    if commit:
        o, new_pool = out
        return o.reshape(b, g, n, hd_pad)[..., :hd].reshape(b, hq, hd), new_pool
    return out.reshape(b, g, n, hd_pad)[..., :hd].reshape(b, hq, hd)


def paged_decode_attention(
    q: jnp.ndarray,
    kv_pages: jnp.ndarray,
    page_table: jnp.ndarray,
    lengths: jnp.ndarray,
    *,
    scale: float,
    k_cur: Optional[jnp.ndarray] = None,
    v_cur: Optional[jnp.ndarray] = None,
    kv_scales: Optional[jnp.ndarray] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Pallas paged decode WITHOUT cache commit: q [B, Hq, hd] -> same.

    kv_pages: ONE layer's pool [P, 2, G, hd_pad, ps].  ``lengths`` counts
    settled history; optional ``k_cur/v_cur`` [B, G, hd] add the current
    token as one extra always-valid column (not written anywhere).
    int8 pools pass ``kv_scales`` [P, 2, G_pad, ps].
    """
    if not _HAS_PLTPU:
        return paged_decode_attention_xla(
            q, kv_pages, page_table, lengths, scale=scale,
            k_cur=k_cur, v_cur=v_cur, kv_scales=kv_scales,
        )
    return _run_decode_kernel(
        q, kv_pages[None], 0, page_table, lengths, scale=scale,
        k_cur=k_cur, v_cur=v_cur,
        kv_scales=kv_scales[None] if kv_scales is not None else None,
        commit=False, interpret=interpret,
    )


def paged_decode_attention_commit(
    q: jnp.ndarray,
    kv_pages: jnp.ndarray,
    layer_idx,
    page_table: jnp.ndarray,
    lengths: jnp.ndarray,
    *,
    scale: float,
    k_cur: jnp.ndarray,
    v_cur: jnp.ndarray,
    kv_scales: Optional[jnp.ndarray] = None,
    interpret: bool = False,
):
    """Serving hot path: attend the paged history + current token AND commit
    the token into its page, in one kernel.

    kv_pages: the FULL pool [L, P, 2, G, hd_pad, ps] (input/output-aliased —
    under jit the update is in place).  Returns (out [B, Hq, hd], new pool)
    — plus the new scales pool as a third element for int8 pools
    (``kv_scales`` [L, P, 2, G_pad, ps], also aliased).  ``lengths`` counts
    settled history; the committed slot is ``lengths[b]`` (clamped at
    capacity, mirroring ``append_token``).
    """
    if not _HAS_PLTPU:
        out = paged_decode_attention_xla(
            q, kv_pages[layer_idx], page_table, lengths, scale=scale,
            k_cur=k_cur, v_cur=v_cur,
            kv_scales=(
                kv_scales[layer_idx] if kv_scales is not None else None
            ),
        )
        tmp = PagedKVCache(
            kv_pages=kv_pages, page_table=page_table, lengths=lengths,
            kv_scales=kv_scales, head_dim=q.shape[-1],
        ).append_token(layer_idx, k_cur, v_cur)
        if kv_scales is not None:
            return out, tmp.kv_pages, tmp.kv_scales
        return out, tmp.kv_pages
    return _run_decode_kernel(
        q, kv_pages, layer_idx, page_table, lengths, scale=scale,
        k_cur=k_cur, v_cur=v_cur, kv_scales=kv_scales,
        commit=True, interpret=interpret,
    )

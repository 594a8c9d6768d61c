"""XLA reference attention: the numerics oracle for the Pallas kernels.

Replaces the reference's ``F.scaled_dot_product_attention`` fallback
(/root/reference/src/optimized_attention.py:657-723) with a single masked
attention covering everything the reference's *two* kernels span:

  * causal masking (torch path: ``tril`` bool mask, :681-698)
  * sliding window (left, right) — the torch fallback silently ignores the
    window (SURVEY.md §5); here the window is honored whenever
    ``left_window/right_window >= 0`` (negative = unbounded, matching the
    flash-attn ``window_size=(-1,-1)`` convention)
  * GQA/MQA without materializing repeated KV heads (the reference
    ``repeat_interleave``s K/V up to num_heads,
    /root/reference/utils/attention_utils.py:7-27; we instead fold the group
    structure into the einsum so KV stays [B, S, G, hd])
  * key-padding via a boolean validity mask or integer segment ids (the
    TPU-idiomatic replacement for flash-attn ``cu_seqlens`` unpadding)
  * explicit absolute q/kv positions so the same code serves full forwards
    and single-token decode against a static KV cache buffer.

Numerics: scores and softmax in float32 regardless of input dtype, mask value
-0.7*float32_max (not -inf, avoiding exp(-inf - -inf) NaNs).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def make_attention_mask(
    q_positions: jnp.ndarray,
    kv_positions: jnp.ndarray,
    *,
    causal: bool,
    left_window: int = -1,
    right_window: int = -1,
    kv_valid: Optional[jnp.ndarray] = None,
    q_segment_ids: Optional[jnp.ndarray] = None,
    kv_segment_ids: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Boolean [B, T, S] (or [T, S]) mask; True = attend.

    q_positions: [T] or [B, T] absolute positions of queries.
    kv_positions: [S] or [B, S] absolute positions of keys.
    kv_valid: optional [B, S] bool, False = padding / unwritten cache slot.
    segment ids: optional int arrays; attention only within equal segments.
    """
    q = q_positions[..., :, None]
    k = kv_positions[..., None, :]
    mask = jnp.ones(jnp.broadcast_shapes(q.shape, k.shape), dtype=bool)
    if causal:
        mask &= k <= q
        if right_window >= 0 and right_window != 0:
            # causal already enforces right window 0; keep reference rule of
            # forcing right_window to 0 under causal
            # (/root/reference/src/optimized_attention.py:518-521)
            pass
    elif right_window >= 0:
        mask &= (k - q) <= right_window
    if left_window >= 0:
        mask &= (q - k) <= left_window
    if kv_valid is not None:
        mask = mask & kv_valid[..., None, :]
    if q_segment_ids is not None and kv_segment_ids is not None:
        mask = mask & (
            q_segment_ids[..., :, None] == kv_segment_ids[..., None, :]
        )
    return mask


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: float,
    causal: bool = False,
    left_window: int = -1,
    right_window: int = -1,
    q_positions: Optional[jnp.ndarray] = None,
    kv_positions: Optional[jnp.ndarray] = None,
    kv_valid: Optional[jnp.ndarray] = None,
    q_segment_ids: Optional[jnp.ndarray] = None,
    kv_segment_ids: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    mask_value: float = DEFAULT_MASK_VALUE,
) -> jnp.ndarray:
    """Masked multi-head attention with grouped KV heads.

    q: [B, T, Hq, hd]; k, v: [B, S, G, hd] with Hq % G == 0.
    scale multiplies the raw scores (the reference passes ``softmax_scale``
    straight to SDPA's ``scale=``, /root/reference/src/optimized_attention.py:713).
    Returns [B, T, Hq, hd] in q.dtype.
    """
    b, t, hq, hd = q.shape
    _, s, g, _ = k.shape
    if hq % g != 0:
        raise ValueError(f"num q heads ({hq}) must be divisible by kv groups ({g})")
    n = hq // g

    if q_positions is None:
        q_positions = jnp.arange(t)
    if kv_positions is None:
        kv_positions = jnp.arange(s)

    qg = q.reshape(b, t, g, n, hd).astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)

    # [B, G, N, T, S]
    scores = jnp.einsum("btgnd,bsgd->bgnts", qg, kf) * scale

    mask = make_attention_mask(
        q_positions,
        kv_positions,
        causal=causal,
        left_window=left_window,
        right_window=right_window,
        kv_valid=kv_valid,
        q_segment_ids=q_segment_ids,
        kv_segment_ids=kv_segment_ids,
    )
    # Broadcast mask [*, T, S] -> [B, 1, 1, T, S]
    while mask.ndim < 3:
        mask = mask[None]
    scores = jnp.where(mask[:, None, None, :, :], scores, mask_value)
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)

    # fp32 softmax; guard fully-masked rows (e.g. padded queries) against NaN.
    scores_max = jnp.max(scores, axis=-1, keepdims=True)
    unnorm = jnp.exp(scores - scores_max)
    denom = jnp.sum(unnorm, axis=-1, keepdims=True)
    probs = unnorm / jnp.maximum(denom, 1e-30)

    out = jnp.einsum("bgnts,bsgd->btgnd", probs, vf)
    return out.reshape(b, t, hq, hd).astype(q.dtype)


def cached_decode_attention(
    q: jnp.ndarray,
    k_t: jnp.ndarray,
    v_t: jnp.ndarray,
    *,
    scale: float,
    causal: bool = True,
    left_window: int = -1,
    right_window: int = -1,
    q_positions: Optional[jnp.ndarray] = None,
    kv_positions: Optional[jnp.ndarray] = None,
    kv_valid: Optional[jnp.ndarray] = None,
    mask_value: float = DEFAULT_MASK_VALUE,
) -> jnp.ndarray:
    """Attention over the KVCache's native sequence-minor layout.

    q: [B, T, Hq, hd]; k_t, v_t: [B, G, hd, S] (nn.KVCache.layer_t).  Same
    semantics as :func:`dot_product_attention` for the cached path (position
    masks, windows, validity), but never materializes a head_dim-minor
    [B, S, G, hd] buffer — which would pay the 128-lane tile pad at the
    reference tiers' head_dim 60 (see nn/kv_cache.py docstring).
    """
    b, t, hq, hd = q.shape
    _, g, _, s = k_t.shape
    if hq % g != 0:
        raise ValueError(f"num q heads ({hq}) must be divisible by kv groups ({g})")
    n = hq // g

    if q_positions is None:
        q_positions = jnp.arange(t)
    if kv_positions is None:
        kv_positions = jnp.arange(s)

    qg = q.reshape(b, t, g, n, hd).astype(jnp.float32)
    kf = k_t.astype(jnp.float32)
    vf = v_t.astype(jnp.float32)

    # [B, G, N, T, S]
    scores = jnp.einsum("btgnd,bgds->bgnts", qg, kf) * scale

    mask = make_attention_mask(
        q_positions,
        kv_positions,
        causal=causal,
        left_window=left_window,
        right_window=right_window,
        kv_valid=kv_valid,
    )
    while mask.ndim < 3:
        mask = mask[None]
    scores = jnp.where(mask[:, None, None, :, :], scores, mask_value)

    scores_max = jnp.max(scores, axis=-1, keepdims=True)
    unnorm = jnp.exp(scores - scores_max)
    denom = jnp.sum(unnorm, axis=-1, keepdims=True)
    probs = unnorm / jnp.maximum(denom, 1e-30)

    out = jnp.einsum("bgnts,bgds->btgnd", probs, vf)
    return out.reshape(b, t, hq, hd).astype(q.dtype)

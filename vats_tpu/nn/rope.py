"""Rotary positional embeddings (1D interleaved), fp32 island.

Mirrors the reference's interleaved even/odd rotation
(/root/reference/src/optimized_attention.py:97-143):

    x1 = x[..., 0::2]; x2 = x[..., 1::2]
    out[..., 0::2] = x1*cos - x2*sin
    out[..., 1::2] = x1*sin + x2*cos

with fp32 ``inv_freq`` (:38).  TPU design difference: no lazy sin/cos cache —
under jit the tables are constant-folded per (shape, positions) trace, and for
decode we pass explicit absolute positions instead of re-deriving from the
current slice length.  (The reference's cached-decode path rotates every new
token at position 0, a catalogued defect — SURVEY.md §2.13; we implement the
correct absolute-position behavior, which matches the reference's *uncached*
full-sequence forward.)

2D/3D axial and NTK-scaled variants for the vision / generation stacks live
here too so every model family shares one RoPE implementation.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp


def rope_inv_freq(head_dim: int, theta: float, dtype=jnp.float32) -> jnp.ndarray:
    """inv_freq[i] = 1 / theta^(2i/head_dim), i over even dims."""
    if head_dim % 2 != 0:
        raise ValueError(f"head_dim ({head_dim}) must be even for RoPE")
    exponents = jnp.arange(0, head_dim, 2, dtype=dtype) / head_dim
    return 1.0 / (theta**exponents)


def rope_cos_sin(
    positions: jnp.ndarray, head_dim: int, theta: float
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables for integer positions.

    positions: [T] or [B, T] (int or float) -> cos/sin of shape
    positions.shape + [head_dim//2], float32.
    """
    inv_freq = rope_inv_freq(head_dim, theta)
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq
    return jnp.cos(freqs), jnp.sin(freqs)


def apply_rope_interleaved(
    x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray
) -> jnp.ndarray:
    """Rotate interleaved (even, odd) feature pairs of the last axis.

    x: [..., T, H, head_dim]; cos/sin: [T, head_dim//2] or [B, T, head_dim//2]
    (broadcast over the heads axis).  Computed in fp32, returned in x.dtype.
    """
    x32 = x.astype(jnp.float32)
    x1 = x32[..., 0::2]
    x2 = x32[..., 1::2]
    # Insert the heads axis for broadcasting: [..., T, 1, head_dim//2]
    c = cos[..., None, :]
    s = sin[..., None, :]
    r1 = x1 * c - x2 * s
    r2 = x1 * s + x2 * c
    out = jnp.stack([r1, r2], axis=-1).reshape(x.shape)
    return out.astype(x.dtype)


def apply_rope_1d(
    x: jnp.ndarray,
    positions: jnp.ndarray,
    theta: float,
) -> jnp.ndarray:
    """1D RoPE on [B, T, H, head_dim] given absolute positions [T] or [B, T]."""
    cos, sin = rope_cos_sin(positions, x.shape[-1], theta)
    return apply_rope_interleaved(x, cos, sin)


# ---------------------------------------------------------------------------
# Axial 2D RoPE (ViT-2D): rotate x/y halves of head_dim.
# Reference: /root/reference/src/transformers/vision/vit_2d/optimized_attention.py:20-197
# (head_dim % 4 == 0; axial rotations over the flattened H*W grid).
# ---------------------------------------------------------------------------


def grid_positions_2d(grid_h: int, grid_w: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Row/col position ids for a flattened [grid_h*grid_w] token grid."""
    rows = jnp.repeat(jnp.arange(grid_h), grid_w)
    cols = jnp.tile(jnp.arange(grid_w), grid_h)
    return rows, cols


def apply_rope_2d_axial(
    x: jnp.ndarray,
    grid_h: int,
    grid_w: int,
    theta: float,
    ntk_scale_factor: Optional[float] = None,
) -> jnp.ndarray:
    """Axial 2D RoPE on [B, N, H, head_dim] with N == grid_h*grid_w.

    Exactly mirrors the ViT-2D reference layout
    (/root/reference/src/transformers/vision/vit_2d/optimized_attention.py:20-197):
    head_dim splits into four contiguous quarters (x1, x2, y1, y2); the pair
    (x1, x2) rotates by row angles, (y1, y2) by column angles, with
    ``inv_freq = theta^-(i/freq_dim)`` over freq_dim = head_dim//4 pairs.
    ``ntk_scale_factor`` multiplies the positions (NTK-aware scaling used by
    the image-gen stack, /root/reference/.../rope_2d.py:106-115).
    """
    head_dim = x.shape[-1]
    if head_dim % 4 != 0:
        raise ValueError(f"head_dim ({head_dim}) must be divisible by 4 for 2D RoPE")
    freq_dim = head_dim // 4
    rows, cols = grid_positions_2d(grid_h, grid_w)
    rows = rows.astype(jnp.float32)
    cols = cols.astype(jnp.float32)
    if ntk_scale_factor is not None:
        rows = rows * ntk_scale_factor
        cols = cols * ntk_scale_factor
    inv_freq = 1.0 / (theta ** (jnp.arange(freq_dim, dtype=jnp.float32) / freq_dim))
    theta_r = rows[:, None] * inv_freq  # [N, freq_dim]
    theta_c = cols[:, None] * inv_freq
    cos_r, sin_r = jnp.cos(theta_r), jnp.sin(theta_r)
    cos_c, sin_c = jnp.cos(theta_c), jnp.sin(theta_c)
    # broadcast over batch and heads: [1, N, 1, freq_dim]
    cos_r, sin_r = cos_r[None, :, None, :], sin_r[None, :, None, :]
    cos_c, sin_c = cos_c[None, :, None, :], sin_c[None, :, None, :]

    x32 = x.astype(jnp.float32)
    x1 = x32[..., 0 * freq_dim : 1 * freq_dim]
    x2 = x32[..., 1 * freq_dim : 2 * freq_dim]
    y1 = x32[..., 2 * freq_dim : 3 * freq_dim]
    y2 = x32[..., 3 * freq_dim : 4 * freq_dim]
    out = jnp.concatenate(
        [
            x1 * cos_r - x2 * sin_r,
            x1 * sin_r + x2 * cos_r,
            y1 * cos_c - y2 * sin_c,
            y1 * sin_c + y2 * cos_c,
        ],
        axis=-1,
    )
    return out.astype(x.dtype)


def apply_rope_2d_ntk(
    x: jnp.ndarray,
    grid_h: int,
    grid_w: int,
    theta: float,
    ntk_scale_factor: Optional[float] = None,
) -> jnp.ndarray:
    """NTK-scaled 2D RoPE (image-gen flavor) on [B, N, heads, head_dim].

    Mirrors the reference ``NTKRoPE2D``
    (/root/reference/src/autoregressive_image_gen/autoregressive_transformer/
    attention/rope_2d.py:10-213): complex (interleaved-pair) rotation where
    pair i < head_dim//4 rotates by row-position angles and the remaining
    pairs by column-position angles; NTK scaling multiplies the grid
    positions (:106-115).  fp32 island.
    """
    head_dim = x.shape[-1]
    if head_dim % 4 != 0:
        raise ValueError(f"head_dim ({head_dim}) must be divisible by 4")
    half = head_dim // 2
    inv_freq = rope_inv_freq(half, theta)  # [head_dim//4]
    rows, cols = grid_positions_2d(grid_h, grid_w)
    rows = rows.astype(jnp.float32)
    cols = cols.astype(jnp.float32)
    if ntk_scale_factor is not None:
        rows = rows * ntk_scale_factor
        cols = cols * ntk_scale_factor
    angles = jnp.concatenate(
        [rows[:, None] * inv_freq, cols[:, None] * inv_freq], axis=-1
    )  # [N, head_dim//2]
    return apply_rope_interleaved(x, jnp.cos(angles), jnp.sin(angles))


def apply_rope_2d_ntk_positions(
    x: jnp.ndarray,
    positions: jnp.ndarray,
    grid_w: int,
    theta: float,
    ntk_scale_factor: Optional[float] = None,
) -> jnp.ndarray:
    """NTK 2D RoPE from flattened raster-order positions (row-major).

    Equivalent to :func:`apply_rope_2d_ntk` when positions == arange(N), but
    works for KV-cached decode where a single new token sits at an arbitrary
    absolute position: row = pos // grid_w, col = pos % grid_w.
    """
    head_dim = x.shape[-1]
    if head_dim % 4 != 0:
        raise ValueError(f"head_dim ({head_dim}) must be divisible by 4")
    half = head_dim // 2
    inv_freq = rope_inv_freq(half, theta)
    rows = (positions // grid_w).astype(jnp.float32)
    cols = (positions % grid_w).astype(jnp.float32)
    if ntk_scale_factor is not None:
        rows = rows * ntk_scale_factor
        cols = cols * ntk_scale_factor
    angles = jnp.concatenate(
        [rows[..., None] * inv_freq, cols[..., None] * inv_freq], axis=-1
    )
    return apply_rope_interleaved(x, jnp.cos(angles), jnp.sin(angles))


# ---------------------------------------------------------------------------
# Axial 3D RoPE (ViT-3D / video-gen): rotate t/h/w sections of head_dim.
# Reference: /root/reference/src/transformers/vision/vit_3d/rope_3d.py:9-237
# (head_dim % 6 == 0; per-axis inverse-frequency tables, partial-dim
# rotation with pass-through slices).  The video-gen stack's NTKRoPE3D is an
# identity stub in the reference (SURVEY.md §2.13.3) — here it is real.
# ---------------------------------------------------------------------------


def apply_rope_3d_ntk_positions(
    x: jnp.ndarray,
    positions: jnp.ndarray,
    grid_h: int,
    grid_w: int,
    theta: float,
    ntk_scale_factor: Optional[float] = None,
) -> jnp.ndarray:
    """Interleaved 3D RoPE from flattened raster-order positions (t-major).

    The decode-time counterpart of the 3D rotation for video token streams:
    t = pos // (grid_h*grid_w), then (h, w) raster within the frame.  The
    head_dim//2 interleaved angle vector splits into three equal chunks
    rotating by t / h / w coordinates (head_dim % 6 == 0, the reference's
    RoPE3D rule, /root/reference/src/transformers/vision/vit_3d/rope_3d.py).
    The reference's own NTKRoPE3D is an identity stub (SURVEY.md §2.13.3);
    this is the designed behavior.  Works for full forwards
    (positions == arange(N)) and paged decode (per-row scalar positions).
    """
    head_dim = x.shape[-1]
    if head_dim % 6 != 0:
        raise ValueError(f"head_dim ({head_dim}) must be divisible by 6")
    c = head_dim // 6  # pairs per axis
    inv_freq = 1.0 / (theta ** (jnp.arange(c, dtype=jnp.float32) / c))
    fpf = grid_h * grid_w  # tokens per frame
    ts = (positions // fpf).astype(jnp.float32)
    rem = positions % fpf
    rows = (rem // grid_w).astype(jnp.float32)
    cols = (rem % grid_w).astype(jnp.float32)
    if ntk_scale_factor is not None:
        ts = ts * ntk_scale_factor
        rows = rows * ntk_scale_factor
        cols = cols * ntk_scale_factor
    angles = jnp.concatenate(
        [
            ts[..., None] * inv_freq,
            rows[..., None] * inv_freq,
            cols[..., None] * inv_freq,
        ],
        axis=-1,
    )  # positions.shape + [head_dim//2]
    return apply_rope_interleaved(x, jnp.cos(angles), jnp.sin(angles))


def apply_rope_3d_axial(
    x: jnp.ndarray,
    grid_t: int,
    grid_h: int,
    grid_w: int,
    theta: float,
    mode: str = "all",
    ntk_scale_factor: Optional[float] = None,
    t_positions: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Axial 3D RoPE.

    mode='all':      x is [B, T*H*W(N), heads, head_dim]; rotate t, h and w
                     thirds of head_dim by their respective coordinates.
    mode='spatial':  x is [B*T, H*W, heads, head_dim]; rotate the h/w thirds,
                     pass the t third through unchanged.
    mode='temporal': x is [B*H*W, T, heads, head_dim]; rotate the t third.
    """
    head_dim = x.shape[-1]
    if head_dim % 6 != 0:
        raise ValueError(f"head_dim ({head_dim}) must be divisible by 6 for 3D RoPE")
    third = head_dim // 3

    def scale(p):
        if ntk_scale_factor is None:
            return p
        return p.astype(jnp.float32) * ntk_scale_factor

    if mode == "spatial":
        n = x.shape[1]
        if n != grid_h * grid_w:
            raise ValueError(f"spatial mode expects N == grid_h*grid_w, got {n}")
        rows, cols = grid_positions_2d(grid_h, grid_w)
        cos_h, sin_h = rope_cos_sin(scale(rows), third, theta)
        cos_w, sin_w = rope_cos_sin(scale(cols), third, theta)
        t_part = x[..., :third]
        h_part = apply_rope_interleaved(x[..., third : 2 * third], cos_h, sin_h)
        w_part = apply_rope_interleaved(x[..., 2 * third :], cos_w, sin_w)
        return jnp.concatenate([t_part, h_part, w_part], axis=-1)
    if mode == "temporal":
        t = x.shape[1]
        # explicit absolute frame positions enable KV-cached temporal decode
        pos_t = t_positions if t_positions is not None else jnp.arange(t)
        cos_t, sin_t = rope_cos_sin(scale(pos_t), third, theta)
        t_part = apply_rope_interleaved(x[..., :third], cos_t, sin_t)
        return jnp.concatenate([t_part, x[..., third:]], axis=-1)
    if mode == "all":
        n = x.shape[1]
        if n != grid_t * grid_h * grid_w:
            raise ValueError("mode='all' expects N == grid_t*grid_h*grid_w")
        ts = jnp.repeat(jnp.arange(grid_t), grid_h * grid_w)
        rows = jnp.tile(jnp.repeat(jnp.arange(grid_h), grid_w), grid_t)
        cols = jnp.tile(jnp.arange(grid_w), grid_t * grid_h)
        cos_t, sin_t = rope_cos_sin(scale(ts), third, theta)
        cos_h, sin_h = rope_cos_sin(scale(rows), third, theta)
        cos_w, sin_w = rope_cos_sin(scale(cols), third, theta)
        t_part = apply_rope_interleaved(x[..., :third], cos_t, sin_t)
        h_part = apply_rope_interleaved(x[..., third : 2 * third], cos_h, sin_h)
        w_part = apply_rope_interleaved(x[..., 2 * third :], cos_w, sin_w)
        return jnp.concatenate([t_part, h_part, w_part], axis=-1)
    raise ValueError(f"unknown 3D RoPE mode: {mode}")

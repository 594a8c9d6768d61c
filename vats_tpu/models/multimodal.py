"""Fused text+image+video token-stream decoder (BASELINE config #5).

One decoder-only transformer models the fused stream

    [text prompt][image raster tokens][video raster tokens]

with a single KV cache (dense or paged).  Design rationale:

  * The reference's video-gen stack feeds text only through cross-attention
    (/root/reference/src/autoregressive_video_gen/autoregressive_transformer/
    cross_attention.py:100-104) and its generation files are empty
    (SURVEY.md §2.13.1); the north star instead demands a fused multimodal
    stream with a paged KV cache — this module is that designed behavior.
  * Unified vocabulary: token ids are offset-partitioned
    (text: [0, Vt), image: [Vt, Vt+Vi), video: [Vt+Vi, Vt+Vi+Vv)) so one
    embedding table + one tied LM head cover all modalities — one gather per
    step, no per-modality branching inside the jitted graph.
  * Modality-dependent RoPE: each token's rotation angles depend on its
    modality — 1D stream position for text, raster 2D-NTK inside the image
    grid, raster 3D-NTK inside the video grid — using the SAME angle
    formulas as the standalone stacks (vats_tpu/nn/rope.py), computed once
    per step as [B, T, head_dim//2] cos/sin tables shared by every layer
    (``rope_angles`` pass-through in vats_tpu.nn.attention).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from vats_tpu.configs.multimodal import MultimodalStreamArgs
from vats_tpu.models.text_lm import resolve_dtype
from vats_tpu.nn.activations import FFNBlock
from vats_tpu.nn.attention import AttentionBlock
from vats_tpu.nn.initializers import embed_init, head_init
from vats_tpu.nn.kv_cache import KVCache
from vats_tpu.nn.norms import RMSNorm
from vats_tpu.nn.rope import rope_inv_freq

MODALITY_TEXT = 0
MODALITY_IMAGE = 1
MODALITY_VIDEO = 2


def multimodal_rope_angles(
    cfg: MultimodalStreamArgs,
    modality: jnp.ndarray,
    local_pos: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-token (cos, sin) tables of shape modality.shape + [head_dim//2].

    modality: int array (0=text, 1=image, 2=video); local_pos: segment-local
    position (text: stream index; image/video: raster index in the grid).
    Matches apply_rope_1d / apply_rope_2d_ntk_positions /
    apply_rope_3d_ntk_positions exactly, so a fused stream containing only
    one modality reproduces that stack's rotation bit-for-bit.
    """
    hd = cfg.head_dim
    half = hd // 2
    pos = local_pos.astype(jnp.float32)
    ntk = cfg.ntk_scale_factor if cfg.ntk_scale_factor is not None else 1.0

    # text: 1D angles over head_dim//2 pairs
    ang_text = pos[..., None] * rope_inv_freq(hd, cfg.rope_theta)

    # image: 2D-NTK raster — two chunks of head_dim//4 pairs
    ivf2 = rope_inv_freq(half, cfg.rope_theta)  # [hd//4]
    rows = (local_pos // cfg.image_grid_w).astype(jnp.float32) * ntk
    cols = (local_pos % cfg.image_grid_w).astype(jnp.float32) * ntk
    ang_img = jnp.concatenate(
        [rows[..., None] * ivf2, cols[..., None] * ivf2], axis=-1
    )

    # video: 3D-NTK raster — three chunks of head_dim//6 pairs
    c = hd // 6
    ivf3 = 1.0 / (cfg.rope_theta ** (jnp.arange(c, dtype=jnp.float32) / c))
    fpf = cfg.video_grid_h * cfg.video_grid_w
    ts = (local_pos // fpf).astype(jnp.float32) * ntk
    rem = local_pos % fpf
    vrows = (rem // cfg.video_grid_w).astype(jnp.float32) * ntk
    vcols = (rem % cfg.video_grid_w).astype(jnp.float32) * ntk
    ang_vid = jnp.concatenate(
        [ts[..., None] * ivf3, vrows[..., None] * ivf3, vcols[..., None] * ivf3],
        axis=-1,
    )

    m = modality[..., None]
    angles = jnp.where(
        m == MODALITY_TEXT, ang_text,
        jnp.where(m == MODALITY_IMAGE, ang_img, ang_vid),
    )
    return jnp.cos(angles), jnp.sin(angles)


class MultimodalLM(nn.Module):
    """Decoder-only transformer over the fused multimodal stream."""

    cfg: MultimodalStreamArgs

    @nn.compact
    def __call__(
        self,
        token_ids: jnp.ndarray,
        modality: jnp.ndarray,
        local_pos: jnp.ndarray,
        padding_mask: Optional[jnp.ndarray] = None,
        cache: Optional[KVCache] = None,
        paged_cache=None,
        deterministic: bool = True,
        readout_positions: Optional[jnp.ndarray] = None,
    ):
        """token_ids: [B, T] fused-vocab ids; modality/local_pos: [B, T].

        Returns (logits [B, T, vocab] fp32, updated cache or None).
        readout_positions: optional [B] int32 — logits only at these per-row
        positions ([B, 1, vocab]); serving prefill skips the [B, T, V] buffer.
        """
        cfg = self.cfg
        dtype = resolve_dtype(cfg.dtype)
        param_dtype = resolve_dtype(cfg.param_dtype)

        embed = nn.Embed(
            num_embeddings=cfg.vocab_size,
            features=cfg.d_model,
            embedding_init=nn.with_logical_partitioning(
                embed_init(), ("vocab", "embed")
            ),
            dtype=dtype,
            param_dtype=param_dtype,
            name="token_embed",
        )
        x = embed(token_ids.astype(jnp.int32))
        x = nn.Dropout(rate=cfg.dropout)(x, deterministic=deterministic)

        rope_angles = multimodal_rope_angles(cfg, modality, local_pos)

        new_cache = cache
        new_paged = paged_cache
        for i in range(cfg.num_layers):
            x, returned = AttentionBlock(
                d_model=cfg.d_model,
                num_heads=cfg.num_heads,
                query_groups=cfg.query_groups,
                rope_theta=cfg.rope_theta,
                softmax_scale=cfg.softmax_scale,
                use_proj_bias=cfg.use_proj_bias,
                use_qkv_proj=cfg.use_qkv_proj,
                use_qk_norm=cfg.use_qk_norm,
                dropout=cfg.dropout,
                eps=cfg.rms_norm_eps,
                num_layers=cfg.num_layers,
                impl=cfg.attention_impl,
                rope_type="none",  # angles supplied per token
                dtype=dtype,
                param_dtype=param_dtype,
                name=f"attn_{i}",
            )(
                x,
                causal=True,
                padding_mask=padding_mask,
                cache=new_cache,
                paged_cache=new_paged,
                layer_idx=i,
                rope_angles=rope_angles,
                deterministic=deterministic,
            )
            if paged_cache is not None:
                new_paged = returned
            else:
                new_cache = returned
            x = FFNBlock(
                d_model=cfg.d_model,
                d_ffn=cfg.d_ffn,
                dropout=cfg.dropout,
                eps=cfg.rms_norm_eps,
                num_layers=cfg.num_layers,
                dtype=dtype,
                param_dtype=param_dtype,
                name=f"ffn_{i}",
            )(x, deterministic=deterministic)

        t = token_ids.shape[1]
        if paged_cache is not None:
            # ragged advance: each row gains its true token count
            if padding_mask is not None and t > 1:
                counts = jnp.sum(padding_mask.astype(jnp.int32), axis=1)
            else:
                counts = jnp.full((token_ids.shape[0],), t, jnp.int32)
            new_cache = new_paged.advance_by(counts)
        elif new_cache is not None:
            new_cache = new_cache.advance(t)

        x = RMSNorm(cfg.d_model, cfg.rms_norm_eps, dtype, param_dtype)(x)

        if readout_positions is not None:
            x = jnp.take_along_axis(
                x, readout_positions.astype(jnp.int32)[:, None, None], axis=1
            )

        if cfg.tie_weights:
            logits = embed.attend(x.astype(param_dtype))
        else:
            logits = nn.DenseGeneral(
                features=cfg.vocab_size,
                use_bias=False,
                kernel_init=nn.with_logical_partitioning(
                    head_init(), ("embed", "vocab")
                ),
                dtype=dtype,
                param_dtype=param_dtype,
                name="lm_head",
            )(x)
        logits = logits.astype(jnp.float32)
        return logits, new_cache

    def init_cache(self, batch_size: int, max_len: Optional[int] = None) -> KVCache:
        cfg = self.cfg
        return KVCache.create(
            num_layers=cfg.num_layers,
            batch_size=batch_size,
            max_seq_len=max_len or cfg.max_seq_len,
            kv_heads=cfg.query_groups,
            head_dim=cfg.head_dim,
            dtype=resolve_dtype(cfg.dtype),
        )

    def init_paged_cache(
        self, batch_size: int, max_len: Optional[int] = None, page_size: int = 128
    ):
        from vats_tpu.ops.decode_attention import PagedKVCache

        cfg = self.cfg
        return PagedKVCache.create(
            num_layers=cfg.num_layers,
            batch_size=batch_size,
            max_seq_len=max_len or cfg.max_seq_len,
            kv_heads=cfg.query_groups,
            head_dim=cfg.head_dim,
            page_size=page_size,
            dtype=resolve_dtype(cfg.dtype),
        )


def stream_layout(
    cfg: MultimodalStreamArgs, text_len: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(modality [S], local_pos [S]) for the canonical fused layout
    [text_len][image_tokens][video_tokens]."""
    n_img, n_vid = cfg.image_tokens, cfg.video_tokens
    modality = jnp.concatenate([
        jnp.full((text_len,), MODALITY_TEXT, jnp.int32),
        jnp.full((n_img,), MODALITY_IMAGE, jnp.int32),
        jnp.full((n_vid,), MODALITY_VIDEO, jnp.int32),
    ])
    local_pos = jnp.concatenate([
        jnp.arange(text_len, dtype=jnp.int32),
        jnp.arange(n_img, dtype=jnp.int32),
        jnp.arange(n_vid, dtype=jnp.int32),
    ])
    return modality, local_pos

"""ViT-3D video encoder with factorized spatio-temporal attention.

TPU-native rebuild of ``VideoTransformer``
(/root/reference/src/transformers/vision/vit_3d/model.py:16-314):

  per-frame bilinear resize -> pad/truncate frames to max_frames (frame mask)
  -> Conv3D(k=p, s=p, bias-free) patchify -> frame->patch mask
  (/root/reference/src/transformers/vision/vit_3d/patch_embeddings3d.py:44-209)
  -> N x [ SpatioTemporalAttentionBlock -> FFNBlock ] -> RMSNorm
  -> flatten to [B, T*H*W, d_model] for LLM consumption.

Factorized attention (optimized_attention.py:617-670) is *sequential*:
spatial pass over [B*T, H*W] tokens, then temporal pass over [B*HW, T] of the
spatial output, sharing ONE w_qkv and ONE w_o; 3D RoPE rotates the h/w thirds
of head_dim in spatial mode and the t third in temporal mode.  Complexity
O(T*(HW)^2 + HW*T^2) instead of O((T*HW)^2).

Fixes vs reference defects (SURVEY.md §2.13): the temporal padding-mask
reshape transposes t-major [B, T*HW] correctly to [B*HW, T] (the reference
views without transposing), and an optional pooled classifier head exists so
the classification train loop is runnable.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from vats_tpu.configs.vit3d import ViT3DArgs
from vats_tpu.models.text_lm import resolve_dtype
from vats_tpu.nn.activations import FFNBlock
from vats_tpu.nn.initializers import input_proj_init, output_proj_init
from vats_tpu.nn.norms import RMSNorm, l2_normalize
from vats_tpu.nn.rope import apply_rope_3d_axial
from vats_tpu.ops import dot_product_attention
from vats_tpu.parallel import with_logical_constraint


class PatchEmbeddings3D(nn.Module):
    cfg: ViT3DArgs

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        frame_mask: Optional[jnp.ndarray] = None,
        use_padding: bool = True,
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray], Tuple[int, int, int]]:
        """[B, C, T, H, W] -> ([B, gT, gH*gW, d], patch_mask [B, N] | None,
        (gT, gH, gW)).

        frame_mask: optional [B, T] bool marking valid input frames.
        """
        cfg = self.cfg
        dtype = resolve_dtype(cfg.dtype)
        param_dtype = resolve_dtype(cfg.param_dtype)
        if x.ndim != 5:
            raise ValueError(f"expected [B, C, T, H, W], got {x.shape}")
        b, c, t, h, w = x.shape
        th, tw = cfg.target_size
        pt, ph, pw = cfg.patch_size

        # per-frame bilinear resize to target (patch_embeddings3d.py:74-79)
        x = x.astype(dtype)
        x = jax.image.resize(x, (b, c, t, th, tw), method="bilinear")

        # pad / truncate the time axis to max_frames (:107-144)
        mf = cfg.max_frames
        if frame_mask is None and use_padding:
            frame_mask = jnp.ones((b, t), dtype=bool)
        if t < mf:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, mf - t), (0, 0), (0, 0)))
            if frame_mask is not None:
                frame_mask = jnp.pad(frame_mask, ((0, 0), (0, mf - t)))
        elif t > mf:
            x = x[:, :, :mf]
            if frame_mask is not None:
                frame_mask = frame_mask[:, :mf]

        gt, gh, gw = mf // pt, th // ph, tw // pw
        n = gt * gh * gw

        # Conv3D patchify, bias-free (:30-42); NCTHW -> NTHWC for TPU conv
        x = jnp.transpose(x, (0, 2, 3, 4, 1))
        fan_out = pt * ph * pw * cfg.d_model
        x = nn.Conv(
            features=cfg.d_model,
            kernel_size=(pt, ph, pw),
            strides=(pt, ph, pw),
            padding="VALID",
            use_bias=False,
            kernel_init=nn.with_logical_partitioning(
                nn.initializers.normal(stddev=math.sqrt(2.0 / fan_out)),
                (None, None, None, "conv_in", "conv_out"),
            ),
            dtype=dtype,
            param_dtype=param_dtype,
            name="projection",
        )(x)  # [B, gT, gH, gW, d]
        x = x.reshape(b, gt, gh * gw, cfg.d_model)

        # frame mask -> temporal-grid mask via ceil max-pool, then spatial
        # expansion (:167-190): a grid cell is valid if ANY of its pt frames is
        patch_mask = None
        if frame_mask is not None:
            fm = frame_mask.reshape(b, gt, pt)
            pooled = jnp.any(fm, axis=-1)  # [B, gT]
            patch_mask = jnp.broadcast_to(
                pooled[:, :, None], (b, gt, gh * gw)
            ).reshape(b, n)
        return x, patch_mask, (gt, gh, gw)


class SpatioTemporalAttention(nn.Module):
    """Sequential factorized attention with shared projections.

    Reference: optimized_attention.py:21-670 (w_qkv/w_o shared across the
    spatial and temporal passes, :56-67).
    """

    cfg: ViT3DArgs

    def setup(self):
        cfg = self.cfg
        dtype = resolve_dtype(cfg.dtype)
        param_dtype = resolve_dtype(cfg.param_dtype)
        h, g, hd = cfg.num_heads, cfg.query_groups, cfg.head_dim
        self.w_qkv = nn.DenseGeneral(
            features=(h + 2 * g) * hd,
            use_bias=cfg.use_proj_bias,
            kernel_init=nn.with_logical_partitioning(
                input_proj_init(cfg.num_layers), ("embed", "qkv")
            ),
            dtype=dtype,
            param_dtype=param_dtype,
            name="w_qkv",
        )
        self.w_o = nn.DenseGeneral(
            features=cfg.d_model,
            use_bias=cfg.use_proj_bias,
            kernel_init=nn.with_logical_partitioning(
                output_proj_init(cfg.num_layers), ("heads", "embed")
            ),
            dtype=dtype,
            param_dtype=param_dtype,
            name="w_o",
        )

    def _attend(
        self,
        x2d: jnp.ndarray,
        grid_shape: Tuple[int, int, int],
        mode: str,
        kv_valid: Optional[jnp.ndarray],
    ) -> jnp.ndarray:
        """x2d: [B', L, d] (B'=B*T spatial, B*HW temporal) -> [B', L, d]."""
        cfg = self.cfg
        bp, l, _ = x2d.shape
        h, g, hd = cfg.num_heads, cfg.query_groups, cfg.head_dim
        qkv = self.w_qkv(x2d)
        q, kv = jnp.split(qkv, [h * hd], axis=-1)
        k, v = jnp.split(kv, 2, axis=-1)
        q = q.reshape(bp, l, h, hd)
        k = k.reshape(bp, l, g, hd)
        v = v.reshape(bp, l, g, hd)
        if cfg.use_qk_norm:
            q, k = l2_normalize(q), l2_normalize(k)
        gt, gh, gw = grid_shape
        q = apply_rope_3d_axial(q, gt, gh, gw, cfg.rope_theta, mode=mode)
        k = apply_rope_3d_axial(k, gt, gh, gw, cfg.rope_theta, mode=mode)
        left, right = cfg.window_size
        return dot_product_attention(
            q,
            k,
            v,
            scale=cfg.softmax_scale,
            causal=False,
            left_window=left,
            right_window=right,
            kv_valid=kv_valid,
        ).reshape(bp, l, h * hd)

    def __call__(
        self,
        x: jnp.ndarray,
        grid_shape: Tuple[int, int, int],
        patch_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """x: [B, gT, HW, d] -> [B, gT, HW, d]."""
        cfg = self.cfg
        b, gt, hw, d = x.shape

        spatial_mask = temporal_mask = None
        if patch_mask is not None:
            m = patch_mask.reshape(b, gt, hw)
            spatial_mask = m.reshape(b * gt, hw)
            temporal_mask = jnp.transpose(m, (0, 2, 1)).reshape(b * hw, gt)

        # spatial pass: [B*T, HW, d]
        s = self._attend(
            x.reshape(b * gt, hw, d), grid_shape, "spatial", spatial_mask
        )
        s = s.reshape(b, gt, hw, d)

        # temporal pass over the spatial output: [B*HW, T, d]
        tmp = jnp.transpose(s, (0, 2, 1, 3)).reshape(b * hw, gt, d)
        t_out = self._attend(tmp, grid_shape, "temporal", temporal_mask)
        out = jnp.transpose(
            t_out.reshape(b, hw, gt, d), (0, 2, 1, 3)
        )  # [B, gT, HW, d]
        return self.w_o(out)


class SpatioTemporalAttentionBlock(nn.Module):
    """x + dropout(attn(norm(x))) (optimized_attention.py:673-741)."""

    cfg: ViT3DArgs

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        grid_shape: Tuple[int, int, int],
        patch_mask: Optional[jnp.ndarray],
        deterministic: bool = True,
    ) -> jnp.ndarray:
        cfg = self.cfg
        dtype = resolve_dtype(cfg.dtype)
        param_dtype = resolve_dtype(cfg.param_dtype)
        h = RMSNorm(cfg.d_model, cfg.rms_norm_eps, dtype, param_dtype)(x)
        h = SpatioTemporalAttention(cfg, name="attention")(
            h, grid_shape, patch_mask
        )
        h = nn.Dropout(rate=cfg.dropout)(h, deterministic=deterministic)
        return x + h


class VideoTransformerBlock(nn.Module):
    cfg: ViT3DArgs

    @nn.compact
    def __call__(self, x, grid_shape, patch_mask, deterministic=True):
        cfg = self.cfg
        dtype = resolve_dtype(cfg.dtype)
        param_dtype = resolve_dtype(cfg.param_dtype)
        x = SpatioTemporalAttentionBlock(cfg, name="attention_block")(
            x, grid_shape, patch_mask, deterministic
        )
        b, gt, hw, d = x.shape
        x = FFNBlock(
            d_model=cfg.d_model,
            d_ffn=cfg.d_ffn,
            dropout=cfg.dropout,
            eps=cfg.rms_norm_eps,
            num_layers=cfg.num_layers,
            dtype=dtype,
            param_dtype=param_dtype,
            name="ffn_block",
        )(x.reshape(b, gt * hw, d), deterministic=deterministic)
        return x.reshape(b, gt, hw, d)


class VideoTransformer(nn.Module):
    cfg: ViT3DArgs

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        frame_mask: Optional[jnp.ndarray] = None,
        use_padding: bool = True,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """[B, C, T, H, W] -> [B, gT*gH*gW, d_model] features (LLM-ready), or
        [B, num_classes] when cfg.use_classifier_head."""
        cfg = self.cfg
        dtype = resolve_dtype(cfg.dtype)
        param_dtype = resolve_dtype(cfg.param_dtype)

        x, patch_mask, grid = PatchEmbeddings3D(cfg, name="patch_embeddings")(
            x, frame_mask=frame_mask, use_padding=use_padding
        )
        x = with_logical_constraint(
            x, ("activation_batch", None, "activation_seq", "activation_embed")
        )

        block_cls = VideoTransformerBlock
        if cfg.use_checkpointing and not deterministic:
            block_cls = nn.remat(
                VideoTransformerBlock, static_argnums=(2, 4), prevent_cse=False
            )
        for i in range(cfg.num_layers):
            x = block_cls(cfg, name=f"layer_{i}")(
                x, grid, patch_mask, deterministic
            )

        x = RMSNorm(cfg.d_model, cfg.rms_norm_eps, dtype, param_dtype)(x)
        b = x.shape[0]
        feats = x.reshape(b, -1, cfg.d_model)  # [B, T*H*W, d]

        if cfg.use_classifier_head:
            if patch_mask is not None:
                m = patch_mask[..., None].astype(feats.dtype)
                pooled = jnp.sum(feats * m, axis=1) / jnp.maximum(
                    jnp.sum(m, axis=1), 1.0
                )
            else:
                pooled = jnp.mean(feats, axis=1)
            logits = nn.Dense(
                features=cfg.num_classes,
                kernel_init=nn.with_logical_partitioning(
                    nn.initializers.normal(stddev=cfg.d_model**-0.5),
                    ("embed", "vocab"),
                ),
                dtype=dtype,
                param_dtype=param_dtype,
                name="classifier",
            )(pooled)
            return logits.astype(jnp.float32)
        return feats

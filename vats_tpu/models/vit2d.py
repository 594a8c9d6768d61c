"""ViT-2D image encoder.

TPU-native rebuild of ``ImageEncoderTransformer``
(/root/reference/src/transformers/vision/vit_2d/model.py:104-229):

  proportional resize -> center crop -> Conv2d(k=p, s=p) patchify
  (/root/reference/src/transformers/vision/vit_2d/patch_embeddings2d.py:41-95)
  -> dropout -> N x (SpatialAttentionBlock -> FFNBlock) -> final RMSNorm
  -> [B, num_patches, d_model] features

Per the north star, preprocessing (resize/normalize/patchify) is folded into
the jitted device graph so hosts feed raw [B, C, H, W] pixel tensors.

Additions over the reference: an optional pooled classifier head
(``num_classes``) — the reference's vision train loop expects class logits
but no head exists (SURVEY.md §2.13.6).

Init is CLIP-style (model.py:144-189): normal(d^-0.5) for in-projections,
normal(d^-0.5 / sqrt(2L)) for out-projections, He-normal conv patchify.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from vats_tpu.configs.vit2d import ViT2DArgs
from vats_tpu.models.text_lm import resolve_dtype
from vats_tpu.nn.activations import FFNBlock
from vats_tpu.nn.attention import AttentionBlock
from vats_tpu.nn.norms import RMSNorm
from vats_tpu.parallel import with_logical_constraint


def resize_and_center_crop(x: jnp.ndarray, target_size: int) -> jnp.ndarray:
    """[B, C, H, W] -> [B, C, target, target]: proportional bilinear resize of
    the short side to ``target_size`` then center crop (reference
    patch_embeddings2d.py:63-80).  Pure XLA, static shapes per trace."""
    b, c, h, w = x.shape
    short = min(h, w)
    scale = target_size / short
    new_h = int(round(h * scale))
    new_w = int(round(w * scale))
    x = jax.image.resize(x, (b, c, new_h, new_w), method="bilinear")
    top = (new_h - target_size) // 2
    left = (new_w - target_size) // 2
    return jax.lax.dynamic_slice(
        x, (0, 0, top, left), (b, c, target_size, target_size)
    )


class PatchEmbeddings2D(nn.Module):
    patch_size: int
    target_size: int
    c_in: int
    d_model: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """[B, C, H, W] raw pixels -> [B, num_patches, d_model]."""
        if x.ndim != 4:
            raise ValueError(f"expected [B, C, H, W], got {x.shape}")
        if x.shape[1] != self.c_in:
            raise ValueError(f"expected {self.c_in} channels, got {x.shape[1]}")
        x = resize_and_center_crop(x.astype(self.dtype), self.target_size)
        # NCHW -> NHWC (TPU conv layout)
        x = jnp.transpose(x, (0, 2, 3, 1))
        p = self.patch_size
        fan_out = p * p * self.d_model
        x = nn.Conv(
            features=self.d_model,
            kernel_size=(p, p),
            strides=(p, p),
            padding="VALID",
            kernel_init=nn.with_logical_partitioning(
                nn.initializers.normal(stddev=math.sqrt(2.0 / fan_out)),
                (None, None, "conv_in", "conv_out"),
            ),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="proj",
        )(x)
        b = x.shape[0]
        return x.reshape(b, -1, self.d_model)


class SpatialTransformerBlock(nn.Module):
    """Spatial (non-causal) attention block + FFN block.

    Reference: /root/reference/src/transformers/vision/vit_2d/model.py:16-101.
    """

    cfg: ViT2DArgs

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, grid_shape: Tuple[int, int], deterministic: bool = True
    ) -> jnp.ndarray:
        cfg = self.cfg
        dtype = resolve_dtype(cfg.dtype)
        param_dtype = resolve_dtype(cfg.param_dtype)
        left = cfg.left_window if cfg.use_windowed_attn else -1
        right = cfg.right_window if cfg.use_windowed_attn else -1
        x, _ = AttentionBlock(
            d_model=cfg.d_model,
            num_heads=cfg.num_heads,
            query_groups=cfg.query_groups,
            rope_theta=cfg.rope_theta,
            softmax_scale=cfg.softmax_scale,
            use_proj_bias=cfg.use_proj_bias,
            use_qkv_proj=cfg.use_fused_proj,
            use_qk_norm=cfg.use_qk_norm,
            dropout=cfg.dropout,
            eps=cfg.rms_norm_eps,
            num_layers=cfg.num_layers,
            impl=cfg.attention_impl,
            rope_type="2d_axial",
            dtype=dtype,
            param_dtype=param_dtype,
            name="attention_block",
        )(
            x,
            causal=False,
            left_window=left,
            right_window=right,
            grid_shape=grid_shape,
            deterministic=deterministic,
        )
        x = FFNBlock(
            d_model=cfg.d_model,
            d_ffn=cfg.d_ffn,
            dropout=cfg.dropout,
            eps=cfg.rms_norm_eps,
            num_layers=cfg.num_layers,
            dtype=dtype,
            param_dtype=param_dtype,
            name="ffn_block",
        )(x, deterministic=deterministic)
        return x


class ImageEncoder(nn.Module):
    cfg: ViT2DArgs

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, deterministic: bool = True
    ) -> jnp.ndarray:
        """[B, C, H, W] -> [B, num_patches, d_model] features, or
        [B, num_classes] logits when cfg.num_classes is set."""
        cfg = self.cfg
        dtype = resolve_dtype(cfg.dtype)
        param_dtype = resolve_dtype(cfg.param_dtype)

        x = PatchEmbeddings2D(
            patch_size=cfg.patch_size,
            target_size=cfg.target_size,
            c_in=cfg.C_in,
            d_model=cfg.d_model,
            dtype=dtype,
            param_dtype=param_dtype,
            name="patch_embeddings",
        )(x)
        x = nn.Dropout(rate=cfg.dropout)(x, deterministic=deterministic)
        x = with_logical_constraint(
            x, ("activation_batch", "activation_seq", "activation_embed")
        )

        grid = cfg.grid_size
        block_cls = SpatialTransformerBlock
        if cfg.use_checkpointing and not deterministic:
            block_cls = nn.remat(
                SpatialTransformerBlock, static_argnums=(2, 3), prevent_cse=False
            )
        for i in range(cfg.num_layers):
            x = block_cls(cfg, name=f"layer_{i}")(x, (grid, grid), deterministic)

        x = RMSNorm(cfg.d_model, cfg.rms_norm_eps, dtype, param_dtype)(x)

        if cfg.num_classes is not None:
            pooled = (
                jnp.mean(x, axis=1) if cfg.pooling == "mean" else jnp.max(x, axis=1)
            )
            x = nn.Dense(
                features=cfg.num_classes,
                kernel_init=nn.with_logical_partitioning(
                    nn.initializers.normal(stddev=cfg.d_model**-0.5),
                    ("embed", "vocab"),
                ),
                dtype=dtype,
                param_dtype=param_dtype,
                name="classifier",
            )(pooled)
            return x.astype(jnp.float32)
        return x


# Reference public name (model.py:104)
ImageEncoderTransformer = ImageEncoder

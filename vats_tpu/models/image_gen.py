"""Autoregressive text->image generation stack.

TPU-native rebuild of /root/reference/src/autoregressive_image_gen/:

  * TransformerTextEncoder (text_encoder/text_encoder.py:88-209): token embed
    -> N bidirectional GQA blocks (shared 1D RoPE) -> RMSNorm.
  * AutoregressiveImageTransformer (autoregressive_transformer/model.py:143-306):
    codebook embed -> N x [causal self-attn (NTK 2D RoPE, KV cache) ->
    cross-attn to text -> FFN] -> RMSNorm -> [B, H, W, d] features.
    The reference leaves weight init disabled (model.py:196-208 TODO); we use
    the shared depth-scaled scheme.  An output head to codebook logits is
    added — required by generation, which the reference never implemented
    (generation/generate.py is an EMPTY file, SURVEY.md §2.13.1).
  * VQ-VAE (vq_vae/*): 3-conv encoder (4s2 / 4s2 / 3s1 + BatchNorm + act),
    L2-nearest vector quantizer with straight-through estimator and the
    reference's loss weighting (vector_quantization.py:84-87: the
    stop-gradient sides are swapped relative to the standard VQ-VAE paper —
    replicated for parity), mirrored ConvTranspose decoder with sigmoid
    output, and the composite that threads quantized indices through the
    transformer (vq_vae.py:39-80).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from vats_tpu.configs.image_gen import ImageGenArgs
from vats_tpu.models.text_lm import resolve_dtype
from vats_tpu.nn.activations import FFNBlock
from vats_tpu.nn.attention import AttentionBlock
from vats_tpu.nn.cross_attention import CrossAttentionBlock
from vats_tpu.nn.initializers import embed_init, head_init
from vats_tpu.nn.kv_cache import KVCache
from vats_tpu.nn.norms import RMSNorm


# ---------------------------------------------------------------------------
# Text encoder
# ---------------------------------------------------------------------------


class TransformerTextEncoder(nn.Module):
    """Bidirectional GQA text encoder (reference text_encoder.py:88-209)."""

    cfg: ImageGenArgs

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,
        padding_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        cfg = self.cfg
        dtype = resolve_dtype(cfg.dtype)
        param_dtype = resolve_dtype(cfg.param_dtype)
        x = nn.Embed(
            num_embeddings=cfg.vocab_size,
            features=cfg.d_model,
            embedding_init=nn.with_logical_partitioning(
                embed_init(), ("vocab", "embed")
            ),
            dtype=dtype,
            param_dtype=param_dtype,
            name="token_embed",
        )(input_ids.astype(jnp.int32))
        x = nn.Dropout(rate=cfg.dropout)(x, deterministic=deterministic)
        for i in range(cfg.text_num_layers):
            x, _ = AttentionBlock(
                d_model=cfg.d_model,
                num_heads=cfg.text_num_heads,
                query_groups=cfg.text_query_groups,
                rope_theta=cfg.rope_theta,
                softmax_scale=None,
                use_proj_bias=cfg.use_proj_bias,
                use_qkv_proj=cfg.use_qkv_proj,
                use_qk_norm=cfg.use_qk_norm,
                dropout=cfg.dropout,
                eps=cfg.rms_norm_eps,
                num_layers=cfg.text_num_layers,
                dtype=dtype,
                param_dtype=param_dtype,
                name=f"attn_{i}",
            )(
                x,
                causal=False,
                padding_mask=padding_mask,
                deterministic=deterministic,
            )
            x = FFNBlock(
                d_model=cfg.d_model,
                d_ffn=cfg.d_ffn,
                dropout=cfg.dropout,
                eps=cfg.rms_norm_eps,
                num_layers=cfg.text_num_layers,
                dtype=dtype,
                param_dtype=param_dtype,
                name=f"ffn_{i}",
            )(x, deterministic=deterministic)
        return RMSNorm(cfg.d_model, cfg.rms_norm_eps, dtype, param_dtype)(x)


# ---------------------------------------------------------------------------
# AR image transformer
# ---------------------------------------------------------------------------


class ARImageTransformerBlock(nn.Module):
    """causal self-attn -> cross-attn -> FFN (reference model.py:17-141)."""

    cfg: ImageGenArgs

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        text_embeddings: jnp.ndarray,
        causal_padding_mask: Optional[jnp.ndarray],
        cross_padding_mask: Optional[jnp.ndarray],
        cache: Optional[KVCache],
        grid_w: int,
        layer_idx: int,
        deterministic: bool = True,
        paged_cache=None,
    ) -> Tuple[jnp.ndarray, Optional[KVCache]]:
        cfg = self.cfg
        dtype = resolve_dtype(cfg.dtype)
        param_dtype = resolve_dtype(cfg.param_dtype)
        left = cfg.left_window if cfg.use_windowed_attn else -1
        x, new_cache = AttentionBlock(
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
            # use_ntk_rope only gates rope_ntk_scale: with scale=None the
            # 2d_ntk path reduces to classic 2D RoPE (NTKRoPE2D semantics,
            # /root/reference/.../rope_2d.py:106-115)
            rope_type="2d_ntk",
            rope_ntk_scale=cfg.ntk_scale_factor if cfg.use_ntk_rope else None,
            dtype=dtype,
            param_dtype=param_dtype,
            name="causal_attention_block",
        )(
            x,
            causal=cfg.use_causal,
            left_window=left,
            right_window=cfg.right_window,
            padding_mask=causal_padding_mask,
            cache=cache,
            paged_cache=paged_cache,
            layer_idx=layer_idx,
            grid_shape=(grid_w,),
            deterministic=deterministic,
        )
        x = CrossAttentionBlock(
            d_model=cfg.d_model,
            num_heads=cfg.num_heads,
            softmax_scale=cfg.softmax_scale,
            use_proj_bias=cfg.use_proj_bias,
            dropout=cfg.dropout,
            eps=cfg.rms_norm_eps,
            num_layers=cfg.num_layers,
            dtype=dtype,
            param_dtype=param_dtype,
            name="cross_attention_block",
        )(x, text_embeddings, cross_padding_mask, deterministic=deterministic)
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
        return x, new_cache


class AutoregressiveImageTransformer(nn.Module):
    cfg: ImageGenArgs

    @nn.compact
    def __call__(
        self,
        encoding_indices: jnp.ndarray,
        text_embeddings: jnp.ndarray,
        causal_padding_mask: Optional[jnp.ndarray] = None,
        cross_padding_mask: Optional[jnp.ndarray] = None,
        cache: Optional[KVCache] = None,
        paged_cache=None,
        grid_w: Optional[int] = None,
        return_logits: bool = False,
        deterministic: bool = True,
    ):
        """encoding_indices: [B, H, W] (full forward) or [B, T] flattened
        raster tokens (cached decode).  text_embeddings: [B, T_txt, d].

        Returns features [B, H, W, d] (reference contract, model.py:306) or,
        with return_logits, ([B, ..., num_embeddings] logits, cache).
        """
        cfg = self.cfg
        dtype = resolve_dtype(cfg.dtype)
        param_dtype = resolve_dtype(cfg.param_dtype)

        spatial = encoding_indices.ndim == 3
        if spatial:
            b, h_grid, w_grid = encoding_indices.shape
            flat = encoding_indices.reshape(b, h_grid * w_grid)
            grid_w = w_grid
        else:
            if grid_w is None:
                raise ValueError("grid_w required for flattened token input")
            b, _ = encoding_indices.shape
            flat = encoding_indices

        embed = nn.Embed(
            num_embeddings=cfg.num_embeddings,
            features=cfg.d_model,
            embedding_init=nn.with_logical_partitioning(
                embed_init(), ("vocab", "embed")
            ),
            dtype=dtype,
            param_dtype=param_dtype,
            name="embedding_proj",
        )
        x = embed(flat.astype(jnp.int32))
        x = nn.Dropout(rate=cfg.dropout)(x, deterministic=deterministic)

        block_cls = ARImageTransformerBlock
        if cfg.use_checkpointing and not deterministic:
            block_cls = nn.remat(
                ARImageTransformerBlock,
                static_argnums=(6, 7, 8),  # grid_w, layer_idx, deterministic
                prevent_cse=False,
            )
        new_cache = cache
        new_paged = paged_cache
        for i in range(cfg.num_layers):
            # the paged kwarg is only forwarded when paged decoding (remat'd
            # training blocks take positional args only)
            kw = {"paged_cache": new_paged} if paged_cache is not None else {}
            x, returned = block_cls(cfg, name=f"layer_{i}")(
                x,
                text_embeddings,
                causal_padding_mask,
                cross_padding_mask,
                new_cache,
                grid_w,
                i,
                deterministic,
                **kw,
            )
            if paged_cache is not None:
                new_paged = returned
            else:
                new_cache = returned
        t = flat.shape[1]
        if paged_cache is not None:
            if causal_padding_mask is not None and t > 1:
                counts = jnp.sum(causal_padding_mask.astype(jnp.int32), axis=1)
            else:
                counts = jnp.full((b,), t, jnp.int32)
            new_cache = new_paged.advance_by(counts)
        elif new_cache is not None:
            new_cache = new_cache.advance(t)

        x = RMSNorm(cfg.d_model, cfg.rms_norm_eps, dtype, param_dtype)(x)

        # The codebook-logits head always exists (so params are stable across
        # feature-only and generation call modes); it is the piece the
        # reference's empty generate.py was missing.
        logits = nn.DenseGeneral(
            features=cfg.num_embeddings,
            use_bias=False,
            kernel_init=nn.with_logical_partitioning(
                head_init(), ("embed", "vocab")
            ),
            dtype=dtype,
            param_dtype=param_dtype,
            name="to_logits",
        )(x).astype(jnp.float32)

        if return_logits:
            return logits, new_cache
        if spatial:
            x = x.reshape(b, h_grid, w_grid, cfg.d_model)
        return x

    def init_cache(self, batch_size: int, max_len: Optional[int] = None) -> KVCache:
        cfg = self.cfg
        return KVCache.create(
            num_layers=cfg.num_layers,
            batch_size=batch_size,
            max_seq_len=max_len or cfg.max_position_embeddings,
            kv_heads=cfg.query_groups,
            head_dim=cfg.head_dim,
            dtype=resolve_dtype(cfg.dtype),
        )

    def init_paged_cache(
        self, batch_size: int, max_len: Optional[int] = None,
        page_size: int = 128,
    ):
        from vats_tpu.ops.decode_attention import PagedKVCache

        cfg = self.cfg
        return PagedKVCache.create(
            num_layers=cfg.num_layers,
            batch_size=batch_size,
            max_seq_len=max_len or cfg.max_position_embeddings,
            kv_heads=cfg.query_groups,
            head_dim=cfg.head_dim,
            page_size=page_size,
            dtype=resolve_dtype(cfg.dtype),
        )


# ---------------------------------------------------------------------------
# VQ-VAE
# ---------------------------------------------------------------------------


def _activation(name: str):
    return {
        "relu": nn.relu,
        "leaky_relu": nn.leaky_relu,
        "sigmoid": nn.sigmoid,
    }[name]


class VQVAEEncoder(nn.Module):
    """Conv(4,s2) -> BN -> act, x2 downsample twice, then Conv(3,s1)
    (reference vae_encoder.py:10-96).  NHWC layout; output [B, H/4, W/4, d]."""

    cfg: ImageGenArgs

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        cfg = self.cfg
        dtype = resolve_dtype(cfg.dtype)
        param_dtype = resolve_dtype(cfg.param_dtype)
        act = _activation(cfg.vae_encoder_activation)
        # [B, C, H, W] -> NHWC
        x = jnp.transpose(x.astype(dtype), (0, 2, 3, 1))
        for i, (k, s) in enumerate([(4, 2), (4, 2), (3, 1)]):
            x = nn.Conv(
                features=cfg.d_model,
                kernel_size=(k, k),
                strides=(s, s),
                padding=[(1, 1), (1, 1)],
                dtype=dtype,
                param_dtype=param_dtype,
                name=f"conv{i + 1}",
            )(x)
            x = nn.BatchNorm(
                use_running_average=deterministic,
                dtype=dtype,
                param_dtype=param_dtype,
                name=f"bn{i + 1}",
            )(x)
            x = act(x)
        return x  # [B, H/4, W/4, d_model]


class VQVAEDecoder(nn.Module):
    """Mirror: ConvT(3,s1) -> ConvT(4,s2) x2 -> sigmoid (vae_decoder.py:11-106)."""

    cfg: ImageGenArgs

    @nn.compact
    def __call__(self, z_q: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        cfg = self.cfg
        dtype = resolve_dtype(cfg.dtype)
        param_dtype = resolve_dtype(cfg.param_dtype)
        act = _activation(cfg.vae_encoder_activation)
        x = z_q.astype(dtype)  # [B, H', W', d]
        specs = [
            (3, 1, cfg.d_model),
            (4, 2, cfg.d_model),
            (4, 2, cfg.C_in_out),
        ]
        for i, (k, s, feats) in enumerate(specs):
            # 'SAME' reproduces torch ConvTranspose2d(k,s,p=1) output sizes:
            # k3/s1 keeps H,W; k4/s2 doubles them
            x = nn.ConvTranspose(
                features=feats,
                kernel_size=(k, k),
                strides=(s, s),
                padding="SAME",
                dtype=dtype,
                param_dtype=param_dtype,
                name=f"deconv{i + 1}",
            )(x)
            if i < 2:
                x = nn.BatchNorm(
                    use_running_average=deterministic,
                    dtype=dtype,
                    param_dtype=param_dtype,
                    name=f"bn{i + 1}",
                )(x)
                x = act(x)
        x = nn.sigmoid(x)
        return jnp.transpose(x, (0, 3, 1, 2))  # back to [B, C, H, W]


class VectorQuantizer(nn.Module):
    """L2-nearest codebook lookup with straight-through estimator.

    Loss follows the reference exactly (vector_quantization.py:84-90):
    ``mse(sg(z_q), z) + beta * mse(z_q, sg(z))`` — note the stop-gradient
    sides are swapped vs the standard VQ-VAE formulation; replicated for
    parity."""

    cfg: ImageGenArgs

    @nn.compact
    def __call__(
        self, z: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        cfg = self.cfg
        e = cfg.num_embeddings
        def codebook_init(key, shape, dtype):
            # torch nn.init.uniform_(-1/e, 1/e) (vector_quantization.py:25)
            return jax.random.uniform(key, shape, dtype, -1.0 / e, 1.0 / e)

        codebook = self.param(
            "embedding",
            nn.with_logical_partitioning(codebook_init, ("vocab", "embed")),
            (e, cfg.d_model),
            resolve_dtype(cfg.param_dtype),
        )

        b, h, w, d = z.shape
        zf = z.reshape(-1, d).astype(jnp.float32)
        cb = codebook.astype(jnp.float32)
        d2 = (
            jnp.sum(zf**2, axis=1, keepdims=True)
            - 2.0 * zf @ cb.T
            + jnp.sum(cb**2, axis=1)[None, :]
        )
        indices = jnp.argmin(d2, axis=-1)
        z_q = cb[indices].reshape(b, h, w, d)
        z32 = z.astype(jnp.float32)

        codebook_loss = jnp.mean((jax.lax.stop_gradient(z_q) - z32) ** 2)
        commit_loss = jnp.mean((z_q - jax.lax.stop_gradient(z32)) ** 2)
        total_loss = codebook_loss + cfg.commitment_beta * commit_loss

        # straight-through estimator
        z_q = z32 + jax.lax.stop_gradient(z_q - z32)
        return (
            z_q.astype(z.dtype),
            total_loss,
            indices.reshape(b, h, w),
        )


class VQVAE(nn.Module):
    """Composite: encode -> quantize -> transformer on indices -> decode
    (reference vq_vae.py:15-80).  Returns (reconstruction, vq_loss, indices,
    transformer_out)."""

    cfg: ImageGenArgs

    @nn.compact
    def __call__(
        self,
        images: jnp.ndarray,
        text_embeddings: jnp.ndarray,
        image_attention_mask: Optional[jnp.ndarray] = None,
        text_attention_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        cfg = self.cfg
        z = VQVAEEncoder(cfg, name="encoder")(images, deterministic=deterministic)
        z_q, vq_loss, indices = VectorQuantizer(cfg, name="quantizer")(z)

        causal_mask = None
        if image_attention_mask is not None:
            b, _, h, w = images.shape
            hd, wd = z.shape[1], z.shape[2]
            m = image_attention_mask.reshape(b, 1, h, w).astype(jnp.float32)
            m = jax.image.resize(m, (b, 1, hd, wd), method="nearest")
            causal_mask = m.reshape(b, hd * wd) > 0.5

        transformer_out = AutoregressiveImageTransformer(cfg, name="model")(
            indices,
            text_embeddings,
            causal_padding_mask=causal_mask,
            cross_padding_mask=text_attention_mask,
            deterministic=deterministic,
        )
        recon = VQVAEDecoder(cfg, name="decoder")(z_q, deterministic=deterministic)
        return recon, vq_loss, indices, transformer_out

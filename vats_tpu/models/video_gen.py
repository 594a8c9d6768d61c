"""Autoregressive text->video generation stack.

TPU-native rebuild of /root/reference/src/autoregressive_video_gen/:

  * CausalFactorizedAttention (attention/optimized_attention.py:22-822):
    PARALLEL spatial ([B*T, H*W], causal raster within frame) and temporal
    ([B*H*W, T], causal across frames, KV-cached) branches sharing one set of
    q/k/v projections, each with its own internal ``+x`` residual, then
    concat -> spatio_temporal_proj (2d->d) -> o_proj.  The block wrapper is
    ``dropout(attn(norm(x)))`` with NO outer residual (:808-822) — the
    branch residuals carry the skip path; design preserved.
  * FactorizedCrossAttention (attention/cross_attention.py:17-576): GQA cross
    attention text->video with the same parallel spatial/temporal branch +
    concat + proj structure; text K/V broadcast across frame / location
    sub-batches.
  * Real 3D NTK RoPE: the reference's NTKRoPE3D is an identity stub and its
    attention never applies any positional encoding (SURVEY.md §2.13.3-4);
    here the spatial branch rotates the h/w thirds of head_dim and the
    temporal branch the t third, with NTK position scaling.
  * AutoregressiveVideoTransformer (model.py:17-312): codebook embed ->
    N x [causal-factorized -> cross-factorized -> FFN] -> RMSNorm;
    temporal-only KV cache (max_seq_len = max_frames, model.py:190-196);
    in [B, T, H, W] indices -> out [B, T, H, W, d] (+ codebook logits head
    needed by generation, which the reference never implemented).
  * VQVAE3D (vq_vae/*): Conv3D(k=s=patch) patchify encoder + two 3x3x3 convs
    (BN+ReLU), the shared L2 quantizer, ConvTranspose3D mirror decoder with
    sigmoid output; composite loss adds reconstruction MSE (vq_vae.py:54-55).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from vats_tpu.configs.video_gen import VideoGenArgs
from vats_tpu.models.text_lm import resolve_dtype
from vats_tpu.nn.activations import FFNBlock
from vats_tpu.nn.initializers import (
    embed_init,
    head_init,
    input_proj_init,
    output_proj_init,
)
from vats_tpu.nn.kv_cache import KVCache
from vats_tpu.nn.norms import RMSNorm, l2_normalize
from vats_tpu.nn.rope import apply_rope_3d_axial
from vats_tpu.ops import dot_product_attention


def _dense(cfg, feats, name, init, axes):
    return nn.DenseGeneral(
        features=feats,
        use_bias=cfg.use_proj_bias,
        kernel_init=nn.with_logical_partitioning(init, axes),
        dtype=resolve_dtype(cfg.dtype),
        param_dtype=resolve_dtype(cfg.param_dtype),
        name=name,
    )


class CausalFactorizedAttention(nn.Module):
    cfg: VideoGenArgs

    def setup(self):
        cfg = self.cfg
        h, g, hd = cfg.num_heads, cfg.query_groups, cfg.head_dim
        in_init = input_proj_init(cfg.num_layers)
        out_init = output_proj_init(cfg.num_layers)
        self.q_proj = _dense(cfg, h * hd, "q_proj", in_init, ("embed", "heads"))
        self.k_proj = _dense(cfg, g * hd, "k_proj", in_init, ("embed", "kv_heads"))
        self.v_proj = _dense(cfg, g * hd, "v_proj", in_init, ("embed", "kv_heads"))
        self.spatio_temporal_proj = _dense(
            cfg, cfg.d_model, "spatio_temporal_proj", in_init, ("mlp", "embed")
        )
        self.o_proj = _dense(cfg, cfg.d_model, "o_proj", out_init, ("heads", "embed"))

    def _qkv(self, x2d):
        cfg = self.cfg
        bp, l, _ = x2d.shape
        h, g, hd = cfg.num_heads, cfg.query_groups, cfg.head_dim
        q = self.q_proj(x2d).reshape(bp, l, h, hd)
        k = self.k_proj(x2d).reshape(bp, l, g, hd)
        v = self.v_proj(x2d).reshape(bp, l, g, hd)
        if cfg.use_qk_norm:
            q, k = l2_normalize(q), l2_normalize(k)
        return q, k, v

    def _windows(self):
        cfg = self.cfg
        left, right = cfg.left_window, cfg.right_window
        if cfg.use_causal:
            right = 0
        if not cfg.use_windowed_attn:
            left, right = -1, -1
        return left, right

    def __call__(
        self,
        x: jnp.ndarray,
        cache: Optional[KVCache] = None,
        layer_idx: int = 0,
        cache_mode: str = "append",  # 'append' | 'read'
        spatial_valid: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, Optional[KVCache]]:
        """x: [B, T, HW, d] -> ([B, T, HW, d], cache').

        spatial_valid: optional [B, HW] bool for partial-frame decode (tokens
        past the generation frontier are masked out of the spatial branch and
        of the temporal self-link).
        """
        cfg = self.cfg
        b, t, hw, d = x.shape
        gt = cfg.max_frames // cfg.patch_size[0] if cache is None else t
        gh, gw = cfg.latent_height, cfg.latent_width
        left, right = self._windows()
        ntk = cfg.ntk_scale_factor if cfg.use_ntk_rope else None

        # ---- spatial branch: causal raster attention within each frame ----
        xs = x.reshape(b * t, hw, d)
        q, k, v = self._qkv(xs)
        if cfg.use_ntk_rope:
            q = apply_rope_3d_axial(
                q, 1, gh, gw, cfg.rope_theta, mode="spatial", ntk_scale_factor=ntk
            )
            k = apply_rope_3d_axial(
                k, 1, gh, gw, cfg.rope_theta, mode="spatial", ntk_scale_factor=ntk
            )
        sp_valid = None
        if spatial_valid is not None:
            sp_valid = jnp.repeat(spatial_valid, t, axis=0)  # [B*T, HW]
        spatial_out = dot_product_attention(
            q, k, v,
            scale=cfg.softmax_scale,
            causal=cfg.use_causal,
            left_window=left,
            right_window=right,
            kv_valid=sp_valid,
        ).reshape(b, t, hw, cfg.num_heads * cfg.head_dim)
        spatial_out = spatial_out + x  # spatial residual (:684)

        # ---- temporal branch: causal attention across frames, KV cache ----
        xt = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * hw, t, d)
        q, k, v = self._qkv(xt)
        new_cache = cache
        if cache is None:
            if cfg.use_ntk_rope:
                q = apply_rope_3d_axial(
                    q, t, 1, 1, cfg.rope_theta, mode="temporal",
                    ntk_scale_factor=ntk,
                )
                k = apply_rope_3d_axial(
                    k, t, 1, 1, cfg.rope_theta, mode="temporal",
                    ntk_scale_factor=ntk,
                )
            temporal_out = dot_product_attention(
                q, k, v,
                scale=cfg.softmax_scale,
                causal=cfg.use_causal,
                left_window=left,
                right_window=right,
            )
        else:
            start = cache.length
            t_pos = start + jnp.arange(t)
            if cfg.use_ntk_rope:
                q = apply_rope_3d_axial(
                    q, t, 1, 1, cfg.rope_theta, mode="temporal",
                    ntk_scale_factor=ntk, t_positions=t_pos,
                )
                k = apply_rope_3d_axial(
                    k, t, 1, 1, cfg.rope_theta, mode="temporal",
                    ntk_scale_factor=ntk, t_positions=t_pos,
                )
            updated = cache.update_layer(layer_idx, k, v)
            k_buf, v_buf = updated.layer(layer_idx)
            kv_valid = updated.valid_mask(b * hw, extra=t)
            temporal_out = dot_product_attention(
                q, k_buf, v_buf,
                scale=cfg.softmax_scale,
                causal=cfg.use_causal,
                left_window=left,
                right_window=right,
                q_positions=t_pos,
                kv_positions=jnp.arange(updated.max_seq_len),
                kv_valid=kv_valid,
            )
            new_cache = updated if cache_mode == "append" else cache
        temporal_out = jnp.transpose(
            temporal_out.reshape(b, hw, t, cfg.num_heads * cfg.head_dim),
            (0, 2, 1, 3),
        )
        temporal_out = temporal_out + x  # temporal residual (:684)

        st = jnp.concatenate([spatial_out, temporal_out], axis=-1)
        return self.o_proj(self.spatio_temporal_proj(st)), new_cache


class FactorizedCrossAttention(nn.Module):
    cfg: VideoGenArgs

    def setup(self):
        cfg = self.cfg
        h, g, hd = cfg.num_heads, cfg.query_groups, cfg.head_dim
        in_init = input_proj_init(cfg.num_layers)
        out_init = output_proj_init(cfg.num_layers)
        self.q_proj = _dense(cfg, h * hd, "q_proj", in_init, ("embed", "heads"))
        self.k_proj = _dense(cfg, g * hd, "k_proj", in_init, ("embed", "kv_heads"))
        self.v_proj = _dense(cfg, g * hd, "v_proj", in_init, ("embed", "kv_heads"))
        self.spatio_temporal_proj = _dense(
            cfg, cfg.d_model, "spatio_temporal_proj", in_init, ("mlp", "embed")
        )
        self.o_proj = _dense(cfg, cfg.d_model, "o_proj", out_init, ("heads", "embed"))

    def _branch(self, x2d, k, v, text_mask_rep):
        """x2d: [B', L, d] queries; k/v: [B', T_txt, G, hd]."""
        cfg = self.cfg
        bp, l, _ = x2d.shape
        h, hd = cfg.num_heads, cfg.head_dim
        q = self.q_proj(x2d).reshape(bp, l, h, hd)
        if cfg.use_qk_norm:
            q = l2_normalize(q)
        return dot_product_attention(
            q, k, v,
            scale=cfg.softmax_scale,
            causal=False,
            kv_valid=text_mask_rep,
        ).reshape(bp, l, h * hd)

    def __call__(
        self,
        x: jnp.ndarray,
        text_embeddings: jnp.ndarray,
        text_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        cfg = self.cfg
        b, t, hw, d = x.shape
        g, hd = cfg.query_groups, cfg.head_dim
        t_txt = text_embeddings.shape[1]
        k = self.k_proj(text_embeddings).reshape(b, t_txt, g, hd)
        v = self.v_proj(text_embeddings).reshape(b, t_txt, g, hd)
        if cfg.use_qk_norm:
            k = l2_normalize(k)

        # spatial: every frame's patches attend the text
        k_s = jnp.repeat(k, t, axis=0)
        v_s = jnp.repeat(v, t, axis=0)
        m_s = jnp.repeat(text_mask, t, axis=0) if text_mask is not None else None
        spatial_out = self._branch(
            x.reshape(b * t, hw, d), k_s, v_s, m_s
        ).reshape(b, t, hw, d)
        spatial_out = spatial_out + x

        # temporal: every location's frame sequence attends the text
        k_t = jnp.repeat(k, hw, axis=0)
        v_t = jnp.repeat(v, hw, axis=0)
        m_t = jnp.repeat(text_mask, hw, axis=0) if text_mask is not None else None
        xt = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * hw, t, d)
        temporal_out = jnp.transpose(
            self._branch(xt, k_t, v_t, m_t).reshape(b, hw, t, d), (0, 2, 1, 3)
        )
        temporal_out = temporal_out + x

        st = jnp.concatenate([spatial_out, temporal_out], axis=-1)
        return self.o_proj(self.spatio_temporal_proj(st))


class VideoGenTransformerBlock(nn.Module):
    """causal-factorized -> cross-factorized -> FFN; the attention block
    wrappers are dropout(attn(norm(x))) with the branch-internal residuals
    as the skip path (reference :808-822, cross_attention.py:566-576)."""

    cfg: VideoGenArgs

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        text_embeddings: jnp.ndarray,
        text_mask: Optional[jnp.ndarray],
        cache: Optional[KVCache],
        spatial_valid: Optional[jnp.ndarray],
        layer_idx: int,
        cache_mode: str = "append",
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, Optional[KVCache]]:
        cfg = self.cfg
        dtype = resolve_dtype(cfg.dtype)
        param_dtype = resolve_dtype(cfg.param_dtype)

        h = RMSNorm(cfg.d_model, cfg.rms_norm_eps, dtype, param_dtype)(x)
        h, new_cache = CausalFactorizedAttention(cfg, name="attention")(
            h, cache=cache, layer_idx=layer_idx, cache_mode=cache_mode,
            spatial_valid=spatial_valid,
        )
        x = nn.Dropout(rate=cfg.dropout)(h, deterministic=deterministic)

        h = RMSNorm(cfg.d_model, cfg.rms_norm_eps, dtype, param_dtype)(x)
        h = FactorizedCrossAttention(cfg, name="cross_attention")(
            h, text_embeddings, text_mask
        )
        x = nn.Dropout(rate=cfg.dropout)(h, deterministic=deterministic)

        b, t, hw, d = x.shape
        x = FFNBlock(
            d_model=cfg.d_model,
            d_ffn=cfg.d_ffn,
            dropout=cfg.dropout,
            eps=cfg.rms_norm_eps,
            num_layers=cfg.num_layers,
            dtype=dtype,
            param_dtype=param_dtype,
            name="ffn_block",
        )(x.reshape(b, t * hw, d), deterministic=deterministic)
        return x.reshape(b, t, hw, d), new_cache


class AutoregressiveVideoTransformer(nn.Module):
    cfg: VideoGenArgs

    @nn.compact
    def __call__(
        self,
        encoding_indices: jnp.ndarray,
        text_embeddings: jnp.ndarray,
        text_mask: Optional[jnp.ndarray] = None,
        cache: Optional[KVCache] = None,
        spatial_valid: Optional[jnp.ndarray] = None,
        cache_mode: str = "append",
        return_logits: bool = False,
        deterministic: bool = True,
    ):
        """encoding_indices: [B, T, H, W] codebook ids; text: [B, T_txt, d].

        Returns features [B, T, H, W, d] (reference contract) or, with
        return_logits, ([B, T, H*W, num_embeddings], cache')."""
        cfg = self.cfg
        dtype = resolve_dtype(cfg.dtype)
        param_dtype = resolve_dtype(cfg.param_dtype)
        b, t, h_grid, w_grid = encoding_indices.shape
        hw = h_grid * w_grid

        x = nn.Embed(
            num_embeddings=cfg.num_embeddings,
            features=cfg.d_model,
            embedding_init=nn.with_logical_partitioning(
                embed_init(), ("vocab", "embed")
            ),
            dtype=dtype,
            param_dtype=param_dtype,
            name="embedding",
        )(encoding_indices.astype(jnp.int32).reshape(b, t, hw))
        x = nn.Dropout(rate=cfg.dropout)(x, deterministic=deterministic)

        block_cls = VideoGenTransformerBlock
        if cfg.use_checkpointing and not deterministic:
            block_cls = nn.remat(
                VideoGenTransformerBlock,
                static_argnums=(6, 7, 8),  # layer_idx, cache_mode, deterministic
                prevent_cse=False,
            )
        new_cache = cache
        for i in range(cfg.num_layers):
            x, new_cache = block_cls(cfg, name=f"layer_{i}")(
                x, text_embeddings, text_mask, new_cache, spatial_valid,
                i, cache_mode, deterministic,
            )
        if new_cache is not None and cache_mode == "append":
            new_cache = new_cache.advance(t)

        x = RMSNorm(cfg.d_model, cfg.rms_norm_eps, dtype, param_dtype)(x)

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
        return x.reshape(b, t, h_grid, w_grid, cfg.d_model)

    def init_cache(self, batch_size: int) -> KVCache:
        """Temporal-only cache: sub-batch is B * H*W locations
        (reference model.py:190-196)."""
        cfg = self.cfg
        latent_frames = max(1, cfg.max_frames // cfg.patch_size[0])
        return KVCache.create(
            num_layers=cfg.num_layers,
            batch_size=batch_size * cfg.latent_height * cfg.latent_width,
            max_seq_len=latent_frames,
            kv_heads=cfg.query_groups,
            head_dim=cfg.head_dim,
            dtype=resolve_dtype(cfg.dtype),
        )


# ---------------------------------------------------------------------------
# 3D VQ-VAE
# ---------------------------------------------------------------------------


class Encoder3D(nn.Module):
    """Conv3D(k=s=patch) patchify + two 3x3x3 convs, BN + ReLU
    (reference vq_vae/encoder.py:30-94)."""

    cfg: VideoGenArgs

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        cfg = self.cfg
        dtype = resolve_dtype(cfg.dtype)
        param_dtype = resolve_dtype(cfg.param_dtype)
        # [B, C, T, H, W] -> NTHWC
        x = jnp.transpose(x.astype(dtype), (0, 2, 3, 4, 1))
        pt, ph, pw = cfg.patch_size
        specs = [((pt, ph, pw), (pt, ph, pw), "VALID"), ((3, 3, 3), (1, 1, 1), "SAME"),
                 ((3, 3, 3), (1, 1, 1), "SAME")]
        for i, (ks, st, pad) in enumerate(specs):
            x = nn.Conv(
                features=cfg.d_model,
                kernel_size=ks,
                strides=st,
                padding=pad,
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
            x = nn.relu(x)
        return x  # [B, T', H', W', d]


class Decoder3D(nn.Module):
    """Two 3x3x3 ConvT (BN+ReLU) then ConvT(k=s=patch) + sigmoid
    (reference vq_vae/decoder.py:29-90)."""

    cfg: VideoGenArgs

    @nn.compact
    def __call__(self, z_q: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        cfg = self.cfg
        dtype = resolve_dtype(cfg.dtype)
        param_dtype = resolve_dtype(cfg.param_dtype)
        pt, ph, pw = cfg.patch_size
        x = z_q.astype(dtype)
        for i in range(2):
            x = nn.ConvTranspose(
                features=cfg.d_model,
                kernel_size=(3, 3, 3),
                strides=(1, 1, 1),
                padding="SAME",
                dtype=dtype,
                param_dtype=param_dtype,
                name=f"deconv{i + 1}",
            )(x)
            x = nn.BatchNorm(
                use_running_average=deterministic,
                dtype=dtype,
                param_dtype=param_dtype,
                name=f"bn{i + 1}",
            )(x)
            x = nn.relu(x)
        x = nn.ConvTranspose(
            features=cfg.C_in_out,
            kernel_size=(pt, ph, pw),
            strides=(pt, ph, pw),
            padding="VALID",
            dtype=dtype,
            param_dtype=param_dtype,
            name="deconv3",
        )(x)
        x = nn.sigmoid(x)
        return jnp.transpose(x, (0, 4, 1, 2, 3))  # [B, C, T, H, W]


class VectorQuantizer3D(nn.Module):
    """Shared quantizer math over [B, T, H, W, d] latents (the reference's
    video quantizer uses the expanded-norm distance, quantizer.py:75-79 —
    identical math to cdist)."""

    cfg: VideoGenArgs

    @nn.compact
    def __call__(self, z: jnp.ndarray):
        cfg = self.cfg
        e = cfg.num_embeddings

        def codebook_init(key, shape, dtype):
            return jax.random.uniform(key, shape, dtype, -1.0 / e, 1.0 / e)

        codebook = self.param(
            "embedding",
            nn.with_logical_partitioning(codebook_init, ("vocab", "embed")),
            (e, cfg.d_model),
            resolve_dtype(cfg.param_dtype),
        )
        shape = z.shape
        zf = z.reshape(-1, cfg.d_model).astype(jnp.float32)
        cb = codebook.astype(jnp.float32)
        d2 = (
            jnp.sum(zf**2, axis=1, keepdims=True)
            - 2.0 * zf @ cb.T
            + jnp.sum(cb**2, axis=1)[None, :]
        )
        indices = jnp.argmin(d2, axis=-1)
        z_q = cb[indices].reshape(shape)
        z32 = z.astype(jnp.float32)
        codebook_loss = jnp.mean((jax.lax.stop_gradient(z_q) - z32) ** 2)
        commit_loss = jnp.mean((z_q - jax.lax.stop_gradient(z32)) ** 2)
        vq_loss = codebook_loss + cfg.commitment_beta * commit_loss
        z_q = z32 + jax.lax.stop_gradient(z_q - z32)
        return z_q.astype(z.dtype), vq_loss, indices.reshape(shape[:-1])


class VQVAE3D(nn.Module):
    """encode -> quantize -> decode; loss = recon MSE + vq loss
    (reference vq_vae.py:35-56)."""

    cfg: VideoGenArgs

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True):
        cfg = self.cfg
        z = Encoder3D(cfg, name="encoder")(x, deterministic=deterministic)
        z_q, vq_loss, indices = VectorQuantizer3D(cfg, name="quantizer")(z)
        recon = Decoder3D(cfg, name="decoder")(z_q, deterministic=deterministic)
        recon_loss = jnp.mean(
            (recon.astype(jnp.float32) - x.astype(jnp.float32)) ** 2
        )
        total_loss = recon_loss + vq_loss
        return recon, total_loss, indices

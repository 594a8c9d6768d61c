"""Autoregressive video generation: designed decode loop + pipeline.

The reference's video generation is entirely unimplemented — both
``generation/generate.py`` and ``generation/sample.py`` are EMPTY files
(SURVEY.md §2.13.1).  Designed behavior (matching the architecture's
temporal-only KV cache and factorized causal attention):

  * tokens factorize autoregressively in (frame, raster) order over the full
    T * H*W latent sequence
  * frames decode one at a time; past frames live in the temporal KV cache
  * within a frame, tokens decode in raster order: each inner step runs the
    transformer on the current (partial) frame with a causal+frontier spatial
    mask and a read-only view of the temporal cache, samples the next token,
    and writes it into the frame buffer — a lax.fori_loop, all on device
  * when a frame completes, one more pass appends its temporal K/V to the
    cache (feeding the same shifted inputs the inner steps saw)
  * sampled [B, T, H, W] codebook indices map through the 3D VQ-VAE decoder
    to pixel video [B, C, T_frames, H_pix, W_pix].

Input convention matches training: the transformer input at flat position i
is the token sampled at position i-1 (``start_token_id`` at position 0).
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from vats_tpu.configs.video_gen import VideoGenArgs
from vats_tpu.inference.image_generation import ImageGenerationSampler
from vats_tpu.inference.sampling import sample_logits
from vats_tpu.models.video_gen import (
    AutoregressiveVideoTransformer,
    Decoder3D,
)

VideoGenerationSampler = ImageGenerationSampler


@functools.partial(
    jax.jit,
    static_argnames=(
        "model",
        "num_frames",
        "temperature",
        "top_k",
        "top_p",
        "do_sample",
        "start_token_id",
    ),
)
def generate_video_tokens(
    model: AutoregressiveVideoTransformer,
    params: Any,
    text_embeddings: jnp.ndarray,
    text_mask: Optional[jnp.ndarray],
    rng: jax.Array,
    *,
    num_frames: int,
    temperature: Optional[float] = 1.0,
    top_k: Optional[int] = None,
    top_p: Optional[float] = None,
    do_sample: bool = True,
    start_token_id: int = 0,
) -> jnp.ndarray:
    """Sample [B, num_frames, H, W] codebook indices autoregressively."""
    cfg = model.cfg
    gh, gw = cfg.latent_height, cfg.latent_width
    hw = gh * gw
    b = text_embeddings.shape[0]

    tokens = jnp.zeros((b, num_frames, hw), dtype=jnp.int32)
    cache = model.init_cache(b)
    prev_last = jnp.full((b,), start_token_id, dtype=jnp.int32)

    # python loop over frames (static, small); inner fori over raster pos
    for f in range(num_frames):
        inp = jnp.zeros((b, hw), dtype=jnp.int32)
        inp = inp.at[:, 0].set(prev_last)

        def inner(j, state):
            inp, frame_tokens, rng = state
            rng, srng = jax.random.split(rng)
            pos = jnp.arange(hw)[None, :]
            frontier = pos <= j  # inputs 0..j are defined
            logits, _ = model.apply(
                params,
                inp.reshape(b, 1, gh, gw),
                text_embeddings,
                text_mask=text_mask,
                cache=cache,
                spatial_valid=jnp.broadcast_to(frontier, (b, hw)),
                cache_mode="read",
                return_logits=True,
                deterministic=True,
            )
            step_logits = jax.lax.dynamic_slice_in_dim(
                logits[:, 0], j, 1, axis=1
            )[:, 0]
            tok = sample_logits(
                srng,
                step_logits,
                temperature=temperature,
                top_k=top_k,
                top_p=top_p,
                do_sample=do_sample,
            )
            frame_tokens = jax.lax.dynamic_update_slice(
                frame_tokens, tok[:, None], (0, j)
            )
            inp = jax.lax.cond(
                j + 1 < hw,
                lambda a: jax.lax.dynamic_update_slice(a, tok[:, None], (0, j + 1)),
                lambda a: a,
                inp,
            )
            return inp, frame_tokens, rng

        frame_tokens = jnp.zeros((b, hw), dtype=jnp.int32)
        inp, frame_tokens, rng = jax.lax.fori_loop(
            0, hw, inner, (inp, frame_tokens, rng)
        )
        # append this frame's K/V (same shifted inputs the inner steps saw)
        _, cache = model.apply(
            params,
            inp.reshape(b, 1, gh, gw),
            text_embeddings,
            text_mask=text_mask,
            cache=cache,
            cache_mode="append",
            return_logits=True,
            deterministic=True,
        )
        tokens = tokens.at[:, f].set(frame_tokens)
        prev_last = frame_tokens[:, -1]

    return tokens.reshape(b, num_frames, gh, gw)


class VideoGenerationPipeline:
    """Text ids -> video pixels through encoder -> AR sampling -> 3D decoder."""

    def __init__(
        self,
        cfg: VideoGenArgs,
        text_encoder,
        text_encoder_params: Any,
        transformer_params: Any,
        decoder_params: Any,
        quantizer_codebook: jnp.ndarray,
    ):
        self.cfg = cfg
        self.text_encoder = text_encoder
        self.transformer = AutoregressiveVideoTransformer(cfg)
        self.decoder = Decoder3D(cfg)
        self.text_encoder_params = text_encoder_params
        self.transformer_params = transformer_params
        self.decoder_params = decoder_params
        self.codebook = quantizer_codebook

    def generate_videos(
        self,
        text_ids: jnp.ndarray,
        rng: jax.Array,
        *,
        num_frames: int,
        text_mask: Optional[jnp.ndarray] = None,
        sampler: Optional[VideoGenerationSampler] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        sampler = sampler or VideoGenerationSampler()
        if text_mask is None:
            text_mask = jnp.ones(text_ids.shape, dtype=bool)
        text_emb = self.text_encoder.apply(
            self.text_encoder_params, text_ids, padding_mask=text_mask
        )
        tokens = generate_video_tokens(
            self.transformer,
            self.transformer_params,
            text_emb,
            text_mask,
            rng,
            num_frames=num_frames,
            temperature=sampler.temperature,
            top_k=sampler.top_k,
            top_p=sampler.top_p,
            do_sample=sampler.do_sample,
        )
        z_q = self.codebook[tokens]  # [B, T, H, W, d]
        videos = self.decoder.apply(self.decoder_params, z_q)
        return videos, tokens

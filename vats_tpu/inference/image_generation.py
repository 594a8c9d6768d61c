"""Autoregressive image generation: jitted on-device token sampling + decode.

The reference's image generation loop is an EMPTY file
(/root/reference/src/autoregressive_image_gen/autoregressive_transformer/
generation/generate.py, 0 LoC) and its sampler's top-p is a pass-through stub
(generation/sample.py:45-55) — catalogued defects (SURVEY.md §2.13.1-2).
This module supplies the designed behavior:

  * ``ImageGenerationSampler``: temperature / top-k / REAL top-p / greedy
    (reusing the shared vectorized samplers)
  * ``generate_image_tokens``: one compiled program — raster-order
    lax.fori_loop over the H'*W' latent grid with a donated KV cache and
    cross-attention to the text embeddings; input at step i is the token
    sampled at step i-1 (step 0 feeds ``start_token_id``)
  * ``generate_images``: text ids -> text encoder -> token sampling ->
    codebook lookup -> VQ-VAE decoder -> [B, C, H, W] images in [0, 1].
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from vats_tpu.configs.image_gen import ImageGenArgs
from vats_tpu.inference.sampling import sample_logits
from vats_tpu.models.image_gen import (
    AutoregressiveImageTransformer,
    TransformerTextEncoder,
    VQVAEDecoder,
)


class ImageGenerationSampler:
    """Static sampler config mirroring the reference class
    (generation/sample.py:6-101) with a working top-p."""

    def __init__(
        self,
        temperature: Optional[float] = 1.0,
        top_k: Optional[int] = None,
        top_p: Optional[float] = None,
        do_sample: bool = True,
    ):
        self.temperature = temperature
        self.top_k = top_k
        self.top_p = top_p
        self.do_sample = do_sample

    def __call__(self, rng: jax.Array, logits: jnp.ndarray) -> jnp.ndarray:
        return sample_logits(
            rng,
            logits,
            temperature=self.temperature,
            top_k=self.top_k,
            top_p=self.top_p,
            do_sample=self.do_sample,
        )


@functools.partial(
    jax.jit,
    static_argnames=(
        "model",
        "grid_h",
        "grid_w",
        "temperature",
        "top_k",
        "top_p",
        "do_sample",
        "start_token_id",
    ),
)
def generate_image_tokens(
    model: AutoregressiveImageTransformer,
    params: Any,
    text_embeddings: jnp.ndarray,
    text_mask: Optional[jnp.ndarray],
    rng: jax.Array,
    *,
    grid_h: int,
    grid_w: int,
    temperature: Optional[float] = 1.0,
    top_k: Optional[int] = None,
    top_p: Optional[float] = None,
    do_sample: bool = True,
    start_token_id: int = 0,
) -> jnp.ndarray:
    """Sample [B, grid_h, grid_w] codebook indices autoregressively."""
    b = text_embeddings.shape[0]
    n = grid_h * grid_w
    cache = model.init_cache(b, n)
    tokens = jnp.zeros((b, n), dtype=jnp.int32)

    start = jnp.full((b, 1), start_token_id, dtype=jnp.int32)
    logits, cache = model.apply(
        params,
        start,
        text_embeddings,
        cross_padding_mask=text_mask,
        cache=cache,
        grid_w=grid_w,
        return_logits=True,
        deterministic=True,
    )

    def body(i, state):
        tokens, cache, logits, rng = state
        rng, srng = jax.random.split(rng)
        next_tok = sample_logits(
            srng,
            logits[:, -1],
            temperature=temperature,
            top_k=top_k,
            top_p=top_p,
            do_sample=do_sample,
        )
        tokens = jax.lax.dynamic_update_slice(tokens, next_tok[:, None], (0, i))

        def feed(args):
            cache, = args
            lg, cache = model.apply(
                params,
                next_tok[:, None],
                text_embeddings,
                cross_padding_mask=text_mask,
                cache=cache,
                grid_w=grid_w,
                return_logits=True,
                deterministic=True,
            )
            return lg, cache

        def skip(args):
            cache, = args
            return logits, cache

        logits, cache = jax.lax.cond(i < n - 1, feed, skip, (cache,))
        return tokens, cache, logits, rng

    tokens, _, _, _ = jax.lax.fori_loop(
        0, n, body, (tokens, cache, logits, rng)
    )
    return tokens.reshape(b, grid_h, grid_w)


@functools.partial(
    jax.jit,
    static_argnames=(
        "model",
        "grid_h",
        "grid_w",
        "temperature",
        "top_k",
        "top_p",
        "do_sample",
        "start_token_id",
        "page_size",
    ),
)
def generate_image_tokens_paged(
    model: AutoregressiveImageTransformer,
    params: Any,
    text_embeddings: jnp.ndarray,
    text_mask: Optional[jnp.ndarray],
    rng: jax.Array,
    *,
    grid_h: int,
    grid_w: int,
    temperature: Optional[float] = 1.0,
    top_k: Optional[int] = None,
    top_p: Optional[float] = None,
    do_sample: bool = True,
    start_token_id: int = 0,
    page_size: int = 128,
) -> jnp.ndarray:
    """Paged-KV variant of :func:`generate_image_tokens`.

    The raster decode runs through the PagedKVCache (vLLM-style page pool +
    Pallas decode kernel on TPU) with raster 2D-NTK RoPE applied from the
    cache's per-row positions — the north star's "autoregressive image
    generation loop runs as a jitted on-device decode with paged KV cache".
    Numerics match :func:`generate_image_tokens` (dense cache) exactly; see
    tests/test_image_gen.py.
    """
    b = text_embeddings.shape[0]
    n = grid_h * grid_w
    cache = model.init_paged_cache(b, n + 1, page_size=page_size)
    tokens = jnp.zeros((b, n), dtype=jnp.int32)

    start = jnp.full((b, 1), start_token_id, dtype=jnp.int32)
    logits, cache = model.apply(
        params,
        start,
        text_embeddings,
        cross_padding_mask=text_mask,
        paged_cache=cache,
        grid_w=grid_w,
        return_logits=True,
        deterministic=True,
    )

    def body(i, state):
        tokens, cache, logits, rng = state
        rng, srng = jax.random.split(rng)
        next_tok = sample_logits(
            srng,
            logits[:, -1],
            temperature=temperature,
            top_k=top_k,
            top_p=top_p,
            do_sample=do_sample,
        )
        tokens = jax.lax.dynamic_update_slice(tokens, next_tok[:, None], (0, i))

        def feed(cache):
            lg, cache = model.apply(
                params,
                next_tok[:, None],
                text_embeddings,
                cross_padding_mask=text_mask,
                paged_cache=cache,
                grid_w=grid_w,
                return_logits=True,
                deterministic=True,
            )
            return lg, cache

        def skip(cache):
            return logits, cache

        logits, cache = jax.lax.cond(i < n - 1, feed, skip, cache)
        return tokens, cache, logits, rng

    tokens, _, _, _ = jax.lax.fori_loop(0, n, body, (tokens, cache, logits, rng))
    return tokens.reshape(b, grid_h, grid_w)


class ImageGenerationPipeline:
    """Text prompt ids -> image, owning the three sub-model param trees."""

    def __init__(
        self,
        cfg: ImageGenArgs,
        text_encoder_params: Any,
        transformer_params: Any,
        decoder_params: Any,
        quantizer_codebook: jnp.ndarray,
    ):
        self.cfg = cfg
        self.text_encoder = TransformerTextEncoder(cfg)
        self.transformer = AutoregressiveImageTransformer(cfg)
        self.decoder = VQVAEDecoder(cfg)
        self.text_encoder_params = text_encoder_params
        self.transformer_params = transformer_params
        self.decoder_params = decoder_params
        self.codebook = quantizer_codebook  # [num_embeddings, d_model]

    def generate_images(
        self,
        text_ids: jnp.ndarray,
        rng: jax.Array,
        *,
        grid_h: int,
        grid_w: int,
        text_mask: Optional[jnp.ndarray] = None,
        sampler: Optional[ImageGenerationSampler] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (images [B, C, H, W] in [0,1], tokens [B, gh, gw])."""
        sampler = sampler or ImageGenerationSampler()
        if text_mask is None:
            text_mask = jnp.ones(text_ids.shape, dtype=bool)
        text_emb = self.text_encoder.apply(
            self.text_encoder_params, text_ids, padding_mask=text_mask
        )
        tokens = generate_image_tokens(
            self.transformer,
            self.transformer_params,
            text_emb,
            text_mask,
            rng,
            grid_h=grid_h,
            grid_w=grid_w,
            temperature=sampler.temperature,
            top_k=sampler.top_k,
            top_p=sampler.top_p,
            do_sample=sampler.do_sample,
        )
        z_q = self.codebook[tokens]  # [B, gh, gw, d]
        images = self.decoder.apply(self.decoder_params, z_q)
        return images, tokens

"""Fused text+image+video token-stream generation over a paged KV cache.

BASELINE config #5: "autoregressive video gen with fused text+image+video
token stream and paged KV cache".  The whole generation is ONE compiled
program: ragged text prefill through the paged cache, then a lax.fori_loop
that decodes the image segment followed by the video segment — one token per
step through the Pallas paged decode kernel, with per-step logit masking to
the active modality's vocabulary range and modality-dependent RoPE.

The reference has no counterpart (its video-gen generate.py/sample.py are
empty files, SURVEY.md §2.13.1); equivalence is instead proven against the
same model's full uncached forward (tests/test_multimodal.py).
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from vats_tpu.configs.multimodal import MultimodalStreamArgs
from vats_tpu.inference.sampling import sample_logits
from vats_tpu.models.multimodal import (
    MODALITY_IMAGE,
    MODALITY_TEXT,
    MODALITY_VIDEO,
    MultimodalLM,
)


@functools.partial(
    jax.jit,
    static_argnames=(
        "model", "temperature", "top_k", "top_p", "do_sample", "page_size",
    ),
)
def generate_multimodal(
    model: MultimodalLM,
    params: Any,
    text_ids: jnp.ndarray,
    text_mask: Optional[jnp.ndarray],
    rng: jax.Array,
    *,
    temperature: Optional[float] = 1.0,
    top_k: Optional[int] = None,
    top_p: Optional[float] = None,
    do_sample: bool = True,
    page_size: int = 128,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """text_ids: [B, T_text] right-padded prompt (ids < text_vocab_size).

    Returns (image_codes [B, gh, gw], video_codes [B, gt, gh, gw]) — codebook
    indices with the fused-vocab offsets removed, ready for the image /
    video VQ-VAE decoders.
    """
    cfg = model.cfg
    b, t_text = text_ids.shape
    n_img, n_vid = cfg.image_tokens, cfg.video_tokens
    n_total = n_img + n_vid
    vt, vi = cfg.text_vocab_size, cfg.image_vocab_size

    if text_mask is None:
        text_mask = jnp.ones((b, t_text), dtype=bool)
    text_mask = text_mask.astype(bool)
    prompt_lens = jnp.sum(text_mask, axis=1).astype(jnp.int32)

    cache = model.init_paged_cache(
        b, max_len=t_text + n_total, page_size=page_size
    )

    # ---- ragged text prefill ----
    modality = jnp.zeros((b, t_text), jnp.int32)  # MODALITY_TEXT
    local_pos = jnp.broadcast_to(
        jnp.arange(t_text, dtype=jnp.int32)[None, :], (b, t_text)
    )
    last_idx = jnp.maximum(prompt_lens - 1, 0)
    logits, cache = model.apply(
        {"params": params} if "params" not in params else params,
        text_ids,
        modality,
        local_pos,
        padding_mask=text_mask,
        paged_cache=cache,
        deterministic=True,
        readout_positions=last_idx,
    )
    next_logits = logits[:, 0]

    vocab_ids = jnp.arange(cfg.vocab_size)
    gen = jnp.zeros((b, n_total), dtype=jnp.int32)

    def body(i, state):
        gen, cache, next_logits, rng = state
        rng, srng = jax.random.split(rng)
        is_img = i < n_img
        lo = jnp.where(is_img, vt, vt + vi)
        hi = jnp.where(is_img, vt + vi, cfg.vocab_size)
        masked = jnp.where(
            (vocab_ids >= lo) & (vocab_ids < hi), next_logits, -jnp.inf
        )
        tok = sample_logits(
            srng, masked,
            temperature=temperature, top_k=top_k, top_p=top_p,
            do_sample=do_sample,
        )
        gen = jax.lax.dynamic_update_slice(gen, tok[:, None], (0, i))

        mod_i = jnp.where(is_img, MODALITY_IMAGE, MODALITY_VIDEO)
        loc_i = jnp.where(is_img, i, i - n_img)

        def feed(cache):
            lg, cache = model.apply(
                {"params": params} if "params" not in params else params,
                tok[:, None],
                jnp.full((b, 1), mod_i, jnp.int32),
                jnp.full((b, 1), loc_i, jnp.int32),
                paged_cache=cache,
                deterministic=True,
            )
            return lg[:, 0], cache

        def skip(cache):
            return next_logits, cache

        next_logits, cache = jax.lax.cond(i < n_total - 1, feed, skip, cache)
        return gen, cache, next_logits, rng

    gen, _, _, _ = jax.lax.fori_loop(
        0, n_total, body, (gen, cache, next_logits, rng)
    )

    image_codes = (gen[:, :n_img] - vt).reshape(
        b, cfg.image_grid_h, cfg.image_grid_w
    )
    video_codes = (gen[:, n_img:] - (vt + vi)).reshape(
        b, cfg.video_grid_t, cfg.video_grid_h, cfg.video_grid_w
    )
    return image_codes, video_codes

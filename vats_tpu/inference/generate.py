"""Jitted autoregressive generation: prefill + lax.while_loop decode.

TPU-native redesign of ``AutoregressiveTokenGenerator``
(/root/reference/src/transformers/nlp/inference/generate.py:15-296).  The
reference runs an eager python loop per token, growing ``generated_ids`` and
the attention mask each step (:226-232); here the whole generation is ONE
compiled program:

  * static [B, total_len] token + validity buffers
  * functional KV cache appended in place (donated)
  * per-step sampling (repetition penalty / temperature / top-k / top-p)
    vectorized over the batch
  * EOS tracking via an ``unfinished`` flag vector; finished rows emit
    pad_token_id (reference :223)
  * early exit when all rows finish via the while_loop condition

``generate`` reproduces the reference's *uncached* forward semantics (the
well-defined path — the reference's cached decode carries the double-append
and RoPE-position defects catalogued in SURVEY.md §2.13.8).
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from vats_tpu.configs.nlp import GenerationArgs, ModelArgs
from vats_tpu.inference.sampling import sample_logits
from vats_tpu.models.text_lm import TextLM, resolve_dtype


@functools.partial(
    jax.jit,
    static_argnames=(
        "model",
        "max_new_tokens",
        "temperature",
        "top_k",
        "top_p",
        "do_sample",
        "repetition_penalty",
        "pad_token_id",
        "eos_token_id",
        "total_len",
        "approx_top_k",
    ),
)
def generate(
    model: TextLM,
    params: Any,
    input_ids: jnp.ndarray,
    attention_mask: Optional[jnp.ndarray],
    rng: jax.Array,
    *,
    max_new_tokens: int,
    temperature: Optional[float] = None,
    top_k: Optional[int] = None,
    top_p: Optional[float] = None,
    do_sample: bool = True,
    repetition_penalty: Optional[float] = None,
    pad_token_id: int = 0,
    eos_token_id: Optional[int] = None,
    total_len: Optional[int] = None,
    approx_top_k: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Generate up to ``max_new_tokens`` after a right-padded prompt.

    input_ids: [B, T_prompt] int32.  attention_mask: [B, T_prompt] bool
    (True = real token) or None.  Returns (tokens [B, total_len], lengths [B])
    where lengths counts valid tokens (prompt + generated) per row.
    """
    b, t_prompt = input_ids.shape
    cfg = model.cfg
    if total_len is None:
        total_len = min(cfg.max_seq_len, t_prompt + max_new_tokens)
    # never generate more than max_new_tokens, even with a roomier buffer
    num_new = min(max_new_tokens, max(0, total_len - t_prompt))

    if attention_mask is None:
        attention_mask = input_ids != pad_token_id
    attention_mask = attention_mask.astype(bool)
    prompt_lens = jnp.sum(attention_mask, axis=1).astype(jnp.int32)

    # static buffers
    tokens = jnp.full((b, total_len), pad_token_id, dtype=jnp.int32)
    tokens = jax.lax.dynamic_update_slice(tokens, input_ids.astype(jnp.int32), (0, 0))
    valid = jnp.zeros((b, total_len), dtype=bool)
    valid = jax.lax.dynamic_update_slice(valid, attention_mask, (0, 0))

    # sliding-window models get a ring cache: the buffer holds only the most
    # recent window-sized slots, so decode at 32k context reads (and fits)
    # a ~window-sized cache instead of a context-sized one.  Static decision:
    # cfg.left_window and total_len are compile-time constants.
    from vats_tpu.nn.kv_cache import ring_slots_for_window

    lw = cfg.left_window if cfg.left_window is not None else -1
    if not getattr(cfg, "apply_window_in_xla", True):
        lw = -1  # window not enforced in attention -> ring would drop keys
    if lw >= 0 and ring_slots_for_window(lw) < total_len:
        cache = model.init_cache(b, ring_slots_for_window(lw), ring=True)
    else:
        cache = model.init_cache(b, total_len)

    # prefill over the whole prompt; logits only at the last *valid* prompt
    # position per row (right padding) — skips the [B, T, V] readout
    last_idx = jnp.maximum(prompt_lens - 1, 0)
    logits, cache, _ = model.apply(
        params, input_ids, padding_mask=valid, cache=cache,
        deterministic=True, readout_positions=last_idx,
    )
    next_logits = logits[:, 0]

    unfinished = jnp.ones((b,), dtype=bool)

    def cond(state):
        step, _, _, _, unfinished, _, _ = state
        return jnp.logical_and(step < num_new, jnp.any(unfinished))

    def body(state):
        step, tokens, valid, cache, unfinished, next_logits, rng = state
        rng, sample_rng = jax.random.split(rng)
        next_tokens = sample_logits(
            sample_rng,
            next_logits,
            temperature=temperature,
            top_k=top_k,
            top_p=top_p,
            do_sample=do_sample,
            repetition_penalty=repetition_penalty,
            generated_ids=tokens,
            generated_valid=valid,
            approx_top_k=approx_top_k,
        )
        next_tokens = jnp.where(unfinished, next_tokens, pad_token_id)

        pos = t_prompt + step
        tokens = jax.lax.dynamic_update_slice(
            tokens, next_tokens[:, None], (0, pos)
        )
        valid = jax.lax.dynamic_update_slice(
            valid, unfinished[:, None], (0, pos)
        )
        if eos_token_id is not None:
            unfinished = unfinished & (next_tokens != eos_token_id)

        logits, cache, _ = model.apply(
            params,
            next_tokens[:, None],
            padding_mask=valid,
            cache=cache,
            deterministic=True,
        )
        return step + 1, tokens, valid, cache, unfinished, logits[:, 0], rng

    state = (jnp.int32(0), tokens, valid, cache, unfinished, next_logits, rng)
    _, tokens, valid, _, _, _, _ = jax.lax.while_loop(cond, body, state)
    lengths = jnp.sum(valid, axis=1).astype(jnp.int32)
    return tokens, lengths


@functools.partial(
    jax.jit,
    static_argnames=(
        "model",
        "max_new_tokens",
        "temperature",
        "top_k",
        "top_p",
        "do_sample",
        "repetition_penalty",
        "pad_token_id",
        "eos_token_id",
        "total_len",
        "page_size",
        "approx_top_k",
        "kv_quant",
        "prefill_row_chunk",
    ),
)
def generate_paged(
    model: TextLM,
    params: Any,
    input_ids: jnp.ndarray,
    attention_mask: Optional[jnp.ndarray],
    rng: jax.Array,
    *,
    max_new_tokens: int,
    temperature: Optional[float] = None,
    top_k: Optional[int] = None,
    top_p: Optional[float] = None,
    do_sample: bool = True,
    repetition_penalty: Optional[float] = None,
    pad_token_id: int = 0,
    eos_token_id: Optional[int] = None,
    total_len: Optional[int] = None,
    page_size: int = 128,
    approx_top_k: bool = False,
    kv_quant: Optional[str] = None,
    prefill_row_chunk: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Ragged-batch generation over a paged KV cache.

    Unlike :func:`generate` (dense cache, every row shares absolute buffer
    positions so padded prompts burn positions), rows here advance by their
    TRUE lengths: per-sequence page tables + lengths, per-row RoPE positions,
    and the paged decode kernel on TPU.  Returns (tokens [B, total_len] laid
    out compactly per row, lengths [B]).

    ``kv_quant='int8'`` stores the page pool in int8 with per-(token, group)
    scales — half the KV bytes per decode step (the HBM-bound cost), double
    the batch*context that fits.  The current token always attends at full
    precision; history dequantizes inside the kernel.
    """
    from vats_tpu.ops.decode_attention import PagedKVCache

    if kv_quant not in (None, "int8"):
        raise ValueError(f"unsupported kv_quant mode: {kv_quant!r}")

    b, t_prompt = input_ids.shape
    cfg = model.cfg
    if total_len is None:
        total_len = min(cfg.max_seq_len, t_prompt + max_new_tokens)

    if attention_mask is None:
        attention_mask = input_ids != pad_token_id
    attention_mask = attention_mask.astype(bool)
    prompt_lens = jnp.sum(attention_mask, axis=1).astype(jnp.int32)

    tokens = jnp.full((b, total_len), pad_token_id, dtype=jnp.int32)
    tokens = jax.lax.dynamic_update_slice(
        tokens, input_ids.astype(jnp.int32), (0, 0)
    )
    valid = jnp.zeros((b, total_len), dtype=bool)
    valid = jax.lax.dynamic_update_slice(valid, attention_mask, (0, 0))

    cache = PagedKVCache.create(
        num_layers=cfg.num_layers,
        batch_size=b,
        max_seq_len=total_len,
        kv_heads=cfg.query_groups,
        head_dim=cfg.head_dim,
        page_size=page_size,
        dtype=jnp.int8 if kv_quant == "int8" else resolve_dtype(cfg.dtype),
    )

    last_idx = jnp.maximum(prompt_lens - 1, 0)
    if prefill_row_chunk is None or prefill_row_chunk >= b:
        logits, cache, _ = model.apply(
            params, input_ids, padding_mask=attention_mask, paged_cache=cache,
            deterministic=True, readout_positions=last_idx,
        )
        next_logits = logits[:, 0]
    else:
        # row-chunked prefill: rows are independent until decode, so the
        # prompt forward runs in waves sharing one page pool — bounds the
        # [chunk, T, ...] activation temps that cap batch size (B=256 bf16
        # at the bench tier OOMs in prefill HLO temps, not in the pool)
        rc = prefill_row_chunk
        if b % rc != 0:
            raise ValueError(
                f"prefill_row_chunk ({rc}) must divide batch ({b})"
            )
        pool, scales = cache.kv_pages, cache.kv_scales
        chunk_logits, chunk_lens = [], []
        for lo in range(0, b, rc):
            sub = cache.replace(
                kv_pages=pool,
                kv_scales=scales,
                page_table=cache.page_table[lo:lo + rc],
                lengths=cache.lengths[lo:lo + rc],
            )
            lg, sub_out, _ = model.apply(
                params, input_ids[lo:lo + rc],
                padding_mask=attention_mask[lo:lo + rc], paged_cache=sub,
                deterministic=True, readout_positions=last_idx[lo:lo + rc],
            )
            pool, scales = sub_out.kv_pages, sub_out.kv_scales
            chunk_lens.append(sub_out.lengths)
            chunk_logits.append(lg[:, 0])
        cache = cache.replace(
            kv_pages=pool, kv_scales=scales,
            lengths=jnp.concatenate(chunk_lens), fresh=False,
        )
        next_logits = jnp.concatenate(chunk_logits, axis=0)

    unfinished = jnp.ones((b,), dtype=bool)

    def cond(state):
        step, _, _, _, unfinished, _, _ = state
        return jnp.logical_and(step < max_new_tokens, jnp.any(unfinished))

    def body(state):
        step, tokens, valid, cache, unfinished, next_logits, rng = state
        rng, srng = jax.random.split(rng)
        next_tokens = sample_logits(
            srng,
            next_logits,
            temperature=temperature,
            top_k=top_k,
            top_p=top_p,
            do_sample=do_sample,
            repetition_penalty=repetition_penalty,
            generated_ids=tokens,
            generated_valid=valid,
            approx_top_k=approx_top_k,
        )
        # rows that would overflow their buffer stop generating
        room = cache.lengths < total_len
        unfinished = unfinished & room
        next_tokens = jnp.where(unfinished, next_tokens, pad_token_id)

        rows = jnp.arange(b)
        pos = jnp.minimum(cache.lengths, total_len - 1)
        active = unfinished  # rows actually emitting a token this step
        tokens = tokens.at[rows, pos].set(
            jnp.where(active, next_tokens, tokens[rows, pos])
        )
        valid = valid.at[rows, pos].set(valid[rows, pos] | active)
        if eos_token_id is not None:
            unfinished = unfinished & (next_tokens != eos_token_id)

        logits, cache, _ = model.apply(
            params, next_tokens[:, None], paged_cache=cache,
            deterministic=True,
        )
        # finished rows appended a pad; roll their length back so the cache
        # tracks true tokens only
        cache = cache.replace(
            lengths=jnp.where(active, cache.lengths, cache.lengths - 1)
        )
        return step + 1, tokens, valid, cache, unfinished, logits[:, 0], rng

    state = (jnp.int32(0), tokens, valid, cache, unfinished, next_logits, rng)
    _, tokens, valid, cache, _, _, _ = jax.lax.while_loop(cond, body, state)
    return tokens, jnp.sum(valid, axis=1).astype(jnp.int32)


class TokenGenerator:
    """Tokenizer-facing wrapper mirroring ``generate_tokens(prompt, args, tok)``
    (/root/reference/src/transformers/nlp/inference/generate.py:244-296).

    Prompt lengths are bucketed to powers of two to bound jit recompiles.
    """

    def __init__(
        self,
        model_args: ModelArgs,
        params: Any = None,
        seed: int = 0,
        cast_params_to_compute_dtype: bool = False,
        use_paged: bool = False,
        quantize: Optional[str] = None,
        kv_quant: Optional[str] = None,
    ):
        """quantize: None | 'int8' — weight-only int8 serving (per-channel
        scales, dequant fused into each matmul's weight load inside jit;
        halves per-step HBM weight traffic and resident weight memory).
        kv_quant: None | 'int8' — int8 paged KV pages with per-(token,
        group) scales (requires use_paged; halves per-step KV traffic)."""
        self.model_args = model_args
        self.model = TextLM(model_args)
        if params is None:
            rng = jax.random.PRNGKey(seed)
            dummy = jnp.zeros((1, 8), dtype=jnp.int32)
            params = self.model.init(rng, dummy)["params"]
            params = {"params": params}
        elif "params" not in params:
            params = {"params": params}
        if cast_params_to_compute_dtype and model_args.dtype != "float32":
            # decode is weight-bandwidth-bound; storing inference weights in
            # the compute dtype halves every per-step HBM weight read
            from vats_tpu.models.text_lm import resolve_dtype

            cdt = resolve_dtype(model_args.dtype)
            params = jax.tree_util.tree_map(
                lambda x: x.astype(cdt)
                if hasattr(x, "dtype") and x.dtype == jnp.float32
                else x,
                params,
            )
        if quantize is not None:
            if quantize != "int8":
                raise ValueError(f"unsupported quantize mode: {quantize!r}")
            from vats_tpu.inference.quantize import QuantizedModel, quantize_params

            params = quantize_params(params)
            self.model = QuantizedModel(self.model)
        if kv_quant is not None and not use_paged:
            raise ValueError("kv_quant requires use_paged=True")
        self.params = params
        self.use_paged = use_paged
        self.kv_quant = kv_quant
        self._rng = jax.random.PRNGKey(seed + 1)

    @staticmethod
    def _bucket(n: int) -> int:
        b = 8
        while b < n:
            b *= 2
        return b

    def generate_tokens(
        self,
        prompt: str,
        generation_args: GenerationArgs,
        tokenizer,
        attention_mask: Optional[jnp.ndarray] = None,
    ) -> str:
        if not prompt or not prompt.strip():
            return "Please enter a valid prompt."
        if generation_args.max_new_tokens <= 0:
            return prompt

        ids = tokenizer.encode(prompt)
        pad_id = generation_args.pad_token_id
        if pad_id is None:
            pad_id = getattr(tokenizer, "pad_token_id", 0) or 0
        t = len(ids)
        bucket = min(self._bucket(t), self.model_args.max_seq_len)
        ids = ids[:bucket]
        t = len(ids)
        input_ids = jnp.full((1, bucket), pad_id, dtype=jnp.int32)
        input_ids = input_ids.at[0, :t].set(jnp.asarray(ids, dtype=jnp.int32))
        mask = jnp.zeros((1, bucket), dtype=bool).at[0, :t].set(True)

        self._rng, rng = jax.random.split(self._rng)
        total_len = min(
            self.model_args.max_seq_len, bucket + generation_args.max_new_tokens
        )
        gen_fn = generate_paged if self.use_paged else generate
        extra = {"kv_quant": self.kv_quant} if self.use_paged else {}
        tokens, lengths = gen_fn(
            self.model,
            self.params,
            input_ids,
            mask,
            rng,
            max_new_tokens=generation_args.max_new_tokens,
            temperature=generation_args.temperature,
            top_k=generation_args.top_k,
            top_p=generation_args.top_p,
            do_sample=generation_args.do_sample,
            repetition_penalty=generation_args.repetition_penalty,
            pad_token_id=int(pad_id),
            eos_token_id=generation_args.eos_token_id,
            total_len=total_len,
            **extra,
        )
        row = jax.device_get(tokens[0])
        n_valid = int(lengths[0])
        # dense layout: generated tokens start at the padded bucket length;
        # paged layout: rows are compact, generated tokens start at t
        gen_start = t if self.use_paged else bucket
        new_ids = row[gen_start : gen_start + max(0, n_valid - t)]
        if generation_args.return_only_new_tokens:
            out_ids = new_ids
        else:
            out_ids = list(row[:t]) + list(new_ids)
        return tokenizer.decode(list(out_ids), skip_special_tokens=True)

"""Jit-compatible logit processors and sampling.

Vectorized, static-shape re-designs of the reference's eager per-token
filters (/root/reference/src/transformers/nlp/inference/generate.py:146-220):

  * repetition penalty — the reference loops over each batch row's unique
    tokens in python (:149-160); here a [B, V] presence mask is built with one
    scatter and the penalty applied with one where()
  * temperature (0 => greedy, :165-173)
  * top-k (mask logits below the k-th value, :176-191)
  * top-p nucleus with the keep-first-token shift (:194-212)
  * categorical sampling / argmax (:215-220)

All filters assign -inf via a large negative fp32 constant.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = float(jnp.finfo(jnp.float32).min)


def apply_repetition_penalty(
    logits: jnp.ndarray,
    generated_ids: jnp.ndarray,
    generated_valid: jnp.ndarray,
    penalty: float,
) -> jnp.ndarray:
    """logits: [B, V]; generated_ids/valid: [B, S] (valid marks real tokens).

    For every token id present in a row: positive logits are divided by the
    penalty, negative ones multiplied (reference semantics, generate.py:153-160).
    """
    b, v = logits.shape
    ones = jnp.ones_like(generated_ids, dtype=jnp.int32) * generated_valid.astype(
        jnp.int32
    )
    presence = jnp.zeros((b, v), dtype=jnp.int32)
    presence = presence.at[
        jnp.arange(b)[:, None], generated_ids.astype(jnp.int32)
    ].max(ones)
    present = presence > 0
    penalized = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(present, penalized, logits)


def exact_top_k(
    logits: jnp.ndarray, k: int, chunk: int = 256
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k over the last axis, sorted descending — chunked.

    The global top-k is a subset of the union of per-chunk top-ks, so a
    per-chunk TopK (cheap: each chunk is sorted independently) followed by a
    TopK over the V/chunk * k candidates is exact.  At [128, 65536] k=50 the
    v5e decode trace put the direct TopK custom call at 1.33 ms/step; the
    chunked form measures ~0.70x of it (tools/probe_topk.py — verified
    bit-identical indices/values against jax.lax.top_k there).
    """
    v = logits.shape[-1]
    if v <= 4 * chunk or k > chunk or logits.ndim != 2:
        return jax.lax.top_k(logits, k)
    c = v // chunk
    if v % chunk:
        return jax.lax.top_k(logits, k)
    b = logits.shape[0]
    xc = logits.reshape(b, c, chunk)
    v1, i1 = jax.lax.top_k(xc, k)  # [B, c, k] per-chunk, sorted
    i1 = i1.astype(jnp.int32) + (
        jnp.arange(c, dtype=jnp.int32) * chunk
    )[None, :, None]
    v2, i2 = jax.lax.top_k(v1.reshape(b, c * k), k)
    return v2, jnp.take_along_axis(i1.reshape(b, c * k), i2, axis=-1)


def apply_top_k(logits: jnp.ndarray, top_k: int) -> jnp.ndarray:
    """Mask logits strictly below the top-k threshold to -inf. [B, V]."""
    if top_k <= 0:
        return logits
    k = min(top_k, logits.shape[-1])
    kth = exact_top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, NEG_INF, logits)


def apply_top_p(logits: jnp.ndarray, top_p: float) -> jnp.ndarray:
    """Nucleus filtering with the reference's keep-first shift. [B, V]."""
    if not (0.0 < top_p < 1.0):
        return logits
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    remove_sorted = cum > top_p
    # shift right so the first token crossing the threshold is kept
    remove_sorted = jnp.concatenate(
        [jnp.zeros_like(remove_sorted[..., :1]), remove_sorted[..., :-1]], axis=-1
    )
    # threshold in logit space: smallest kept sorted logit per row
    kept_min = jnp.min(
        jnp.where(remove_sorted, jnp.inf, sorted_logits), axis=-1, keepdims=True
    )
    return jnp.where(logits < kept_min, NEG_INF, logits)


def sample_logits(
    rng: jax.Array,
    logits: jnp.ndarray,
    *,
    temperature: Optional[float] = None,
    top_k: Optional[int] = None,
    top_p: Optional[float] = None,
    do_sample: bool = True,
    repetition_penalty: Optional[float] = None,
    generated_ids: Optional[jnp.ndarray] = None,
    generated_valid: Optional[jnp.ndarray] = None,
    approx_top_k: bool = False,
) -> jnp.ndarray:
    """Full sampling pipeline on [B, V] logits -> [B] int32 next tokens.

    Fast path: with top-k active, temperature / top-p / categorical run in
    the k-dimensional top-k subspace (exactly equivalent — everything below
    the k-th logit is -inf either way, and top_k returns values sorted
    descending so the nucleus cumsum needs no extra sort).  This removes the
    vocab-sized sort + cumsum + categorical from the decode loop, which
    profiling showed cost ~40% of decode time at V=32k.

    approx_top_k swaps the exact vocab-wide top-k for the TPU-native
    ``jax.lax.approx_max_k`` (recall ~0.95; near-boundary candidates may be
    swapped for neighbors).  Opt-in: changes sampling support slightly.
    """
    logits = logits.astype(jnp.float32)
    if repetition_penalty is not None and repetition_penalty != 1.0:
        if repetition_penalty <= 0:
            raise ValueError(
                f"expected repetition_penalty > 0, got {repetition_penalty}"
            )
        logits = apply_repetition_penalty(
            logits, generated_ids, generated_valid, repetition_penalty
        )
    if temperature is not None:
        if temperature < 0:
            raise ValueError(f"expected temperature >= 0, got {temperature}")
        if temperature == 0:
            do_sample = False
    if top_k is not None:
        if top_k < 1:
            raise ValueError(f"expected top_k >= 1, got {top_k}")
        if top_k == 1:
            do_sample = False
    if top_p is not None and not (0.0 < top_p <= 1.0):
        raise ValueError(f"expected 0 < top_p <= 1, got {top_p}")

    if (
        do_sample
        and top_k is not None
        and 1 < top_k < logits.shape[-1]
    ):
        if approx_top_k:
            vals, idx = jax.lax.approx_max_k(logits, top_k)
            # approx_max_k does not guarantee sorted order; nucleus needs it
            order = jnp.argsort(-vals, axis=-1)
            vals = jnp.take_along_axis(vals, order, axis=-1)
            idx = jnp.take_along_axis(idx, order, axis=-1)
        else:
            vals, idx = exact_top_k(logits, top_k)  # sorted descending
        if temperature is not None and temperature != 0:
            vals = vals / temperature
        if top_p is not None and top_p < 1.0:
            # nucleus over the (already sorted) subspace with keep-first shift
            probs = jax.nn.softmax(vals, axis=-1)
            cum = jnp.cumsum(probs, axis=-1)
            remove = cum > top_p
            remove = jnp.concatenate(
                [jnp.zeros_like(remove[..., :1]), remove[..., :-1]], axis=-1
            )
            vals = jnp.where(remove, NEG_INF, vals)
        choice = jax.random.categorical(rng, vals, axis=-1)
        return jnp.take_along_axis(idx, choice[..., None], axis=-1)[
            ..., 0
        ].astype(jnp.int32)

    # generic (full-vocab) path
    if temperature is not None and temperature != 0:
        logits = logits / temperature
    if top_k is not None and top_k > 1:
        logits = apply_top_k(logits, top_k)
    if top_p is not None:
        logits = apply_top_p(logits, top_p)
    if do_sample:
        return jax.random.categorical(rng, logits, axis=-1).astype(jnp.int32)
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def sample_logits_per_row(
    rng: Optional[jax.Array],
    logits: jnp.ndarray,
    *,
    temperature: jnp.ndarray,
    top_k: jnp.ndarray,
    top_p: jnp.ndarray,
    row_seeds: Optional[jnp.ndarray] = None,
    positions: Optional[jnp.ndarray] = None,
    kmax: int = 64,
) -> jnp.ndarray:
    """Per-ROW sampling for continuous batching: each batch row carries its
    own (temperature, top_k, top_p) — the serving analog of the reference's
    per-call GenerationArgs (generate.py:244), which a shared-batch engine
    cannot honor with one global filter chain.

    logits [B, V]; temperature/top_p float32 [B]; top_k int32 [B].
    Semantics per row:
      * temperature <= 0 or top_k == 1  => greedy (argmax)
      * top_k in [1, kmax]              => exact top-k restriction
      * top_k == 0                      => no explicit top-k, but sampling is
        still restricted to the top-``kmax`` logits (static-shape bound; the
        tail mass beyond kmax is negligible for any practical temperature)
      * top_p in (0, 1)                 => nucleus over the sorted subspace

    Randomness: with ``row_seeds``/``positions`` given, row i draws from
    fold_in(PRNGKey(row_seeds[i]), positions[i]) — a per-request stream that
    is REPRODUCIBLE regardless of batch composition (a request re-run alone
    or preempted+resumed sees identical draws at identical positions).
    Otherwise all rows share ``rng`` (one categorical draw).
    """
    logits = logits.astype(jnp.float32)
    kmax = min(kmax, logits.shape[-1])
    vals, idx = exact_top_k(logits, kmax)  # sorted descending
    pos = jnp.arange(kmax)[None, :]
    k_eff = jnp.where(top_k > 0, jnp.minimum(top_k, kmax), kmax)
    vals = jnp.where(pos < k_eff[:, None], vals, NEG_INF)
    greedy = (temperature <= 0.0) | (top_k == 1)
    safe_t = jnp.where(greedy, 1.0, jnp.maximum(temperature, 1e-6))
    vals = vals / safe_t[:, None]
    probs = jax.nn.softmax(vals, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    remove = cum > top_p[:, None]
    remove = jnp.concatenate(
        [jnp.zeros_like(remove[:, :1]), remove[:, :-1]], axis=-1
    )
    use_p = (top_p > 0.0) & (top_p < 1.0)
    vals = jnp.where(use_p[:, None] & remove, NEG_INF, vals)
    if row_seeds is not None:
        keys = jax.vmap(jax.random.fold_in)(
            jax.vmap(jax.random.PRNGKey)(row_seeds), positions
        )
        u = jax.vmap(
            lambda k: jax.random.uniform(
                k, (kmax,), minval=jnp.finfo(jnp.float32).tiny
            )
        )(keys)
        gumbel = -jnp.log(-jnp.log(u))
        choice = jnp.argmax(vals + gumbel, axis=-1)
    else:
        choice = jax.random.categorical(rng, vals, axis=-1)
    # sorted-descending subspace: index 0 IS the argmax for greedy rows
    choice = jnp.where(greedy, 0, choice)
    return jnp.take_along_axis(idx, choice[:, None], axis=-1)[:, 0].astype(
        jnp.int32
    )

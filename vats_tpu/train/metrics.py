"""Loss / perplexity metrics.

Mirrors /root/reference/utils/transformers/nlp/compute_metrics.py:9-54:
cross-entropy ignoring label -100 (labels arrive pre-shifted from the data
pipeline) plus ``aux_loss_weight * aux_loss``; perplexity = exp(lm_loss).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

IGNORE_INDEX = -100


def compute_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    aux_loss: Optional[jnp.ndarray] = None,
    aux_loss_weight: float = 0.01,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """logits [B, T, V] fp32, labels [B, T] int (-100 = ignore).

    Returns (total_loss, lm_loss, aux_loss) — mean CE over non-ignored tokens.
    """
    valid = labels != IGNORE_INDEX
    safe_labels = jnp.where(valid, labels, 0).astype(jnp.int32)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    token_nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    token_nll = jnp.where(valid, token_nll, 0.0)
    denom = jnp.maximum(jnp.sum(valid), 1)
    lm_loss = jnp.sum(token_nll) / denom
    if aux_loss is None:
        aux_loss = jnp.zeros((), dtype=jnp.float32)
    total = lm_loss + aux_loss_weight * aux_loss
    return total, lm_loss, aux_loss


def compute_perplexity(loss: Union[jnp.ndarray, float]) -> float:
    return float(jnp.exp(loss)) if isinstance(loss, jnp.ndarray) else math.exp(loss)


def fused_linear_cross_entropy(
    hidden: jnp.ndarray,
    readout: jnp.ndarray,
    labels: jnp.ndarray,
    *,
    chunk: int = 128,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Mean CE of ``softmax(hidden @ readout^T)`` WITHOUT materializing the
    [B, T, V] logits.

    The readout matmul + log-softmax run per sequence chunk under
    ``jax.checkpoint`` inside a ``lax.scan``: peak logits memory is
    [B, chunk, V] (fp32), recomputed in the backward pass; gradients
    accumulate into ``hidden``'s chunks and ONE [V, d] buffer for
    ``readout``.  At the reference-medium tier (vocab 65536) the full
    buffer is 2.1 GB fp32 per 8 batch rows — the allocation that capped
    the single-chip training batch.

    hidden: [B, T, d] (post final norm); readout: [V, d] (the tied
    embedding, or lm_head kernel transposed); labels: [B, T] int with
    IGNORE_INDEX = -100 masked out.  Returns mean NLL over valid tokens.
    """
    b, t, d = hidden.shape
    pad = (-t) % chunk
    if pad:
        hidden = jnp.pad(hidden, ((0, 0), (0, pad), (0, 0)))
        labels = jnp.pad(
            labels, ((0, 0), (0, pad)), constant_values=IGNORE_INDEX
        )
    nc = (t + pad) // chunk
    # [nc, B, chunk, ...] chunk-major for scan
    h_chunks = hidden.reshape(b, nc, chunk, d).transpose(1, 0, 2, 3)
    y_chunks = labels.reshape(b, nc, chunk).transpose(1, 0, 2)

    @jax.checkpoint
    def chunk_nll(h_c, y_c, w):
        logits = jax.lax.dot_general(
            h_c.astype(compute_dtype), w.astype(compute_dtype),
            (((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [B, c, V] fp32 — lives only inside this chunk
        valid = y_c != IGNORE_INDEX
        safe = jnp.where(valid, y_c, 0).astype(jnp.int32)
        lse = jax.scipy.special.logsumexp(logits, axis=-1)
        tgt = jnp.take_along_axis(logits, safe[..., None], axis=-1)[..., 0]
        return jnp.sum(jnp.where(valid, lse - tgt, 0.0))

    def body(acc, xs):
        h_c, y_c = xs
        return acc + chunk_nll(h_c, y_c, readout), None

    total_nll, _ = jax.lax.scan(
        body, jnp.zeros((), jnp.float32), (h_chunks, y_chunks),
        # unroll pairs of chunks so one chunk's vocab matmul overlaps the
        # next one's readout-weight stream; keeps peak logits at 2 chunks
        unroll=2 if nc % 2 == 0 else 1,
    )
    denom = jnp.maximum(jnp.sum(labels != IGNORE_INDEX), 1)
    return total_nll / denom

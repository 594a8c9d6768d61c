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

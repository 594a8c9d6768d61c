"""Synthetic LM data for integration tests and benchmarking.

Mirrors the reference's SyntheticDataset used by its synthetic-training
integration tests (/root/reference/tests/transformers/nlp/
synthetic_training_tests.py:15-90): random token ids, labels shifted left by
one with -100 at positions that should be ignored.
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp

from vats_tpu.train.metrics import IGNORE_INDEX


def synthetic_lm_batches(
    rng: jax.Array,
    *,
    vocab_size: int,
    batch_size: int,
    seq_len: int,
    num_batches: Optional[int] = None,
    pad_fraction: float = 0.0,
) -> Iterator[Dict[str, jnp.ndarray]]:
    """Yield {'input_ids', 'labels', 'padding_mask'} batches forever or
    ``num_batches`` times."""
    i = 0
    while num_batches is None or i < num_batches:
        rng, ids_rng, len_rng = jax.random.split(rng, 3)
        ids = jax.random.randint(
            ids_rng, (batch_size, seq_len), 1, vocab_size, dtype=jnp.int32
        )
        if pad_fraction > 0:
            min_len = max(2, int(seq_len * (1 - pad_fraction)))
            lens = jax.random.randint(
                len_rng, (batch_size,), min_len, seq_len + 1, dtype=jnp.int32
            )
        else:
            lens = jnp.full((batch_size,), seq_len, dtype=jnp.int32)
        pos = jnp.arange(seq_len)[None, :]
        mask = pos < lens[:, None]
        ids = jnp.where(mask, ids, 0)
        labels = jnp.concatenate(
            [ids[:, 1:], jnp.full((batch_size, 1), IGNORE_INDEX, jnp.int32)], axis=1
        )
        # a position's label is the NEXT token, so only pos < len-1 have one
        labels = jnp.where(pos < (lens - 1)[:, None], labels, IGNORE_INDEX)
        yield {"input_ids": ids, "labels": labels, "padding_mask": mask}
        i += 1

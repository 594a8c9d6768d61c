"""Static-shape functional KV cache.

The reference's KVCache (/root/reference/src/optimized_attention.py:169-287)
is a python object holding per-layer dicts, appended to eagerly; its call
sites double-append (concat-then-update, :507-516 — SURVEY.md §2.13.8).  The
TPU version is a correct-by-construction pytree with one append per step:

  * pre-allocated [num_layers, B, max_seq_len, kv_heads, head_dim] buffers
  * a scalar ``length`` index; writes via lax.dynamic_update_slice
  * pure-functional updates (callers donate the cache under jit so XLA
    performs the update in place — no copy)

This is the train/prefill/decode cache; the paged decode cache used by the
decode attention kernel lives in vats_tpu/ops/decode_attention.py.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class KVCache:
    k: jnp.ndarray  # [L, B, S, G, hd]
    v: jnp.ndarray  # [L, B, S, G, hd]
    length: jnp.ndarray  # int32 scalar: number of valid positions

    @classmethod
    def create(
        cls,
        num_layers: int,
        batch_size: int,
        max_seq_len: int,
        kv_heads: int,
        head_dim: int,
        dtype: Any = jnp.bfloat16,
    ) -> "KVCache":
        shape = (num_layers, batch_size, max_seq_len, kv_heads, head_dim)
        return cls(
            k=jnp.zeros(shape, dtype=dtype),
            v=jnp.zeros(shape, dtype=dtype),
            length=jnp.zeros((), dtype=jnp.int32),
        )

    @property
    def max_seq_len(self) -> int:
        return self.k.shape[2]

    def update_layer(
        self, layer_idx: int, k_new: jnp.ndarray, v_new: jnp.ndarray
    ) -> "KVCache":
        """Write [B, T, G, hd] new keys/values at offset ``length`` for one layer.

        Does NOT advance ``length`` — call :meth:`advance` once after all
        layers have written (each layer writes at the same offset).
        """
        start = (layer_idx, 0, self.length, 0, 0)
        k = jax.lax.dynamic_update_slice(
            self.k, k_new[None].astype(self.k.dtype), start
        )
        v = jax.lax.dynamic_update_slice(
            self.v, v_new[None].astype(self.v.dtype), start
        )
        return self.replace(k=k, v=v)

    def advance(self, num_tokens: int) -> "KVCache":
        return self.replace(length=self.length + jnp.int32(num_tokens))

    def layer(self, layer_idx: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Full-buffer K/V views for a layer: ([B, S, G, hd], [B, S, G, hd])."""
        return self.k[layer_idx], self.v[layer_idx]

    def valid_mask(self, batch_size: int, extra: int = 0) -> jnp.ndarray:
        """[B, S] bool: True where a cache slot holds a valid (written) entry,
        counting ``extra`` tokens being appended this step."""
        s = self.max_seq_len
        pos = jnp.arange(s)[None, :]
        return jnp.broadcast_to(pos < self.length + extra, (batch_size, s))

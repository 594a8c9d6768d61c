"""Static-shape functional KV cache (sequence-minor layout).

The reference's KVCache (/root/reference/src/optimized_attention.py:169-287)
is a python object holding per-layer dicts, appended to eagerly; its call
sites double-append (concat-then-update, :507-516 — SURVEY.md §2.13.8).  The
TPU version is a correct-by-construction pytree with one append per step:

  * pre-allocated [num_layers, B, kv_heads, head_dim, max_seq_len] buffers.
    The SEQUENCE axis is minor: TPU tiles the last two dims to (8, 128), so
    a head_dim-minor cache pads head_dim to 128 lanes — a 2.13x HBM size and
    read tax at the reference tiers' head_dim 60 (measured ~2 ms/step at the
    4.19B bench tier).  Sequence-minor puts the 128-granule on max_seq_len
    (naturally large) and the 8-granule on head_dim (60 -> 64, ~7%).
  * a scalar ``length`` index; writes via lax.dynamic_update_slice
  * pure-functional updates (callers donate the cache under jit so XLA
    performs the update in place — no copy)

Consumers read the native layout via :meth:`layer_t` and attend with
``ops.attention_xla.cached_decode_attention``; :meth:`layer` returns the
classic [B, S, G, hd] view (pays a transpose — fine for the small
frame-level caches of the video stack).

This is the train/prefill/decode cache; the paged decode cache used by the
decode attention kernel lives in vats_tpu/ops/decode_attention.py.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import struct


def _pad_head_dim(head_dim: int) -> int:
    """Stored head dim: padded to the 8-sublane granule (60 -> 64).

    XLA's tiled layout pads the second-minor dim to 8 physically anyway, so
    the explicit pad costs no extra HBM — but it makes the in-place Pallas
    append's per-tile DMA slices legal (Mosaic requires 8-aligned sublane
    slice shapes; see ops/cache_append.py)."""
    return -(-head_dim // 8) * 8


@struct.dataclass
class KVCache:
    k: jnp.ndarray  # [L, B, G, hd_pad, S]
    v: jnp.ndarray  # [L, B, G, hd_pad, S]
    length: jnp.ndarray  # int32 scalar: number of valid positions
    head_dim: int = struct.field(pytree_node=False, default=0)  # logical hd

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
        shape = (
            num_layers, batch_size, kv_heads, _pad_head_dim(head_dim),
            max_seq_len,
        )
        return cls(
            k=jnp.zeros(shape, dtype=dtype),
            v=jnp.zeros(shape, dtype=dtype),
            length=jnp.zeros((), dtype=jnp.int32),
            head_dim=head_dim,
        )

    @property
    def max_seq_len(self) -> int:
        return self.k.shape[-1]

    def update_layer(
        self, layer_idx: int, k_new: jnp.ndarray, v_new: jnp.ndarray
    ) -> "KVCache":
        """Write [B, T, G, hd] new keys/values at offset ``length`` for one layer.

        Does NOT advance ``length`` — call :meth:`advance` once after all
        layers have written (each layer writes at the same offset).

        T == 1 (decode) goes through a Pallas in-place tile write on TPU: a
        dynamic_update_slice at a dynamic LANE offset double-buffers the
        whole cache in the decode loop (ops/cache_append.py docstring has
        the measurements).  Prefill (T > 1) writes once per call, where the
        one-time DUS copy is acceptable.
        """
        k_new = self._pad_kv(k_new)
        v_new = self._pad_kv(v_new)
        if k_new.shape[1] == 1 and self.max_seq_len % 128 == 0:
            from vats_tpu.ops import cache_append

            if cache_append.supported():
                k, v = cache_append.append_token_inplace(
                    self.k, self.v, layer_idx,
                    k_new[:, 0].astype(self.k.dtype),
                    v_new[:, 0].astype(self.v.dtype),
                    self.length,
                )
                return self.replace(k=k, v=v)
        k_t = jnp.transpose(k_new, (0, 2, 3, 1))[None]  # [1, B, G, hd, T]
        v_t = jnp.transpose(v_new, (0, 2, 3, 1))[None]
        start = (layer_idx, 0, 0, 0, self.length)
        k = jax.lax.dynamic_update_slice(self.k, k_t.astype(self.k.dtype), start)
        v = jax.lax.dynamic_update_slice(self.v, v_t.astype(self.v.dtype), start)
        return self.replace(k=k, v=v)

    def _pad_kv(self, x: jnp.ndarray) -> jnp.ndarray:
        """Zero-pad [..., hd] to the stored 8-granule head dim."""
        hd_pad = self.k.shape[3]
        if x.shape[-1] == hd_pad:
            return x
        return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, hd_pad - x.shape[-1])])

    def advance(self, num_tokens: int) -> "KVCache":
        return self.replace(length=self.length + jnp.int32(num_tokens))

    def layer_t(self, layer_idx: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Native full-buffer views for a layer: ([B, G, hd_pad, S], same).

        hd_pad may exceed the logical head_dim (8-granule pad); the pad rows
        are zero — consumers pad q to match (zero rows contribute nothing to
        q.k) and slice the output back to head_dim."""
        return self.k[layer_idx], self.v[layer_idx]

    def layer(self, layer_idx: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Classic [B, S, G, hd] views (transposed copy; prefer layer_t)."""
        k, v = self.layer_t(layer_idx)
        hd = self.head_dim or k.shape[2]
        k = jnp.transpose(k, (0, 3, 1, 2))[..., :hd]
        v = jnp.transpose(v, (0, 3, 1, 2))[..., :hd]
        return k, v

    def valid_mask(self, batch_size: int, extra: int = 0) -> jnp.ndarray:
        """[B, S] bool: True where a cache slot holds a valid (written) entry,
        counting ``extra`` tokens being appended this step."""
        s = self.max_seq_len
        pos = jnp.arange(s)[None, :]
        return jnp.broadcast_to(pos < self.length + extra, (batch_size, s))

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


def ring_slots_for_window(left_window: int, min_extra: int = 1) -> int:
    """Buffer slots for a sliding-window ring cache: the window plus the
    current token, rounded up to the 128-lane tile (the Pallas in-place
    append addresses whole sequence tiles)."""
    return -(-(left_window + min_extra) // 128) * 128


@struct.dataclass
class KVCache:
    k: jnp.ndarray  # [L, B, G, hd_pad, S]
    v: jnp.ndarray  # [L, B, G, hd_pad, S]
    length: jnp.ndarray  # int32 scalar: number of valid positions
    head_dim: int = struct.field(pytree_node=False, default=0)  # logical hd
    # Sliding-window ring mode: the buffer holds only the most recent S
    # positions; slot = absolute_position % S.  Decode at 32k context then
    # costs the same HBM as decode at S — the TPU-native answer to the
    # reference xlarge tier's max_seq_len=32768 + left_window<=1024 SWA
    # (/root/reference/configs/transformers/nlp/model_args/model_args_xlarge.py).
    ring: bool = struct.field(pytree_node=False, default=False)

    @classmethod
    def create(
        cls,
        num_layers: int,
        batch_size: int,
        max_seq_len: int,
        kv_heads: int,
        head_dim: int,
        dtype: Any = jnp.bfloat16,
        ring: bool = False,
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
            ring=ring,
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
        s = self.max_seq_len
        write_pos = self.length % s if self.ring else self.length
        if k_new.shape[1] == 1 and s % 128 == 0:
            from vats_tpu.ops import cache_append

            if cache_append.supported():
                k, v = cache_append.append_token_inplace(
                    self.k, self.v, layer_idx,
                    k_new[:, 0].astype(self.k.dtype),
                    v_new[:, 0].astype(self.v.dtype),
                    write_pos,
                )
                return self.replace(k=k, v=v)
        if self.ring and k_new.shape[1] > 1:
            # prefill into the ring: only the most recent S positions can
            # survive; write them at their modulo slots (unique since <= S)
            t = k_new.shape[1]
            keep = min(t, s)
            pos0 = self.length + (t - keep)
            slots = (pos0 + jnp.arange(keep)) % s  # [keep], unique
            # advanced index between slices -> the indexed axis leads: the
            # update operand is [keep, B, G, hd]
            k_t = jnp.transpose(k_new[:, -keep:], (1, 0, 2, 3))
            v_t = jnp.transpose(v_new[:, -keep:], (1, 0, 2, 3))
            k = self.k.at[layer_idx, :, :, :, slots].set(k_t.astype(self.k.dtype))
            v = self.v.at[layer_idx, :, :, :, slots].set(v_t.astype(self.v.dtype))
            return self.replace(k=k, v=v)
        k_t = jnp.transpose(k_new, (0, 2, 3, 1))[None]  # [1, B, G, hd, T]
        v_t = jnp.transpose(v_new, (0, 2, 3, 1))[None]
        start = (layer_idx, 0, 0, 0, write_pos)
        k = jax.lax.dynamic_update_slice(self.k, k_t.astype(self.k.dtype), start)
        v = jax.lax.dynamic_update_slice(self.v, v_t.astype(self.v.dtype), start)
        return self.replace(k=k, v=v)

    def slot_positions(self, extra: int = 0) -> jnp.ndarray:
        """[S] int32: absolute position held by each ring slot, counting
        ``extra`` tokens appended this step; -ve for never-written slots.

        Slot s holds the largest position p with p % S == s and
        p < length + extra (each append overwrites its residue class)."""
        s = self.max_seq_len
        total = self.length + extra
        slot = jnp.arange(s, dtype=jnp.int32)
        return slot + ((total - 1 - slot) // s) * s

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

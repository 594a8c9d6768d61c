"""In-place single-token append into the dense sequence-minor KV cache.

Why this exists: the dense :class:`vats_tpu.nn.kv_cache.KVCache` stores
``[L, B, G, hd, S]`` with the sequence on the LANE axis (tile-pad reasons —
see its docstring).  Appending one decode token is then a
``dynamic_update_slice`` at a *dynamic lane offset*, which XLA cannot do in
place: it double-buffers the whole cache in the decode loop (measured: the
compiled fori_loop's temp allocation equals the full k+v cache bytes, and at
the 4.19B tier the per-step cost cliffs 37x at ctx>=1024 when the copy
pushes peak HBM near capacity — tools/probe_ctx_memory.py).

This Pallas kernel touches ONLY the 128-lane sequence tile containing the
write position.  The tile is addressed through the BlockSpec ``index_map``
reading the scalar-prefetched (layer, tile) indices — Mosaic DMAs
tile-aligned blocks at dynamic *block* indices natively (dynamic minor-dim
memref slicing inside the kernel is not supported).  The new token's column
is inserted in VMEM staged in fp32 (Mosaic only supports non-no-op minor-dim
dynamic insertion for 32-bit types — same constraint as the paged commit
kernel in ops/decode_attention.py) and the tile is written back through
``input_output_aliases``, so under jit the update is genuinely in place:
~64 KiB of traffic per (layer, row) instead of a whole-cache copy.

The reference's cache append is an eager python concat
(/root/reference/src/optimized_attention.py:224-257, which double-appends —
SURVEY.md 2.13.8); this is its TPU-native decode-path replacement.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

_TILE = 128


def _append_kernel(idx_ref, kv_new_ref, k_ref, v_ref, k_out_ref, v_out_ref):
    off = idx_ref[2]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 1, _TILE), 4)
    new = kv_new_ref[0].astype(jnp.float32)  # [2, G, hd_pad]
    k_out_ref[...] = jnp.where(
        lane == off, new[0][None, None, :, :, None],
        k_ref[...].astype(jnp.float32),
    ).astype(k_out_ref.dtype)
    v_out_ref[...] = jnp.where(
        lane == off, new[1][None, None, :, :, None],
        v_ref[...].astype(jnp.float32),
    ).astype(v_out_ref.dtype)


def append_token_inplace(
    k: jnp.ndarray,
    v: jnp.ndarray,
    layer_idx,
    k_new: jnp.ndarray,
    v_new: jnp.ndarray,
    length: jnp.ndarray,
    *,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Write one token's K/V at lane position ``length`` for one layer.

    k, v: [L, B, G, hd_pad, S] with hd_pad 8-aligned (returned
    aliased/updated in place under jit); k_new, v_new: [B, G, hd_pad];
    length: int32 scalar (clamped to S-1 at capacity, matching
    dynamic_update_slice semantics for a T=1 write).
    """
    l, b, g, hd_pad, s = k.shape
    assert s % _TILE == 0, f"max_seq_len {s} must be a multiple of {_TILE}"
    assert hd_pad % 8 == 0, f"stored head_dim {hd_pad} must be 8-aligned"
    pos = jnp.minimum(length.astype(jnp.int32), s - 1)
    idx = jnp.stack(
        [jnp.asarray(layer_idx, jnp.int32), pos // _TILE, pos % _TILE]
    )
    kv_new = jnp.stack(
        [k_new.astype(k.dtype), v_new.astype(v.dtype)], axis=1
    )  # [B, 2, G, hd_pad]

    tile_spec = pl.BlockSpec(
        (1, 1, g, hd_pad, _TILE),
        lambda i, idx_ref: (idx_ref[0], i, 0, 0, idx_ref[1]),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 2, g, hd_pad), lambda i, idx_ref: (i, 0, 0, 0)),
            tile_spec,
            tile_spec,
        ],
        out_specs=[tile_spec, tile_spec],
    )
    # aliasing indices count the scalar-prefetch operand:
    # inputs are (idx, kv_new, k, v) -> k is 2, v is 3
    return pl.pallas_call(
        _append_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ],
        input_output_aliases={2: 0, 3: 1},
        interpret=interpret,
    )(idx, kv_new, k, v)


def supported() -> bool:
    """True when the Pallas TPU path is available on the default backend."""
    if not _HAS_PLTPU:
        return False
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:  # pragma: no cover
        return False

"""In-place Pallas dense-cache append: parity vs the XLA scatter path.

The kernel (ops/cache_append.py) is what keeps the decode loop from
double-buffering the whole KV cache (the ctx>=1024 cliff — see the module
docstring).  On CPU it runs in interpret mode; the TPU path is exercised by
the bench/probes and shares the same kernel body.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vats_tpu.nn.kv_cache import KVCache, _pad_head_dim
from vats_tpu.ops.cache_append import append_token_inplace


@pytest.mark.parametrize("pos", [0, 1, 127, 128, 200, 255])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_append_matches_scatter(pos, dtype):
    rng = np.random.RandomState(pos)
    l, b, g, hd, s = 2, 3, 2, 64, 256
    k = jnp.asarray(rng.randn(l, b, g, hd, s), dtype)
    v = jnp.asarray(rng.randn(l, b, g, hd, s), dtype)
    kn = jnp.asarray(rng.randn(b, g, hd), dtype)
    vn = jnp.asarray(rng.randn(b, g, hd), dtype)
    length = jnp.asarray(pos, jnp.int32)

    k2, v2 = append_token_inplace(k, v, 1, kn, vn, length, interpret=True)

    ref_k = np.asarray(k).copy()
    ref_v = np.asarray(v).copy()
    ref_k[1, :, :, :, pos] = np.asarray(kn)
    ref_v[1, :, :, :, pos] = np.asarray(vn)
    np.testing.assert_array_equal(np.asarray(k2), ref_k)
    np.testing.assert_array_equal(np.asarray(v2), ref_v)


def test_append_clamps_at_capacity():
    """A write at/past max_seq_len lands in the last slot (DUS semantics)."""
    l, b, g, hd, s = 1, 2, 1, 8, 128
    k = jnp.zeros((l, b, g, hd, s), jnp.float32)
    v = jnp.zeros_like(k)
    kn = jnp.ones((b, g, hd), jnp.float32)
    k2, _ = append_token_inplace(
        k, v, 0, kn, kn, jnp.asarray(s + 5, jnp.int32), interpret=True
    )
    assert np.asarray(k2)[0, :, :, :, -1].min() == 1.0
    assert np.abs(np.asarray(k2)[0, :, :, :, :-1]).max() == 0.0


def test_kv_cache_stores_padded_head_dim():
    """head_dim 60 stores as 64 (8-granule); layer() slices the pad off and
    the logical contents round-trip through update_layer."""
    assert _pad_head_dim(60) == 64
    assert _pad_head_dim(64) == 64
    cache = KVCache.create(2, 2, 256, 3, 60, dtype=jnp.float32)
    assert cache.k.shape == (2, 2, 3, 64, 256)
    assert cache.head_dim == 60

    rng = np.random.RandomState(0)
    kn = jnp.asarray(rng.randn(2, 4, 3, 60), jnp.float32)  # [B, T=4, G, hd]
    vn = jnp.asarray(rng.randn(2, 4, 3, 60), jnp.float32)
    cache = cache.update_layer(1, kn, vn).advance(4)
    k_l, v_l = cache.layer(1)
    assert k_l.shape == (2, 256, 3, 60)
    np.testing.assert_allclose(
        np.asarray(k_l[:, :4]), np.asarray(kn), rtol=0, atol=0
    )
    # pad rows stay zero
    k_t, _ = cache.layer_t(1)
    assert np.abs(np.asarray(k_t[:, :, 60:, :])).max() == 0.0

"""Paged KV cache + decode attention kernel tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vats_tpu.ops.attention_xla import dot_product_attention
from vats_tpu.ops.decode_attention import (
    PagedKVCache,
    paged_decode_attention,
    paged_decode_attention_xla,
)


def fill_cache(cache, layer, ks, vs, lengths):
    """Append every position, then clamp lengths (extra slots are masked)."""
    for t in range(ks.shape[1]):
        cache = cache.append_token(layer, ks[:, t], vs[:, t]).advance()
    return cache.replace(lengths=jnp.asarray(lengths, jnp.int32))


def test_paged_cache_append_and_layout():
    b, g, hd, ps = 2, 2, 8, 4
    cache = PagedKVCache.create(
        1, b, 16, g, hd, page_size=ps, dtype=jnp.float32
    )
    k0 = jnp.ones((b, g, hd))
    cache = cache.append_token(0, k0, 2 * k0).advance()
    k1 = 3 * jnp.ones((b, g, hd))
    cache = cache.append_token(0, k1, 4 * k1).advance()
    assert int(cache.lengths[0]) == 2
    # pool's physical head dim is 128-lane padded; logical slice is [:hd]
    assert cache.k_pages.shape[-1] == 128 and cache.head_dim == hd
    # layout [L, P, G, ps, hd_phys]; sequence 0 owns page 0, tokens at
    # offsets 0,1
    np.testing.assert_allclose(np.asarray(cache.k_pages[0, 0, 0, 0, :hd]), 1.0)
    np.testing.assert_allclose(np.asarray(cache.k_pages[0, 0, 0, 0, hd:]), 0.0)
    np.testing.assert_allclose(np.asarray(cache.k_pages[0, 0, 0, 1, :hd]), 3.0)
    # sequence 1 owns page 4 (pages_per_seq = 4)
    np.testing.assert_allclose(np.asarray(cache.k_pages[0, 4, 0, 1, :hd]), 3.0)


@pytest.mark.parametrize("lengths", [[16, 16], [13, 5], [1, 9]])
def test_xla_paged_decode_matches_dense(lengths):
    b, hq, g, hd, s, ps = 2, 4, 2, 16, 16, 4
    rng = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(rng, 3)
    q1 = jax.random.normal(kq, (b, hq, hd))
    ks = jax.random.normal(kk, (b, s, g, hd))
    vs = jax.random.normal(kv, (b, s, g, hd))
    lengths = jnp.asarray(lengths, jnp.int32)

    cache = PagedKVCache.create(1, b, s, g, hd, page_size=ps, dtype=jnp.float32)
    cache = fill_cache(cache, 0, ks, vs, lengths)

    out = paged_decode_attention_xla(
        q1, cache.k_pages[0], cache.v_pages[0], cache.page_table,
        cache.lengths, scale=0.25,
    )
    # dense oracle: last-token query against per-sequence valid prefix
    valid = jnp.arange(s)[None, :] < lengths[:, None]
    ref = dot_product_attention(
        q1[:, None], ks, vs, scale=0.25, causal=False, kv_valid=valid
    )[:, 0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4,
                               atol=2e-5)


@pytest.mark.parametrize("lengths", [[16, 16], [13, 5]])
def test_pallas_paged_decode_matches_xla(lengths):
    b, hq, g, hd, s, ps = 2, 4, 2, 16, 16, 8
    rng = jax.random.PRNGKey(1)
    kq, kk, kv = jax.random.split(rng, 3)
    q1 = jax.random.normal(kq, (b, hq, hd))
    ks = jax.random.normal(kk, (b, s, g, hd))
    vs = jax.random.normal(kv, (b, s, g, hd))
    lengths = jnp.asarray(lengths, jnp.int32)

    cache = PagedKVCache.create(1, b, s, g, hd, page_size=ps, dtype=jnp.float32)
    cache = fill_cache(cache, 0, ks, vs, lengths)

    out_pallas = paged_decode_attention(
        q1, cache.k_pages[0], cache.v_pages[0], cache.page_table,
        cache.lengths, scale=0.25, interpret=True,
    )
    out_xla = paged_decode_attention_xla(
        q1, cache.k_pages[0], cache.v_pages[0], cache.page_table,
        cache.lengths, scale=0.25,
    )
    np.testing.assert_allclose(
        np.asarray(out_pallas), np.asarray(out_xla), rtol=2e-4, atol=2e-5
    )


def test_page_table_indirection():
    """Permuting physical pages (with the table updated) must not change
    the attention output — the defining property of paged storage."""
    b, hq, g, hd, s, ps = 1, 2, 1, 8, 8, 4
    rng = jax.random.PRNGKey(2)
    q1 = jax.random.normal(rng, (b, hq, hd))
    ks = jax.random.normal(jax.random.PRNGKey(3), (b, s, g, hd))
    vs = jax.random.normal(jax.random.PRNGKey(4), (b, s, g, hd))
    lengths = jnp.asarray([8], jnp.int32)

    cache = PagedKVCache.create(1, b, s, g, hd, page_size=ps, dtype=jnp.float32)
    cache = fill_cache(cache, 0, ks, vs, lengths)
    out1 = paged_decode_attention_xla(
        q1, cache.k_pages[0], cache.v_pages[0], cache.page_table,
        cache.lengths, scale=0.3,
    )
    # swap the two physical pages and the table entries
    perm = jnp.asarray([1, 0])
    k_sw = cache.k_pages[0][:, perm]
    v_sw = cache.v_pages[0][:, perm]
    table_sw = jnp.asarray([[1, 0]], jnp.int32)
    out2 = paged_decode_attention_xla(
        q1, k_sw, v_sw, table_sw, cache.lengths, scale=0.3
    )
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=1e-5)

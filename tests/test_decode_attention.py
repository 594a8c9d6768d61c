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

PS = 128  # pages are lane tiles: page_size must be a multiple of 128


def fill_cache(cache, layer, ks, vs, lengths):
    """Prefill every position, then clamp lengths (extra slots are masked)."""
    cache = cache.append_tokens(layer, ks, vs)
    return cache.replace(lengths=jnp.asarray(lengths, jnp.int32))


def test_paged_cache_append_and_layout():
    b, g, hd = 2, 2, 12  # hd 12 pads to 16 sublanes in the stored pool
    cache = PagedKVCache.create(
        1, b, 2 * PS, g, hd, page_size=PS, dtype=jnp.float32
    )
    k0 = jnp.ones((b, g, hd))
    cache = cache.append_token(0, k0, 2 * k0).advance()
    k1 = 3 * jnp.ones((b, g, hd))
    cache = cache.append_token(0, k1, 4 * k1).advance()
    assert int(cache.lengths[0]) == 2
    # sequence-minor pages [L, P, G, hd_pad, ps]: head dim pads only to the
    # 8-sublane granule, tokens live on the lane axis
    assert cache.k_pages.shape[-2:] == (16, PS) and cache.head_dim == hd
    np.testing.assert_allclose(np.asarray(cache.k_pages[0, 0, 0, :hd, 0]), 1.0)
    np.testing.assert_allclose(np.asarray(cache.k_pages[0, 0, 0, hd:, 0]), 0.0)
    np.testing.assert_allclose(np.asarray(cache.k_pages[0, 0, 0, :hd, 1]), 3.0)
    # sequence 1 owns page 2 (pages_per_seq = 2)
    np.testing.assert_allclose(np.asarray(cache.k_pages[0, 2, 0, :hd, 1]), 3.0)


def test_page_size_must_be_lane_multiple():
    with pytest.raises(ValueError):
        PagedKVCache.create(1, 1, 256, 2, 8, page_size=32)


@pytest.mark.parametrize("lengths", [[256, 256], [130, 5], [1, 129]])
def test_xla_paged_decode_matches_dense(lengths):
    b, hq, g, hd, s = 2, 4, 2, 16, 2 * PS
    rng = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(rng, 3)
    q1 = jax.random.normal(kq, (b, hq, hd))
    ks = jax.random.normal(kk, (b, s, g, hd))
    vs = jax.random.normal(kv, (b, s, g, hd))
    lengths = jnp.asarray(lengths, jnp.int32)

    cache = PagedKVCache.create(1, b, s, g, hd, page_size=PS, dtype=jnp.float32)
    cache = fill_cache(cache, 0, ks, vs, lengths)

    out = paged_decode_attention_xla(
        q1, cache.kv_pages[0], cache.page_table,
        cache.lengths, scale=0.25,
    )
    # dense oracle: last-token query against per-sequence valid prefix
    valid = jnp.arange(s)[None, :] < lengths[:, None]
    ref = dot_product_attention(
        q1[:, None], ks, vs, scale=0.25, causal=False, kv_valid=valid
    )[:, 0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4,
                               atol=2e-5)


@pytest.mark.parametrize("lengths", [[256, 256], [130, 5]])
def test_pallas_paged_decode_matches_xla(lengths):
    b, hq, g, hd, s = 2, 4, 2, 12, 2 * PS  # hd 12: stored pad exercised
    rng = jax.random.PRNGKey(1)
    kq, kk, kv = jax.random.split(rng, 3)
    q1 = jax.random.normal(kq, (b, hq, hd))
    ks = jax.random.normal(kk, (b, s, g, hd))
    vs = jax.random.normal(kv, (b, s, g, hd))
    lengths = jnp.asarray(lengths, jnp.int32)

    cache = PagedKVCache.create(1, b, s, g, hd, page_size=PS, dtype=jnp.float32)
    cache = fill_cache(cache, 0, ks, vs, lengths)

    out_pallas = paged_decode_attention(
        q1, cache.kv_pages[0], cache.page_table,
        cache.lengths, scale=0.25, interpret=True,
    )
    out_xla = paged_decode_attention_xla(
        q1, cache.kv_pages[0], cache.page_table,
        cache.lengths, scale=0.25,
    )
    np.testing.assert_allclose(
        np.asarray(out_pallas), np.asarray(out_xla), rtol=2e-4, atol=2e-5
    )


def test_gather_dense_roundtrip():
    b, g, hd, s = 2, 2, 12, 2 * PS
    ks = jax.random.normal(jax.random.PRNGKey(5), (b, s, g, hd))
    vs = jax.random.normal(jax.random.PRNGKey(6), (b, s, g, hd))
    cache = PagedKVCache.create(1, b, s, g, hd, page_size=PS, dtype=jnp.float32)
    cache = fill_cache(cache, 0, ks, vs, [s, s])
    k_back, v_back = cache.gather_dense(0)
    np.testing.assert_allclose(np.asarray(k_back), np.asarray(ks), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(v_back), np.asarray(vs), rtol=1e-6)
    k_t, _ = cache.gather_dense_t(0)
    assert k_t.shape == (b, g, 16, s)  # native [B, G, hd_pad, S]


def test_page_table_indirection():
    """Permuting physical pages (with the table updated) must not change the
    attention output — and attending through a STALE table must, proving the
    indirection is actually exercised (lengths < max so masking breaks the
    permutation-invariance of full unmasked attention)."""
    b, hq, g, hd, s = 1, 2, 1, 8, 2 * PS
    rng = jax.random.PRNGKey(2)
    q1 = jax.random.normal(rng, (b, hq, hd))
    ks = jax.random.normal(jax.random.PRNGKey(3), (b, s, g, hd))
    vs = jax.random.normal(jax.random.PRNGKey(4), (b, s, g, hd))
    lengths = jnp.asarray([s - 60], jnp.int32)

    cache = PagedKVCache.create(1, b, s, g, hd, page_size=PS, dtype=jnp.float32)
    cache = fill_cache(cache, 0, ks, vs, lengths)
    out1 = paged_decode_attention_xla(
        q1, cache.kv_pages[0], cache.page_table,
        cache.lengths, scale=0.3,
    )
    # swap the two physical pages (axis 0 of the per-layer pool) + the table
    perm = jnp.asarray([1, 0])
    kv_sw = cache.kv_pages[0][perm]
    table_sw = jnp.asarray([[1, 0]], jnp.int32)
    out2 = paged_decode_attention_xla(
        q1, kv_sw, table_sw, cache.lengths, scale=0.3
    )
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=1e-5)
    # stale table (identity) over the permuted pool => wrong logical order
    out_bad = paged_decode_attention_xla(
        q1, kv_sw, cache.page_table, cache.lengths, scale=0.3
    )
    assert float(jnp.max(jnp.abs(out_bad - out1))) > 1e-3


@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_current_token_column(impl):
    """k_cur/v_cur as an extra always-valid column == appending then
    attending (the fused attend+commit decode contract)."""
    b, hq, g, hd, s = 2, 4, 2, 12, 2 * PS
    rng = jax.random.PRNGKey(9)
    kq, kk, kv, kc = jax.random.split(rng, 4)
    q1 = jax.random.normal(kq, (b, hq, hd))
    ks = jax.random.normal(kk, (b, s, g, hd))
    vs = jax.random.normal(kv, (b, s, g, hd))
    k_cur = jax.random.normal(kc, (b, g, hd))
    v_cur = 2.0 * k_cur
    lengths = jnp.asarray([130, 5], jnp.int32)

    cache = PagedKVCache.create(1, b, s, g, hd, page_size=PS, dtype=jnp.float32)
    cache = fill_cache(cache, 0, ks, vs, lengths)
    if impl == "xla":
        out_cur = paged_decode_attention_xla(
            q1, cache.kv_pages[0], cache.page_table, cache.lengths,
            scale=0.25, k_cur=k_cur, v_cur=v_cur,
        )
    else:
        out_cur = paged_decode_attention(
            q1, cache.kv_pages[0], cache.page_table, cache.lengths,
            scale=0.25, k_cur=k_cur, v_cur=v_cur, interpret=True,
        )
    # oracle: commit the token through the XLA scatter, attend the pool
    committed = cache.append_token(0, k_cur, v_cur).advance()
    out_ref = paged_decode_attention_xla(
        q1, committed.kv_pages[0], committed.page_table, committed.lengths,
        scale=0.25,
    )
    np.testing.assert_allclose(
        np.asarray(out_cur), np.asarray(out_ref), rtol=2e-4, atol=2e-5
    )


@pytest.mark.parametrize("lengths", [[130, 5], [0, 1], [255, 256], [0, 0]])
def test_commit_kernel_matches_scatter_append(lengths):
    """The fused attend+commit kernel must (a) return the same attention
    output as the deferred-column oracle and (b) leave the pool byte-equal
    to the XLA scatter append — including opening a fresh page (offset 0)
    and the at-capacity clamp."""
    from vats_tpu.ops.decode_attention import paged_decode_attention_commit

    b, hq, g, hd, s, n_layers = 2, 4, 2, 12, 2 * PS, 2
    rng = jax.random.PRNGKey(11)
    kq, kk, kv, kc = jax.random.split(rng, 4)
    q1 = jax.random.normal(kq, (b, hq, hd))
    ks = jax.random.normal(kk, (b, s, g, hd))
    vs = jax.random.normal(kv, (b, s, g, hd))
    k_cur = jax.random.normal(kc, (b, g, hd))
    v_cur = -3.0 * k_cur
    layer = 1

    cache = PagedKVCache.create(
        n_layers, b, s, g, hd, page_size=PS, dtype=jnp.float32
    )
    if max(lengths) > 0:
        cache = fill_cache(cache, layer, ks, vs, lengths)
    else:
        # all-empty batch: the commit rides the never-streamed fresh-page
        # path (the kernel writes cur into an empty page)
        cache = cache.replace(lengths=jnp.asarray(lengths, jnp.int32))

    out, new_pool = paged_decode_attention_commit(
        q1, cache.kv_pages, layer, cache.page_table, cache.lengths,
        scale=0.25, k_cur=k_cur, v_cur=v_cur, interpret=True,
    )
    out_ref = paged_decode_attention_xla(
        q1, cache.kv_pages[layer], cache.page_table, cache.lengths,
        scale=0.25, k_cur=k_cur, v_cur=v_cur,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(out_ref), rtol=2e-4, atol=2e-5
    )
    ref_pool = cache.append_token(layer, k_cur, v_cur).kv_pages
    np.testing.assert_array_equal(np.asarray(new_pool), np.asarray(ref_pool))

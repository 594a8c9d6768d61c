"""Ring attention vs the single-device oracle on the fake 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vats_tpu.ops import dot_product_attention
from vats_tpu.ops.ring_attention import ring_attention
from vats_tpu.parallel import create_mesh


def make_qkv(seed, b, t, hq, g, d):
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(seed), 3)
    return (
        jax.random.normal(kq, (b, t, hq, d), jnp.float32),
        jax.random.normal(kk, (b, t, g, d), jnp.float32),
        jax.random.normal(kv, (b, t, g, d), jnp.float32),
    )


@pytest.mark.parametrize(
    "seq_shards,causal,left_window,hq,g",
    [
        (4, True, -1, 4, 2),
        (4, False, -1, 4, 4),
        (8, True, -1, 2, 1),
        (4, True, 10, 4, 2),  # causal + SWA across shard boundaries
    ],
)
def test_ring_matches_oracle(seq_shards, causal, left_window, hq, g):
    mesh = create_mesh(data=1, fsdp=1, expert=1, tensor=1, seq=seq_shards,
                       devices=jax.devices()[:seq_shards])
    b, t, d = 2, 32, 16
    q, k, v = make_qkv(0, b, t, hq, g, d)
    scale = 1.0 / np.sqrt(d)
    out_ring = ring_attention(
        q, k, v, mesh=mesh, scale=scale, causal=causal,
        left_window=left_window,
    )
    out_ref = dot_product_attention(
        q, k, v, scale=scale, causal=causal, left_window=left_window,
    )
    np.testing.assert_allclose(
        np.asarray(out_ring), np.asarray(out_ref), rtol=2e-4, atol=2e-5
    )


def test_ring_with_batch_sharding():
    mesh = create_mesh(data=2, fsdp=1, expert=1, tensor=1, seq=4)
    b, t, hq, g, d = 4, 32, 4, 2, 16
    q, k, v = make_qkv(1, b, t, hq, g, d)
    out_ring = ring_attention(q, k, v, mesh=mesh, scale=0.25, causal=True)
    out_ref = dot_product_attention(q, k, v, scale=0.25, causal=True)
    np.testing.assert_allclose(
        np.asarray(out_ring), np.asarray(out_ref), rtol=2e-4, atol=2e-5
    )


def test_ulysses_matches_oracle():
    from vats_tpu.ops.ulysses import ulysses_attention

    mesh = create_mesh(data=1, fsdp=1, expert=1, tensor=1, seq=4,
                       devices=jax.devices()[:4])
    b, t, hq, g, d = 2, 32, 8, 4, 16
    q, k, v = make_qkv(5, b, t, hq, g, d)
    out_u = ulysses_attention(
        q, k, v, mesh=mesh, scale=0.25, causal=True, left_window=10,
    )
    out_ref = dot_product_attention(
        q, k, v, scale=0.25, causal=True, left_window=10,
    )
    np.testing.assert_allclose(
        np.asarray(out_u), np.asarray(out_ref), rtol=2e-4, atol=2e-5
    )


def test_ulysses_rejects_indivisible_heads():
    from vats_tpu.ops.ulysses import ulysses_attention

    mesh = create_mesh(data=1, fsdp=1, expert=1, tensor=1, seq=4,
                       devices=jax.devices()[:4])
    q, k, v = make_qkv(6, 1, 16, 2, 1, 8)
    with pytest.raises(ValueError):
        ulysses_attention(q, k, v, mesh=mesh, scale=0.3)

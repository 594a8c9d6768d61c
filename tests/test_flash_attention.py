"""Pallas flash attention vs the XLA oracle (interpret mode on CPU).

The kernel's numerics contract: match ops.attention_xla.dot_product_attention
within fp32 tolerance for every mask configuration (causal, SWA, GQA/MQA,
padding)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vats_tpu.ops import dot_product_attention
from vats_tpu.ops.flash_attention import flash_attention

flash = functools.partial(flash_attention, interpret=True, block_q=16, block_k=16)


def make_qkv(key, b, t, s, hq, g, d):
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(key), 3)
    q = jax.random.normal(kq, (b, t, hq, d), dtype=jnp.float32)
    k = jax.random.normal(kk, (b, s, g, d), dtype=jnp.float32)
    v = jax.random.normal(kv, (b, s, g, d), dtype=jnp.float32)
    return q, k, v


@pytest.mark.parametrize(
    "causal,left_window,hq,g",
    [
        (False, -1, 4, 4),
        (True, -1, 4, 4),
        (True, -1, 8, 2),   # GQA
        (True, -1, 4, 1),   # MQA
        (True, 7, 4, 2),    # causal + SWA
        (False, 5, 4, 4),   # bidirectional window
    ],
)
def test_flash_matches_oracle(causal, left_window, hq, g):
    b, t, d = 2, 48, 32
    q, k, v = make_qkv(0, b, t, t, hq, g, d)
    scale = 1.0 / np.sqrt(d)
    out_flash = flash(
        q, k, v, scale=scale, causal=causal, left_window=left_window,
        right_window=0 if causal else left_window,
    )
    out_ref = dot_product_attention(
        q, k, v, scale=scale, causal=causal, left_window=left_window,
        right_window=0 if causal else left_window,
    )
    np.testing.assert_allclose(
        np.asarray(out_flash), np.asarray(out_ref), rtol=2e-4, atol=2e-5
    )


def test_flash_padding_mask():
    b, t, d, hq, g = 2, 32, 32, 4, 2
    q, k, v = make_qkv(1, b, t, t, hq, g, d)
    lens = jnp.array([20, 9])
    valid = jnp.arange(t)[None, :] < lens[:, None]
    scale = 0.2
    out_flash = flash(q, k, v, scale=scale, causal=True, kv_valid=valid)
    out_ref = dot_product_attention(
        q, k, v, scale=scale, causal=True, kv_valid=valid
    )
    # compare only valid query rows (padded queries are don't-care)
    for bi in range(b):
        n = int(lens[bi])
        np.testing.assert_allclose(
            np.asarray(out_flash[bi, :n]),
            np.asarray(out_ref[bi, :n]),
            rtol=2e-4,
            atol=2e-5,
        )


def test_flash_non_divisible_lengths():
    """T and S not multiples of the block size exercise the padding path."""
    b, t, d, hq, g = 1, 37, 32, 2, 1
    q, k, v = make_qkv(2, b, t, t, hq, g, d)
    out_flash = flash(q, k, v, scale=0.3, causal=True)
    out_ref = dot_product_attention(q, k, v, scale=0.3, causal=True)
    np.testing.assert_allclose(
        np.asarray(out_flash), np.asarray(out_ref), rtol=2e-4, atol=2e-5
    )


def test_flash_gradients_match_oracle():
    b, t, d, hq, g = 1, 32, 32, 4, 2
    q, k, v = make_qkv(3, b, t, t, hq, g, d)
    scale = 1.0 / np.sqrt(d)

    def loss_flash(q, k, v):
        return jnp.sum(
            flash(q, k, v, scale=scale, causal=True, left_window=9) ** 2
        )

    def loss_ref(q, k, v):
        return jnp.sum(
            dot_product_attention(
                q, k, v, scale=scale, causal=True, left_window=9
            )
            ** 2
        )

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=5e-4, atol=5e-5
        )


def test_flash_bf16_inputs():
    b, t, d, hq, g = 1, 32, 32, 4, 2
    q, k, v = make_qkv(4, b, t, t, hq, g, d)
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    out = flash(qb, kb, vb, scale=0.2, causal=True)
    ref = dot_product_attention(qb, kb, vb, scale=0.2, causal=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, dtype=np.float32),
        np.asarray(ref, dtype=np.float32),
        rtol=2e-2,
        atol=2e-2,
    )


@pytest.mark.parametrize("d", [64, 66, 72, 60, 16])
def test_flash_odd_head_dims(d):
    """Head dims off the 128-lane tile (the configs' real operating points:
    nlp bench 64, vit2d 72, vit3d 66, nlp small 60/16) run via in-wrapper
    zero-padding of the head dim — exact, not approximate."""
    b, t, hq, g = 2, 40, 4, 2
    q, k, v = make_qkv(10 + d, b, t, t, hq, g, d)
    scale = 1.0 / np.sqrt(d)
    out_flash = flash(q, k, v, scale=scale, causal=True, left_window=17)
    out_ref = dot_product_attention(
        q, k, v, scale=scale, causal=True, left_window=17
    )
    np.testing.assert_allclose(
        np.asarray(out_flash), np.asarray(out_ref), rtol=2e-4, atol=2e-5
    )

    def loss_flash(q, k, v):
        return jnp.sum(flash(q, k, v, scale=scale, causal=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(
            dot_product_attention(q, k, v, scale=scale, causal=True) ** 2
        )

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=5e-4, atol=5e-5
        )


def test_flash_segment_ids():
    """Packed sequences: per-segment causal attention must match the oracle
    (and differ from the unsegmented result)."""
    b, t, d, hq, g = 2, 48, 32, 4, 2
    q, k, v = make_qkv(7, b, t, t, hq, g, d)
    scale = 1.0 / np.sqrt(d)
    # 3 packed docs per row with different boundaries per batch row
    seg = jnp.stack([
        jnp.concatenate([jnp.zeros(10), jnp.ones(18), jnp.full(20, 2)]),
        jnp.concatenate([jnp.zeros(25), jnp.ones(5), jnp.full(18, 2)]),
    ]).astype(jnp.int32)
    out_flash = flash(
        q, k, v, scale=scale, causal=True,
        q_segment_ids=seg, kv_segment_ids=seg,
    )
    out_ref = dot_product_attention(
        q, k, v, scale=scale, causal=True,
        q_segment_ids=seg, kv_segment_ids=seg,
    )
    np.testing.assert_allclose(
        np.asarray(out_flash), np.asarray(out_ref), rtol=2e-4, atol=2e-5
    )
    out_noseg = flash(q, k, v, scale=scale, causal=True)
    assert not np.allclose(np.asarray(out_flash), np.asarray(out_noseg))


def test_flash_segment_ids_gradients():
    b, t, d, hq, g = 1, 32, 32, 4, 1
    q, k, v = make_qkv(8, b, t, t, hq, g, d)
    seg = jnp.concatenate([jnp.zeros(13), jnp.ones(19)])[None].astype(jnp.int32)
    scale = 1.0 / np.sqrt(d)

    def loss(fn):
        def f(q, k, v):
            return jnp.sum(
                fn(q, k, v, scale=scale, causal=True,
                   q_segment_ids=seg, kv_segment_ids=seg) ** 2
            )
        return f

    gf = jax.grad(loss(flash), argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss(dot_product_attention), argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=5e-4, atol=5e-5
        )


@pytest.mark.parametrize("causal", [True, False])
def test_flash_bwd_interior_block_fast_path(causal):
    """Gradient parity on blocks that take the backward kernels' INTERIOR
    fast path (p = exp(s - lse), no masking).

    The other gradient tests run causal/windowed at T <= 48 with 16x16
    blocks, where no block ever satisfies the interior predicate
    (k_start + block_k - 1 <= q_start needs a full k block strictly below
    the q block); a numerics bug in the unmasked branch would only show up
    on hardware at T > block_k.  Here bwd_block_q=8 / bwd_block_k=64 at
    T=256 forces many interior blocks (causal case), and the non-causal
    no-window all-valid case makes EVERY block interior."""
    b, t, d, hq, g = 1, 256, 32, 2, 1
    q, k, v = make_qkv(11, b, t, t, hq, g, d)
    scale = 1.0 / np.sqrt(d)

    def loss(fn, **kw):
        def f(q, k, v):
            return jnp.sum(fn(q, k, v, scale=scale, causal=causal, **kw) ** 2)
        return f

    gf = jax.grad(
        loss(
            functools.partial(
                flash_attention, interpret=True, block_q=64, block_k=64,
                bwd_block_q=8, bwd_block_k=64,
            )
        ),
        argnums=(0, 1, 2),
    )(q, k, v)
    gr = jax.grad(loss(dot_product_attention), argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=5e-4, atol=5e-5
        )

"""Unit tests for the shared NN core (RMSNorm, SwiGLU, RoPE, attention, MoE).

Numerical oracles are computed inline with numpy following the reference
formulas (file:line cited per test)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vats_tpu.nn import (
    AttentionBlock,
    FFNBlock,
    KVCache,
    MoEBlock,
    RMSNorm,
    SwiGLU,
    apply_rope_1d,
    l2_normalize,
)
from vats_tpu.nn.attention import Attention
from vats_tpu.nn.moe import MoELayer
from vats_tpu.ops import dot_product_attention


def test_rms_norm_matches_formula():
    # weight * x / sqrt(mean(x^2) + eps)  (/root/reference/src/rms_norm.py:30-36)
    d = 32
    x = np.random.RandomState(0).randn(2, 5, d).astype(np.float32)
    layer = RMSNorm(features=d, eps=1e-7)
    params = layer.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = layer.apply(params, jnp.asarray(x))
    expected = x / np.sqrt((x**2).mean(-1, keepdims=True) + 1e-7)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5, atol=1e-5)


def test_swiglu_shapes_and_grad():
    d, f = 16, 64
    layer = SwiGLU(d_model=d, d_ffn=f, dropout=0.0)
    x = jnp.ones((2, 3, d))
    params = layer.init(jax.random.PRNGKey(0), x)
    out = layer.apply(params, x)
    assert out.shape == (2, 3, d)
    g = jax.grad(lambda p: layer.apply(p, x).sum())(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_rope_rotation_preserves_norm_and_position0_identity():
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 4, 8))
    out = apply_rope_1d(x, jnp.arange(6), theta=10000.0)
    # rotation preserves pairwise L2 norm
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out), axis=-1),
        np.linalg.norm(np.asarray(x), axis=-1),
        rtol=1e-5,
    )
    # position 0 is identity
    np.testing.assert_allclose(
        np.asarray(out[:, 0]), np.asarray(x[:, 0]), rtol=1e-6, atol=1e-6
    )


def test_rope_relative_positions():
    # dot(q_i, k_j) after RoPE depends only on i - j
    hd = 8
    q = jax.random.normal(jax.random.PRNGKey(2), (1, 1, 1, hd))
    k = jax.random.normal(jax.random.PRNGKey(3), (1, 1, 1, hd))
    theta = 100.0

    def score(qi, kj):
        qq = apply_rope_1d(q, jnp.array([qi]), theta)
        kk = apply_rope_1d(k, jnp.array([kj]), theta)
        return float(jnp.sum(qq * kk))

    assert abs(score(5, 3) - score(7, 5)) < 1e-4
    assert abs(score(2, 2) - score(9, 9)) < 1e-4


def test_l2_normalize():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 4, 8))
    out = l2_normalize(x)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out), axis=-1), 1.0, rtol=1e-5
    )


def test_attention_oracle_matches_dense_softmax():
    b, t, h, g, hd = 2, 8, 4, 2, 16
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, t, h, hd))
    k = jax.random.normal(kk, (b, t, g, hd))
    v = jax.random.normal(kv, (b, t, g, hd))
    scale = 1.0 / np.sqrt(hd)
    out = dot_product_attention(q, k, v, scale=scale, causal=True)

    # dense numpy oracle with repeat-interleaved KV heads (the reference's
    # extend_kv_heads semantics, /root/reference/utils/attention_utils.py:7-27)
    qn, kn, vn = map(np.asarray, (q, k, v))
    kr = np.repeat(kn, h // g, axis=2)
    vr = np.repeat(vn, h // g, axis=2)
    scores = np.einsum("bthd,bshd->bhts", qn, kr) * scale
    mask = np.tril(np.ones((t, t), dtype=bool))
    scores = np.where(mask[None, None], scores, -1e30)
    probs = np.exp(scores - scores.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    expected = np.einsum("bhts,bshd->bthd", probs, vr)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4, atol=1e-5)


def test_attention_sliding_window():
    b, t, h, g, hd = 1, 12, 2, 1, 8
    q = jax.random.normal(jax.random.PRNGKey(4), (b, t, h, hd))
    k = jax.random.normal(jax.random.PRNGKey(5), (b, t, g, hd))
    v = jax.random.normal(jax.random.PRNGKey(6), (b, t, g, hd))
    w = 3
    out = dot_product_attention(
        q, k, v, scale=0.35, causal=True, left_window=w
    )
    qn, kn, vn = map(np.asarray, (q, k, v))
    kr = np.repeat(kn, h, axis=2)
    vr = np.repeat(vn, h, axis=2)
    scores = np.einsum("bthd,bshd->bhts", qn, kr) * 0.35
    i = np.arange(t)[:, None]
    j = np.arange(t)[None, :]
    mask = (j <= i) & (i - j <= w)
    scores = np.where(mask[None, None], scores, -1e30)
    probs = np.exp(scores - scores.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    expected = np.einsum("bhts,bshd->bthd", probs, vr)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4, atol=1e-5)


def test_attention_padding_mask_ignores_padded_keys():
    b, t, h, g, hd = 2, 6, 2, 2, 8
    q = jax.random.normal(jax.random.PRNGKey(7), (b, t, h, hd))
    k = jax.random.normal(jax.random.PRNGKey(8), (b, t, g, hd))
    v = jax.random.normal(jax.random.PRNGKey(9), (b, t, g, hd))
    valid = jnp.array([[1, 1, 1, 1, 0, 0], [1, 1, 0, 0, 0, 0]], dtype=bool)
    out1 = dot_product_attention(q, k, v, scale=0.5, causal=True, kv_valid=valid)
    # changing K/V at padded positions must not change valid-position outputs
    k2 = k.at[:, 4:].set(99.0)
    v2 = v.at[:, 4:].set(-99.0)
    out2 = dot_product_attention(q, k2, v2, scale=0.5, causal=True, kv_valid=valid)
    np.testing.assert_allclose(
        np.asarray(out1[:, :4]), np.asarray(out2[:, :4]), rtol=1e-5, atol=1e-6
    )


def test_causal_prefix_equivalence_attention_block():
    """Truncated-input last-token output equals full-input token t-1 output.

    Mirrors the reference's causal invariant test
    (/root/reference/tests/transformers/nlp/attention_tests.py:111-131)."""
    d, h, g = 32, 4, 2
    block = AttentionBlock(
        d_model=d, num_heads=h, query_groups=g, dropout=0.0, dtype=jnp.float32
    )
    x = jax.random.normal(jax.random.PRNGKey(10), (1, 10, d))
    params = block.init(jax.random.PRNGKey(0), x, causal=True)
    full, _ = block.apply(params, x, causal=True)
    trunc, _ = block.apply(params, x[:, :7], causal=True)
    np.testing.assert_allclose(
        np.asarray(full[:, 6]), np.asarray(trunc[:, 6]), rtol=1e-4, atol=1e-5
    )


def test_kv_cache_decode_matches_full_forward():
    """Cached one-token-at-a-time attention == uncached full forward."""
    d, h, g, t = 32, 4, 2, 6
    attn = Attention(
        d_model=d, num_heads=h, query_groups=g, dtype=jnp.float32
    )
    x = jax.random.normal(jax.random.PRNGKey(11), (2, t, d))
    params = attn.init(jax.random.PRNGKey(1), x, causal=True)
    full, _ = attn.apply(params, x, causal=True)

    cache = KVCache.create(1, 2, t, g, d // h, dtype=jnp.float32)
    outs = []
    for i in range(t):
        step_out, cache = attn.apply(
            params, x[:, i : i + 1], causal=True, cache=cache, layer_idx=0
        )
        cache = cache.advance(1)
        outs.append(step_out)
    decoded = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(
        np.asarray(full), np.asarray(decoded), rtol=1e-4, atol=1e-5
    )


def test_moe_dense_equals_scatter():
    d, f, e, k = 16, 32, 4, 2
    x = jax.random.normal(jax.random.PRNGKey(12), (2, 5, d))
    dense = MoEBlock(
        d_model=d, d_ffn=f, num_experts=e, top_k=k, dropout=0.0,
        dispatch="dense", dtype=jnp.float32
    )
    scatter = MoEBlock(
        d_model=d, d_ffn=f, num_experts=e, top_k=k, dropout=0.0,
        dispatch="scatter", capacity_factor=-1.0, dtype=jnp.float32
    )
    params = dense.init(jax.random.PRNGKey(2), x)
    out_d, _ = dense.apply(params, x)
    out_s, _ = scatter.apply(params, x)
    np.testing.assert_allclose(
        np.asarray(out_d), np.asarray(out_s), rtol=1e-4, atol=1e-5
    )


def test_moe_sort_equals_dense_lossless():
    """Sort-based ragged dispatch == dense (exact) when capacity is lossless."""
    d, f, e, k = 16, 32, 4, 2
    x = jax.random.normal(jax.random.PRNGKey(21), (2, 5, d))
    dense = MoEBlock(
        d_model=d, d_ffn=f, num_experts=e, top_k=k, dropout=0.0,
        dispatch="dense", dtype=jnp.float32
    )
    sort = MoEBlock(
        d_model=d, d_ffn=f, num_experts=e, top_k=k, dropout=0.0,
        dispatch="sort", capacity_factor=-1.0, dtype=jnp.float32
    )
    params = dense.init(jax.random.PRNGKey(2), x)
    out_d, _ = dense.apply(params, x)
    out_s, _ = sort.apply(params, x)
    np.testing.assert_allclose(
        np.asarray(out_d), np.asarray(out_s), rtol=1e-4, atol=1e-5
    )


@pytest.mark.slow
def test_moe_sort_equals_scatter_with_drops():
    """At tight capacity, sort and one-hot dispatch drop the SAME tokens
    (slot-major priority) and produce identical outputs and gradients."""
    d, f, e, k = 16, 32, 4, 2
    x = jax.random.normal(jax.random.PRNGKey(22), (3, 11, d))

    def build(mode):
        return MoEBlock(
            d_model=d, d_ffn=f, num_experts=e, top_k=k, dropout=0.0,
            dispatch=mode, capacity_factor=1.0, dtype=jnp.float32
        )

    scatter, sort = build("scatter"), build("sort")
    params = scatter.init(jax.random.PRNGKey(4), x)

    def loss(p, mod, xx):
        out, aux = mod.apply(p, xx, deterministic=False,
                             rngs={"dropout": jax.random.PRNGKey(0)})
        return jnp.sum(out ** 2) + aux

    for mod_a, mod_b in [(scatter, sort)]:
        la, ga = jax.value_and_grad(loss)(params, mod_a, x)
        lb, gb = jax.value_and_grad(loss)(params, mod_b, x)
        np.testing.assert_allclose(float(la), float(lb), rtol=1e-5)
        flat_a = jax.tree_util.tree_leaves(ga)
        flat_b = jax.tree_util.tree_leaves(gb)
        for a, b in zip(flat_a, flat_b):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
            )


def test_moe_auto_picks_sort_at_scale():
    """The auto dispatcher switches to the O(N·k·d) sort path when the
    one-hot tensors would blow past the HBM budget."""
    layer = MoELayer(
        d_model=8, d_ffn=16, num_experts=32, top_k=2,
        capacity_factor=1.25, dtype=jnp.float32
    )
    # tiny n: one-hot fine -> scatter; huge n: must sort
    small_cap = layer._capacity(64)
    assert 64 * 2 * 32 * small_cap <= (1 << 24)
    big_n = 32 * 4096
    big_cap = layer._capacity(big_n)
    assert big_n * 2 * 32 * big_cap > (1 << 24)


def test_moe_aux_loss_is_cv():
    d, f, e, k = 16, 32, 4, 2
    x = jax.random.normal(jax.random.PRNGKey(13), (2, 5, d))
    block = MoEBlock(
        d_model=d, d_ffn=f, num_experts=e, top_k=k, dropout=0.0,
        dtype=jnp.float32
    )
    params = block.init(jax.random.PRNGKey(3), x)
    _, aux_train = block.apply(
        params, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(4)}
    )
    _, aux_eval = block.apply(params, x)
    assert float(aux_train) > 0.0
    assert float(aux_eval) == 0.0


def test_ffn_block_residual():
    d, f = 16, 64
    block = FFNBlock(d_model=d, d_ffn=f, dropout=0.0, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(14), (2, 3, d))
    params = block.init(jax.random.PRNGKey(5), x)
    out = block.apply(params, x)
    assert out.shape == x.shape
    assert not np.allclose(np.asarray(out), np.asarray(x))


def test_select_attention_impl_seq_threshold():
    """'auto' routes short static sequences to XLA (FLASH_MIN_SEQ_LEN):
    the flash kernel loses at the ViT-3D factorized shapes (196/4 tokens)
    and wins 5x+ at 4096 — tools/probe_vit3d_breakdown.py."""
    from vats_tpu.nn.attention import FLASH_MIN_SEQ_LEN, select_attention_impl

    # short sequences choose XLA regardless of backend
    assert select_attention_impl(
        "auto", head_dim=64, seq_len=FLASH_MIN_SEQ_LEN - 1
    ) == "xla"
    # explicit impls are never overridden
    assert select_attention_impl(
        "flash", head_dim=64, seq_len=4
    ) == "flash"
    assert select_attention_impl("xla", head_dim=64, seq_len=8192) == "xla"
    # unknown seq_len keeps the backend-driven choice (xla on CPU tests)
    assert select_attention_impl("auto", head_dim=64) in ("xla", "flash")

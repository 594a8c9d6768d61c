"""TextLM model tests: shapes, gradients, cache consistency, edge cases.

Mirrors the reference test strategy (SURVEY.md §4): finite-logits batteries
(/root/reference/tests/transformers/nlp/model_tests.py:35-61), causal
prefix-equivalence, and cached-vs-uncached consistency."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vats_tpu.configs import ModelArgs
from vats_tpu.models import TextLM


def tiny_args(**kw):
    base = dict(
        d_model=64,
        num_heads=4,
        query_groups=2,
        d_ffn=128,
        num_layers=2,
        dropout=0.0,
        vocab_size=97,
        max_seq_len=32,
        left_window=-1,
        num_experts=1,
        top_k=1,
        dtype="float32",
        gradient_checkpointing=False,
        max_batch_size=8,
    )
    base.update(kw)
    return ModelArgs(**base)


@pytest.fixture(scope="module")
def model_and_params():
    args = tiny_args()
    model = TextLM(args)
    ids = jnp.zeros((2, 8), dtype=jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)
    return model, params


def test_forward_shapes_and_finite(model_and_params):
    model, params = model_and_params
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0, 97)
    logits, cache, aux = model.apply(params, ids)
    assert logits.shape == (2, 8, 97)
    assert cache is None
    assert np.isfinite(np.asarray(logits)).all()
    assert float(aux) == 0.0  # deterministic => no aux loss


def test_gradients_finite(model_and_params):
    model, params = model_and_params
    ids = jax.random.randint(jax.random.PRNGKey(2), (2, 8), 0, 97)

    def loss_fn(p):
        logits, _, _ = model.apply(p, ids)
        return jnp.mean(logits**2)

    grads = jax.grad(loss_fn)(params)
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.isfinite(np.asarray(leaf)).all()


def test_causal_prefix_equivalence(model_and_params):
    model, params = model_and_params
    ids = jax.random.randint(jax.random.PRNGKey(3), (1, 12), 0, 97)
    full, _, _ = model.apply(params, ids)
    trunc, _, _ = model.apply(params, ids[:, :7])
    np.testing.assert_allclose(
        np.asarray(full[:, 6]), np.asarray(trunc[:, 6]), rtol=2e-3, atol=2e-4
    )


def test_cached_decode_matches_uncached(model_and_params):
    model, params = model_and_params
    t = 10
    ids = jax.random.randint(jax.random.PRNGKey(4), (2, t), 0, 97)
    full, _, _ = model.apply(params, ids)

    # prefill 6, decode 4 one at a time
    cache = model.init_cache(2, t)
    logits_p, cache, _ = model.apply(params, ids[:, :6], cache=cache)
    np.testing.assert_allclose(
        np.asarray(logits_p), np.asarray(full[:, :6]), rtol=2e-3, atol=2e-4
    )
    for i in range(6, t):
        step_logits, cache, _ = model.apply(params, ids[:, i : i + 1], cache=cache)
        np.testing.assert_allclose(
            np.asarray(step_logits[:, 0]),
            np.asarray(full[:, i]),
            rtol=2e-3,
            atol=2e-4,
        )


def test_padding_mask_isolation(model_and_params):
    """Outputs at valid positions are unaffected by padded-token content."""
    model, params = model_and_params
    ids = jax.random.randint(jax.random.PRNGKey(5), (1, 8), 1, 97)
    mask = jnp.array([[1, 1, 1, 1, 1, 0, 0, 0]], dtype=bool)
    out1, _, _ = model.apply(params, ids, padding_mask=mask)
    ids2 = ids.at[:, 5:].set(3)
    out2, _, _ = model.apply(params, ids2, padding_mask=mask)
    np.testing.assert_allclose(
        np.asarray(out1[:, :5]), np.asarray(out2[:, :5]), rtol=2e-3, atol=2e-4
    )


def test_moe_model_forward_and_aux():
    args = tiny_args(num_experts=4, top_k=2)
    model = TextLM(args)
    ids = jax.random.randint(jax.random.PRNGKey(6), (2, 8), 0, 97)
    params = model.init(jax.random.PRNGKey(7), ids)
    logits, _, aux = model.apply(
        params, ids, deterministic=False, rngs={"dropout": jax.random.PRNGKey(8)}
    )
    assert logits.shape == (2, 8, 97)
    assert np.isfinite(np.asarray(logits)).all()
    assert float(aux) > 0.0


def test_mqa_config():
    args = tiny_args(query_groups=1, use_mqa=True)
    model = TextLM(args)
    ids = jax.random.randint(jax.random.PRNGKey(9), (2, 8), 0, 97)
    params = model.init(jax.random.PRNGKey(10), ids)
    logits, _, _ = model.apply(params, ids)
    assert logits.shape == (2, 8, 97)


def test_untied_head():
    args = tiny_args(tie_weights=False)
    model = TextLM(args)
    ids = jnp.zeros((1, 4), dtype=jnp.int32)
    params = model.init(jax.random.PRNGKey(11), ids)
    assert "lm_head" in params["params"]


def test_invalid_configs_raise():
    with pytest.raises(ValueError):
        tiny_args(d_model=65)  # not divisible by heads
    with pytest.raises(ValueError):
        tiny_args(num_heads=4, query_groups=3)
    with pytest.raises(ValueError):
        tiny_args(num_experts=1, top_k=2)
    with pytest.raises(ValueError):
        tiny_args(use_causal=False)
    with pytest.raises(ValueError):
        tiny_args(right_window=2)


def test_gradient_checkpointing_matches():
    args_nc = tiny_args(gradient_checkpointing=False)
    args_c = tiny_args(gradient_checkpointing=True)
    model_nc, model_c = TextLM(args_nc), TextLM(args_c)
    ids = jax.random.randint(jax.random.PRNGKey(12), (2, 8), 0, 97)
    params = model_nc.init(jax.random.PRNGKey(13), ids)

    def loss(m, p):
        logits, _, _ = m.apply(
            p, ids, deterministic=False, rngs={"dropout": jax.random.PRNGKey(14)}
        )
        return jnp.mean(logits**2)

    g_nc = jax.grad(lambda p: loss(model_nc, p))(params)
    g_c = jax.grad(lambda p: loss(model_c, p))(params)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_nc), jax.tree_util.tree_leaves(g_c)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_readout_positions_matches_full_logits():
    # serving prefill computes logits only at the last valid position; must
    # equal slicing the full [B, T, V] readout at those positions
    args = tiny_args()
    model = TextLM(args)
    ids = jax.random.randint(jax.random.PRNGKey(20), (3, 10), 1, 97)
    mask = jnp.array(
        [[True] * 10, [True] * 7 + [False] * 3, [True] * 4 + [False] * 6]
    )
    params = model.init(jax.random.PRNGKey(21), ids)
    cache_a = model.init_cache(3, 16)
    full, cache_full, _ = model.apply(
        params, ids, padding_mask=mask, cache=cache_a, deterministic=True
    )
    last = jnp.sum(mask, axis=1).astype(jnp.int32) - 1
    cache_b = model.init_cache(3, 16)
    sliced, cache_sliced, _ = model.apply(
        params, ids, padding_mask=mask, cache=cache_b, deterministic=True,
        readout_positions=last,
    )
    assert sliced.shape == (3, 1, 97)
    want = jnp.take_along_axis(full, last[:, None, None], axis=1)
    np.testing.assert_allclose(
        np.asarray(sliced), np.asarray(want), rtol=1e-5, atol=1e-5
    )
    # the KV cache advance is unaffected by the readout trim
    np.testing.assert_allclose(
        np.asarray(cache_sliced.length), np.asarray(cache_full.length)
    )

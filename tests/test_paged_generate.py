"""Paged-cache generation: parity with the dense-cache path + ragged batches."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from vats_tpu.configs import ModelArgs
from vats_tpu.inference.generate import generate, generate_paged
from vats_tpu.models import TextLM


def tiny_args(**kw):
    base = dict(
        d_model=64, num_heads=4, query_groups=2, d_ffn=128, num_layers=2,
        dropout=0.0, vocab_size=97, max_seq_len=64, left_window=-1,
        num_experts=1, top_k=1, dtype="float32",
        gradient_checkpointing=False, max_batch_size=8,
    )
    base.update(kw)
    return ModelArgs(**base)


@pytest.mark.slow
def test_paged_model_forward_matches_dense_cache():
    """Paged prefill+decode logits == dense-cache logits == full forward."""
    args = tiny_args()
    model = TextLM(args)
    ids = jax.random.randint(jax.random.PRNGKey(0), (2, 10), 1, 97)
    params = model.init(jax.random.PRNGKey(1), ids)
    full, _, _ = model.apply(params, ids)

    from vats_tpu.ops.decode_attention import PagedKVCache

    cache = PagedKVCache.create(
        args.num_layers, 2, 16, args.query_groups, args.head_dim,
        page_size=128, dtype=jnp.float32,
    )
    # prefill 6
    logits_p, cache, _ = model.apply(
        params, ids[:, :6], paged_cache=cache
    )
    np.testing.assert_allclose(
        np.asarray(logits_p), np.asarray(full[:, :6]), rtol=2e-3, atol=2e-4
    )
    # decode 4 one at a time through the paged path
    for i in range(6, 10):
        step_logits, cache, _ = model.apply(
            params, ids[:, i : i + 1], paged_cache=cache
        )
        np.testing.assert_allclose(
            np.asarray(step_logits[:, 0]), np.asarray(full[:, i]),
            rtol=2e-3, atol=2e-4,
        )


def test_paged_generate_matches_dense_generate_greedy():
    args = tiny_args()
    model = TextLM(args)
    prompt = jax.random.randint(jax.random.PRNGKey(2), (2, 6), 1, 97)
    params = model.init(jax.random.PRNGKey(3), prompt)
    kw = dict(
        max_new_tokens=6, do_sample=False, temperature=0.0, pad_token_id=0,
        eos_token_id=None, total_len=16,
    )
    t_dense, l_dense = generate(
        model, params, prompt, None, jax.random.PRNGKey(4), **kw
    )
    t_paged, l_paged = generate_paged(
        model, params, prompt, None, jax.random.PRNGKey(4), page_size=128, **kw
    )
    # uniform prompts: identical layout and tokens
    np.testing.assert_array_equal(np.asarray(l_dense), np.asarray(l_paged))
    np.testing.assert_array_equal(
        np.asarray(t_dense[:, :12]), np.asarray(t_paged[:, :12])
    )


def test_paged_generate_ragged_prompts():
    """Each ragged row matches its own single-row (unpadded) generation."""
    args = tiny_args()
    model = TextLM(args)
    params = model.init(
        jax.random.PRNGKey(5), jnp.zeros((1, 8), jnp.int32)
    )
    full_prompt = jax.random.randint(jax.random.PRNGKey(6), (2, 8), 1, 97)
    lens = [8, 5]
    mask = jnp.asarray([[True] * 8, [True] * 5 + [False] * 3])
    prompt = jnp.where(mask, full_prompt, 0)

    kw = dict(
        max_new_tokens=5, do_sample=False, temperature=0.0, pad_token_id=0,
        eos_token_id=None, total_len=16,
    )
    t_batch, l_batch = generate_paged(
        model, params, prompt, mask, jax.random.PRNGKey(7), page_size=128, **kw
    )
    for row, n in enumerate(lens):
        single = prompt[row : row + 1, :n]
        t_single, l_single = generate_paged(
            model, params, single, None, jax.random.PRNGKey(8),
            page_size=128, **kw,
        )
        assert int(l_batch[row]) == int(l_single[0]) == n + 5
        np.testing.assert_array_equal(
            np.asarray(t_batch[row, : n + 5]),
            np.asarray(t_single[0, : n + 5]),
        )


def test_token_generator_paged_mode():
    from vats_tpu.configs import GenerationArgs
    from vats_tpu.inference import TokenGenerator

    class Tok:
        pad_token_id = 0
        eos_token_id = None

        def encode(self, text):
            return [ord(c) % 90 + 1 for c in text][:16]

        def decode(self, ids, skip_special_tokens=True):
            return " ".join(str(i) for i in ids)

    args = tiny_args()
    ga = GenerationArgs(max_new_tokens=8, temperature=0.0, do_sample=False,
                        top_k=None, top_p=None, repetition_penalty=None)
    dense = TokenGenerator(args, seed=0)
    paged = TokenGenerator(args, seed=0, use_paged=True)
    out_d = dense.generate_tokens("Once upon a time,", ga, Tok())
    out_p = paged.generate_tokens("Once upon a time,", ga, Tok())
    assert out_d == out_p and len(out_p) > 0


def test_paged_generate_prefill_row_chunk_parity():
    """Row-chunked prefill (the B=256 memory-bounding path) is bit-identical
    to whole-batch prefill, including ragged prompts."""
    args = tiny_args()
    model = TextLM(args)
    params = model.init(
        jax.random.PRNGKey(9), jnp.zeros((1, 8), jnp.int32)
    )
    full_prompt = jax.random.randint(jax.random.PRNGKey(10), (4, 8), 1, 97)
    mask = jnp.asarray(
        [[True] * 8, [True] * 5 + [False] * 3, [True] * 8,
         [True] * 3 + [False] * 5]
    )
    prompt = jnp.where(mask, full_prompt, 0)
    kw = dict(
        max_new_tokens=5, do_sample=True, temperature=0.8, top_k=7,
        pad_token_id=0, eos_token_id=None, total_len=16,
    )
    t_whole, l_whole = generate_paged(
        model, params, prompt, mask, jax.random.PRNGKey(11), page_size=128,
        **kw,
    )
    t_chunk, l_chunk = generate_paged(
        model, params, prompt, mask, jax.random.PRNGKey(11), page_size=128,
        prefill_row_chunk=2, **kw,
    )
    np.testing.assert_array_equal(np.asarray(l_whole), np.asarray(l_chunk))
    np.testing.assert_array_equal(np.asarray(t_whole), np.asarray(t_chunk))

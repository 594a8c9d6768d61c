"""Generation tests: jitted decode vs eager uncached oracle, samplers, EOS.

The oracle re-runs the full (uncached) forward each step — the reference's
well-defined generation semantics (use_cache=False path of
/root/reference/src/transformers/nlp/inference/generate.py:129-140)."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from vats_tpu.configs import GenerationArgs, ModelArgs
from vats_tpu.inference import (
    TokenGenerator,
    apply_repetition_penalty,
    apply_top_k,
    apply_top_p,
    generate,
)
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
        max_seq_len=48,
        left_window=-1,
        num_experts=1,
        top_k=1,
        dtype="float32",
        gradient_checkpointing=False,
        max_batch_size=8,
    )
    base.update(kw)
    return ModelArgs(**base)


@pytest.mark.slow
def test_greedy_generate_matches_uncached_oracle():
    args = tiny_args()
    model = TextLM(args)
    prompt = jax.random.randint(jax.random.PRNGKey(0), (2, 6), 1, 97)
    params = model.init(jax.random.PRNGKey(1), prompt)

    n_new = 5
    tokens, lengths = generate(
        model,
        params,
        prompt,
        None,
        jax.random.PRNGKey(2),
        max_new_tokens=n_new,
        do_sample=False,
        temperature=0.0,
        pad_token_id=0,
        eos_token_id=None,
    )

    # eager oracle: full uncached forward each step, greedy argmax
    cur = np.asarray(prompt)
    for _ in range(n_new):
        logits, _, _ = model.apply(params, jnp.asarray(cur))
        nxt = np.asarray(jnp.argmax(logits[:, -1], axis=-1))
        cur = np.concatenate([cur, nxt[:, None]], axis=1)

    np.testing.assert_array_equal(np.asarray(tokens[:, : 6 + n_new]), cur)
    np.testing.assert_array_equal(np.asarray(lengths), [6 + n_new] * 2)


def test_eos_stops_generation():
    args = tiny_args()
    model = TextLM(args)
    prompt = jax.random.randint(jax.random.PRNGKey(3), (1, 4), 1, 97)
    params = model.init(jax.random.PRNGKey(4), prompt)
    # find what greedy emits first, use it as EOS => generation stops after 1
    logits, _, _ = model.apply(params, prompt)
    first = int(jnp.argmax(logits[0, -1]))
    tokens, lengths = generate(
        model,
        params,
        prompt,
        None,
        jax.random.PRNGKey(5),
        max_new_tokens=8,
        do_sample=False,
        temperature=0.0,
        pad_token_id=0,
        eos_token_id=first,
    )
    assert int(lengths[0]) == 5  # prompt 4 + the EOS token
    assert int(tokens[0, 4]) == first
    assert np.all(np.asarray(tokens[0, 5:]) == 0)


def test_top_k_masks_logits():
    logits = jnp.asarray([[1.0, 5.0, 3.0, 2.0, 4.0]])
    out = np.asarray(apply_top_k(logits, 2))
    assert np.isfinite(out[0, [1, 4]]).all()
    assert (out[0, [0, 2, 3]] < -1e30).all()


def test_top_p_keeps_nucleus():
    probs = np.array([[0.5, 0.3, 0.15, 0.05]])
    logits = jnp.asarray(np.log(probs))
    out = np.asarray(apply_top_p(logits, 0.75))
    # cumulative: 0.5, 0.8 (first above threshold kept via shift), rest dropped
    assert np.isfinite(out[0, [0, 1]]).all()
    assert (out[0, [2, 3]] < -1e30).all()


def test_repetition_penalty_semantics():
    logits = jnp.asarray([[2.0, -2.0, 1.0]])
    gen = jnp.asarray([[0, 1]])
    valid = jnp.ones((1, 2), dtype=bool)
    out = np.asarray(apply_repetition_penalty(logits, gen, valid, 2.0))
    assert np.isclose(out[0, 0], 1.0)  # positive: divided
    assert np.isclose(out[0, 1], -4.0)  # negative: multiplied
    assert np.isclose(out[0, 2], 1.0)  # absent token untouched


def test_sampled_generation_runs_and_respects_vocab():
    args = tiny_args()
    model = TextLM(args)
    prompt = jax.random.randint(jax.random.PRNGKey(6), (2, 4), 1, 97)
    params = model.init(jax.random.PRNGKey(7), prompt)
    tokens, lengths = generate(
        model,
        params,
        prompt,
        None,
        jax.random.PRNGKey(8),
        max_new_tokens=6,
        do_sample=True,
        temperature=0.7,
        top_k=50,
        top_p=0.95,
        repetition_penalty=1.7,
        pad_token_id=0,
        eos_token_id=None,
    )
    arr = np.asarray(tokens)
    assert arr.min() >= 0 and arr.max() < 97
    assert np.all(np.asarray(lengths) == 10)


class _FakeTokenizer:
    pad_token_id = 0
    eos_token_id = None

    def encode(self, text):
        return [ord(c) % 90 + 1 for c in text][:16]

    def decode(self, ids, skip_special_tokens=True):
        return " ".join(str(i) for i in ids)


def test_token_generator_end_to_end():
    args = tiny_args()
    gen = TokenGenerator(args, seed=0)
    out = gen.generate_tokens(
        "Once upon a time,",
        GenerationArgs(max_new_tokens=8, temperature=0.0, do_sample=False,
                       top_k=None, top_p=None, repetition_penalty=None),
        _FakeTokenizer(),
    )
    assert isinstance(out, str) and len(out) > 0
    assert gen.generate_tokens("", GenerationArgs(), _FakeTokenizer()) == (
        "Please enter a valid prompt."
    )


def test_fast_topk_sampling_distribution_equivalence():
    """The top-k-subspace fast path induces exactly the same distribution as
    the full-vocab filter pipeline."""
    import jax

    from vats_tpu.inference.sampling import apply_top_k, apply_top_p

    rng = jax.random.PRNGKey(0)
    logits = jax.random.normal(rng, (3, 100)) * 3.0
    k, p, temp = 10, 0.8, 0.7

    # generic path probabilities
    full = apply_top_p(apply_top_k(logits / temp, k), p)
    probs_full = np.asarray(jax.nn.softmax(full, axis=-1))

    # fast path probabilities, scattered back to vocab space
    vals, idx = jax.lax.top_k(logits, k)
    vals = vals / temp
    probs_sub = jax.nn.softmax(vals, axis=-1)
    cum = jnp.cumsum(probs_sub, axis=-1)
    remove = cum > p
    remove = jnp.concatenate(
        [jnp.zeros_like(remove[..., :1]), remove[..., :-1]], axis=-1
    )
    kept = jnp.where(remove, -jnp.inf, vals)
    probs_kept = np.asarray(jax.nn.softmax(kept, axis=-1))
    scattered = np.zeros((3, 100))
    for b in range(3):
        scattered[b, np.asarray(idx)[b]] = probs_kept[b]
    np.testing.assert_allclose(scattered, probs_full, rtol=1e-5, atol=1e-6)

    # and the sampler only ever emits tokens from the filtered support
    from vats_tpu.inference.sampling import sample_logits

    for seed in range(20):
        tok = sample_logits(
            jax.random.PRNGKey(seed), logits, temperature=temp, top_k=k,
            top_p=p, do_sample=True,
        )
        for b in range(3):
            assert probs_full[b, int(tok[b])] > 0


def test_approx_top_k_support():
    """approx_max_k-based sampling stays within a plausible top-k support."""
    from vats_tpu.inference.sampling import sample_logits

    logits = jax.random.normal(jax.random.PRNGKey(9), (2, 256)) * 4.0
    exact_top = np.asarray(jax.lax.top_k(logits, 40)[1])
    for seed in range(10):
        tok = sample_logits(
            jax.random.PRNGKey(seed), logits, temperature=0.8, top_k=20,
            do_sample=True, approx_top_k=True,
        )
        for b in range(2):
            # approx recall ~0.95: sampled token should at least sit in the
            # exact top-2k set
            assert int(tok[b]) in exact_top[b]

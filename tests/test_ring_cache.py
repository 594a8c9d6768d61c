"""Sliding-window ring KV cache: decode parity with the full dense cache.

The ring buffer holds only the most recent S positions (slot = position % S).
With SWA masking on, generation through a ring cache must produce EXACTLY the
tokens the full-context cache produces — the dropped keys are outside every
query's window by construction (vats_tpu/nn/kv_cache.py ring fields).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vats_tpu.configs import nlp_xsmall
from vats_tpu.inference.generate import generate
from vats_tpu.models import TextLM
from vats_tpu.nn.kv_cache import KVCache, ring_slots_for_window


def _cfg(**kw):
    base = dict(
        d_model=64, num_heads=4, query_groups=2, d_ffn=128, num_layers=2,
        vocab_size=128, dropout=0.0, num_experts=1, top_k=1,
        max_seq_len=2048, use_mqa=False, gradient_checkpointing=False,
        dtype="float32", param_dtype="float32",
    )
    base.update(kw)
    return nlp_xsmall(**base)


def test_slot_positions_ring_arithmetic():
    cache = KVCache.create(1, 1, 128, 1, 8, dtype=jnp.float32, ring=True)
    # empty: every slot unwritten
    assert np.all(np.asarray(cache.slot_positions()) < 0)
    # 5 tokens written: slots 0..4 hold 0..4, rest unwritten
    cache = cache.advance(5)
    pos = np.asarray(cache.slot_positions())
    np.testing.assert_array_equal(pos[:5], np.arange(5))
    assert np.all(pos[5:] < 0)
    # wrapped: 300 tokens in a 128-ring -> slots hold 172..299
    cache = cache.replace(length=jnp.int32(300))
    pos = np.asarray(cache.slot_positions())
    assert pos.min() == 300 - 128 and pos.max() == 299
    np.testing.assert_array_equal(np.sort(pos), np.arange(172, 300))
    # each slot holds its own residue class
    np.testing.assert_array_equal(pos % 128, np.arange(128))


def test_ring_write_wraps():
    """update_layer writes at position % S; contents match a by-hand ring."""
    s, hd = 128, 8
    cache = KVCache.create(1, 1, s, 1, hd, dtype=jnp.float32, ring=True)
    for pos in range(s + 40):  # wrap past capacity
        k_new = jnp.full((1, 1, 1, hd), float(pos))
        cache = cache.update_layer(0, k_new, k_new).advance(1)
    k = np.asarray(cache.k[0, 0, 0, 0])  # [S] (first head-dim row)
    expect = np.arange(s + 40)[-s:]  # most recent S positions
    slot_of = expect % s
    ring = np.zeros(s)
    ring[slot_of] = expect
    np.testing.assert_array_equal(k, ring)


@pytest.mark.parametrize("do_sample", [False, True])
def test_ring_generate_matches_dense(do_sample):
    """Greedy/sampled generation: ring cache == full cache, token for token."""
    window = 48
    cfg = _cfg(left_window=window, max_seq_len=512)
    model = TextLM(cfg)
    rng = jax.random.PRNGKey(0)
    prompt = jax.random.randint(jax.random.PRNGKey(1), (2, 24), 1, cfg.vocab_size)
    params = model.init(rng, prompt)

    common = dict(
        max_new_tokens=200, pad_token_id=0, eos_token_id=None,
        do_sample=do_sample, temperature=0.8 if do_sample else 0.0,
        top_k=20 if do_sample else None,
    )
    # ring engages automatically (left_window 48 -> 128 slots < total_len 224)
    toks_ring, len_ring = generate(
        model, params, prompt, None, jax.random.PRNGKey(2),
        total_len=224, **common,
    )
    assert ring_slots_for_window(window) == 128

    # dense oracle: same call, window masking identical, full-context cache —
    # forced by a config whose window is "off" for the ring decision but
    # applied via the same left_window mask.  Simplest: monkeypatch-free,
    # use total_len <= slots so generate picks the dense cache.
    cfg_dense = _cfg(left_window=window, max_seq_len=512)
    model_dense = TextLM(cfg_dense)
    toks_dense, len_dense = generate(
        model_dense, params, prompt, None, jax.random.PRNGKey(2),
        total_len=128, max_new_tokens=104, pad_token_id=0, eos_token_id=None,
        do_sample=do_sample, temperature=0.8 if do_sample else 0.0,
        top_k=20 if do_sample else None,
    )
    # the first 104 generated tokens must agree (identical sampling streams)
    np.testing.assert_array_equal(
        np.asarray(toks_ring[:, :128]), np.asarray(toks_dense)
    )
    assert int(len_ring[0]) == 224  # ran to the full buffer


def test_ring_prefill_longer_than_ring():
    """A prompt longer than the ring still decodes correctly (old keys are
    outside every future window)."""
    window = 48  # -> 128 slots
    cfg = _cfg(left_window=window, max_seq_len=1024)
    model = TextLM(cfg)
    prompt = jax.random.randint(jax.random.PRNGKey(3), (1, 200), 1, cfg.vocab_size)
    params = model.init(jax.random.PRNGKey(0), prompt)

    common = dict(
        max_new_tokens=32, pad_token_id=0, eos_token_id=None, do_sample=False,
        temperature=0.0,
    )
    toks_ring, _ = generate(
        model, params, prompt, None, jax.random.PRNGKey(2),
        total_len=512, **common,
    )
    # oracle: dense cache (total_len 232 <= would still pick ring at 128...)
    # force dense by windowless config + explicit window mask equivalence is
    # not available; instead compare against the uncached full forward:
    # greedy next-token from the full-sequence logits, step by step.
    # STATIC shapes (fixed 232-wide buffer + validity mask): the naive
    # growing-sequence loop recompiled the forward 32 times and alone cost
    # 250 s of the fast lane.
    total = 232
    ids = jnp.zeros((1, total), jnp.int32).at[:, :200].set(prompt)

    @jax.jit
    def oracle_logits(ids, mask):
        logits, _, _ = model.apply(
            params, ids, padding_mask=mask, deterministic=True
        )
        return logits

    for step in range(32):
        cur = 200 + step
        mask = (jnp.arange(total) < cur)[None, :]
        logits = oracle_logits(ids, mask)
        nxt = jnp.argmax(logits[:, cur - 1], axis=-1).astype(jnp.int32)
        ids = ids.at[:, cur].set(nxt)
    np.testing.assert_array_equal(
        np.asarray(toks_ring[:, 200:232]), np.asarray(ids[:, 200:])
    )

"""Continuous-batching serving engine: scheduling + page-reuse contracts.

Oracle: a request served through ServingEngine (whatever rows/batchmates it
shared the pool with) must produce EXACTLY the greedy tokens that
generate_paged produces for the same prompt alone — continuous batching and
page recycling are not allowed to change anyone's numbers.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vats_tpu.configs import nlp_xsmall
from vats_tpu.inference.generate import generate_paged
from vats_tpu.inference.serving import PageAllocator, ServingEngine
from vats_tpu.models import TextLM


def _model_and_params():
    cfg = nlp_xsmall(
        d_model=64, num_heads=4, query_groups=2, d_ffn=128, num_layers=2,
        vocab_size=128, dropout=0.0, num_experts=1, top_k=1,
        max_seq_len=512, use_mqa=False, gradient_checkpointing=False,
        dtype="float32", param_dtype="float32",
    )
    model = TextLM(cfg)
    params = model.init(
        jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32)
    )
    return model, params


def _oracle(model, params, prompt, max_new, total_len=256):
    ids = jnp.asarray([prompt], jnp.int32)
    mask = jnp.ones_like(ids, dtype=bool)
    toks, lengths = generate_paged(
        model, params, ids, mask, jax.random.PRNGKey(9),
        max_new_tokens=max_new, temperature=0.0, do_sample=False,
        pad_token_id=0, total_len=total_len,
    )
    row = np.asarray(toks[0])
    n = int(lengths[0])
    return list(row[len(prompt):n])


PROMPTS = [
    [5, 9, 17, 3],
    [88, 11],
    [7, 7, 23, 45, 101, 2, 19],
    [64, 3, 12],
    [120, 5, 5, 5, 31, 8],
]


def test_page_allocator():
    a = PageAllocator(8)  # pages 1..7 usable
    assert a.capacity == 7
    p1 = a.alloc(3)
    assert len(set(p1)) == 3 and all(1 <= p < 8 for p in p1)
    with pytest.raises(MemoryError):
        a.alloc(5)
    a.free(p1[:2])
    assert a.num_free == 6
    assert a.high_water == 3


def test_engine_greedy_matches_generate_paged():
    model, params = _model_and_params()
    eng = ServingEngine(model, params, max_batch=2, max_context=256)
    rid = eng.submit(PROMPTS[0], max_new_tokens=10)
    out = eng.run()
    assert out[rid] == _oracle(model, params, PROMPTS[0], 10)


def test_continuous_batching_parity_and_reuse():
    """5 requests through 2 rows: every request's tokens match its solo
    oracle, and retired rows' pages are reused (high-water < sum of all
    requests' footprints)."""
    model, params = _model_and_params()
    eng = ServingEngine(model, params, max_batch=2, max_context=256)
    rids = {eng.submit(p, max_new_tokens=6 + i): p
            for i, p in enumerate(PROMPTS)}
    out = eng.run()
    assert set(out) == set(rids)
    for i, (rid, prompt) in enumerate(rids.items()):
        assert out[rid] == _oracle(model, params, prompt, 6 + i), (
            f"request {rid} diverged from its solo oracle"
        )
    # all pages returned; 2 resident rows max -> high-water <= 2 rows' worth
    assert eng.allocator.num_used == 0
    assert eng.allocator.high_water <= 2 * eng.pages_per_row


def test_pool_smaller_than_batch_queues_on_pages():
    """A pool with room for ONE resident row at a time still completes all
    requests (head-of-line waits for pages, rows stay idle)."""
    model, params = _model_and_params()
    eng = ServingEngine(
        model, params, max_batch=2, max_context=256,
        total_pages=1 + 2,  # scratch + one row's 2 pages
    )
    rids = [eng.submit(p, max_new_tokens=5) for p in PROMPTS[:3]]
    out = eng.run()
    for rid, p in zip(rids, PROMPTS[:3]):
        assert out[rid] == _oracle(model, params, p, 5)
    assert eng.allocator.high_water <= 2


def test_engine_int8_kv_matches_bf16():
    model, params = _model_and_params()
    kw = dict(max_batch=2, max_context=256)
    out_fp = ServingEngine(model, params, **kw)
    out_q = ServingEngine(model, params, kv_quant="int8", **kw)
    r1 = out_fp.submit(PROMPTS[2], max_new_tokens=8)
    r2 = out_q.submit(PROMPTS[2], max_new_tokens=8)
    assert out_fp.run()[r1] == out_q.run()[r2]


def test_engine_eos_frees_early():
    model, params = _model_and_params()
    # discover the greedy continuation, then declare its 3rd token as EOS
    toks = _oracle(model, params, PROMPTS[0], 8)
    eos = toks[2]
    eng = ServingEngine(
        model, params, max_batch=1, max_context=256, eos_token_id=eos
    )
    rid = eng.submit(PROMPTS[0], max_new_tokens=8)
    out = eng.run()
    assert out[rid] == toks[: toks.index(eos) + 1]
    assert eng.allocator.num_used == 0


def test_preemption_requeues_and_reproduces():
    """Two rows whose contexts outgrow the pool mid-decode: the youngest is
    preempted (pages freed, requeued as a continuation) and every request
    still reproduces its solo greedy oracle."""
    model, params = _model_and_params()
    long_prompt_a = [(7 * i) % 120 + 1 for i in range(122)]
    long_prompt_b = [(5 * i) % 120 + 1 for i in range(122)]
    eng = ServingEngine(
        model, params, max_batch=2, max_context=256,
        total_pages=1 + 3,  # scratch + 3: two 1-page rows, ONE can grow
    )
    r1 = eng.submit(long_prompt_a, max_new_tokens=10)
    r2 = eng.submit(long_prompt_b, max_new_tokens=10)
    out = eng.run()
    assert eng.preemptions >= 1, "pool pressure never triggered preemption"
    assert out[r1] == _oracle(model, params, long_prompt_a, 10)
    assert out[r2] == _oracle(model, params, long_prompt_b, 10)
    assert eng.allocator.num_used == 0


# ---------------- automatic prefix caching ----------------

SYSTEM_PROMPT = [(13 * i) % 120 + 1 for i in range(300)]  # 2 full 128-pages


def test_prefix_cache_unit():
    from vats_tpu.inference.serving import PrefixCache

    pc = PrefixCache()
    keys = PrefixCache.chain_keys(SYSTEM_PROMPT, 128, 2)
    assert pc.lookup(keys) == []
    assert pc.insert(keys[0], 7) and pc.insert(keys[1], 9)
    assert not pc.insert(keys[0], 11), "duplicate insert must be rejected"
    assert pc.lookup(keys) == [7, 9]
    # a diverging first page breaks the chain: nothing matches
    other = PrefixCache.chain_keys([5] + SYSTEM_PROMPT[1:], 128, 2)
    assert pc.lookup(other) == []
    # refcounted: held pages never reclaim; idle pages do, in LRU order
    pc.acquire(keys[:1])
    pc.release(keys)  # insert's refs: keys[0] -> 1 (still acquired), [1] -> 0
    assert pc.reclaim(4) == [9]
    pc.release(keys[:1])
    assert pc.reclaim(4) == [7]
    assert pc.num_cached == 0


def test_prefix_cache_sequential_hit_and_parity():
    """Second request with the same system prompt prefills only the tail,
    reuses the cached pages, and still reproduces its solo greedy oracle."""
    model, params = _model_and_params()
    eng = ServingEngine(
        model, params, max_batch=1, max_context=512, prefix_caching=True
    )
    tail_a, tail_b = [3, 1, 4, 1, 5], [2, 7, 1, 8, 2, 8]
    ra = eng.submit(SYSTEM_PROMPT + tail_a, max_new_tokens=6)
    out_a = eng.run()[ra]
    assert eng.prefix_cache.hit_tokens == 0
    assert eng.prefix_cache.num_cached == 2  # both full prompt pages parked
    rb = eng.submit(SYSTEM_PROMPT + tail_b, max_new_tokens=6)
    out_b = eng.run()[rb]
    assert eng.prefix_cache.hit_tokens == 256  # 2 pages reused, not re-run
    assert out_a == _oracle(model, params, SYSTEM_PROMPT + tail_a, 6, 512)
    assert out_b == _oracle(model, params, SYSTEM_PROMPT + tail_b, 6, 512)
    # shared pages stay resident (LRU) but no row holds them
    assert eng.allocator.num_used == eng.prefix_cache.num_cached


def test_prefix_cache_concurrent_share_and_reclaim():
    """Two rows decoding against the SAME physical prompt pages at once must
    both match their solo oracles (shared pages are immutable); afterwards a
    fresh prompt under pool pressure reclaims the idle cached pages."""
    model, params = _model_and_params()
    eng = ServingEngine(
        model, params, max_batch=2, max_context=512, prefix_caching=True,
        total_pages=1 + 5,  # scratch + 5: forces reclaim for the last prompt
    )
    tails = ([9, 9, 2], [4, 4, 4, 6])
    rids = [eng.submit(SYSTEM_PROMPT + t, max_new_tokens=5) for t in tails]
    out = eng.run()
    assert eng.prefix_cache.hit_tokens == 256, "row 2 missed the shared pages"
    for rid, t in zip(rids, tails):
        assert out[rid] == _oracle(model, params, SYSTEM_PROMPT + t, 5, 512)
    assert eng.prefix_cache.num_cached >= 2
    from vats_tpu.inference.serving import PrefixCache

    orig_keys = PrefixCache.chain_keys(SYSTEM_PROMPT, 128, 2)
    fresh = [(11 * i) % 120 + 1 for i in range(400)]  # needs 4 pages, 3 free
    rc = eng.submit(fresh, max_new_tokens=5)
    out_c = eng.run()[rc]
    assert out_c == _oracle(model, params, fresh, 5, 512)
    assert len(eng.prefix_cache.lookup(orig_keys)) < 2, (
        "pool pressure should have reclaimed idle cached pages"
    )
    assert eng.preemptions == 0


def test_decode_block_steps_matches_single_step():
    """k-step blocked decode (one jitted fori_loop, one host sync per block)
    must reproduce single-step outputs exactly — including budgets that are
    not multiples of k, EOS mid-block, and continuous batching across
    retirements."""
    model, params = _model_and_params()
    # discover an EOS that fires mid-block for prompt 0
    toks = _oracle(model, params, PROMPTS[0], 9)
    eos = toks[5]
    outs = {}
    for k in (1, 4):
        eng = ServingEngine(
            model, params, max_batch=2, max_context=256, eos_token_id=eos,
            decode_block_steps=k,
        )
        for i, p in enumerate(PROMPTS):
            eng.submit(p, max_new_tokens=7 + i)
        outs[k] = eng.run()  # rids are assigned identically in both engines
        assert eng.allocator.num_used == 0
    assert outs[1] == outs[4]


def test_decode_block_near_context_cap_falls_back():
    """A row within k of max_context must not overrun its page table: the
    engine falls back to single steps and the row finishes at the cap."""
    model, params = _model_and_params()
    prompt = [(3 * i) % 120 + 1 for i in range(120)]
    eng = ServingEngine(
        model, params, max_batch=1, max_context=128, decode_block_steps=4
    )
    rid = eng.submit(prompt, max_new_tokens=64)  # cap at 128 ctx first
    out = eng.run()[rid]
    assert len(out) == 128 - 120  # stopped by max_context, not budget
    solo = _oracle(model, params, prompt, 64, 128)
    assert out == solo[: len(out)]


# ---------------- speculative decoding (prompt-lookup drafts) ----------------


def test_spec_decode_matches_greedy_exactly():
    """spec_k must be a pure accelerator: outputs identical to single-step
    greedy for every request, whatever the draft acceptance pattern."""
    model, params = _model_and_params()
    outs = {}
    for spec in (0, 3):
        eng = ServingEngine(
            model, params, max_batch=2, max_context=256, spec_k=spec
        )
        for i, p in enumerate(PROMPTS):
            eng.submit(p, max_new_tokens=8 + i)
        outs[spec] = eng.run()
        assert eng.allocator.num_used == 0
    assert outs[0] == outs[3]


def test_spec_decode_accepts_on_repetitive_context():
    """A strongly periodic prompt makes the model's greedy continuation
    periodic too; prompt-lookup drafts should then be accepted (>0) and the
    result still match the oracle."""
    model, params = _model_and_params()
    period = [17, 42, 99, 5]
    prompt = (period * 12)[:45]  # repetitive, off-period cut
    eng = ServingEngine(
        model, params, max_batch=1, max_context=256, spec_k=4
    )
    rid = eng.submit(prompt, max_new_tokens=24)
    out = eng.run()[rid]
    assert out == _oracle(model, params, prompt, 24)
    assert eng.spec_proposed > 0


def test_spec_decode_rejects_sampling():
    model, params = _model_and_params()
    with pytest.raises(ValueError):
        ServingEngine(
            model, params, max_batch=1, max_context=256, spec_k=2,
            do_sample=True,
        )
    with pytest.raises(ValueError):
        ServingEngine(
            model, params, max_batch=1, max_context=256, spec_k=2,
            decode_block_steps=4,
        )


def test_batched_admission_group_parity():
    """Six simultaneous admissions prefill as one padded group (rpad=8, two
    scratch padding rows); every request still matches its solo oracle."""
    model, params = _model_and_params()
    eng = ServingEngine(model, params, max_batch=8, max_context=256)
    prompts = PROMPTS + [[42] * 19]
    rids = [eng.submit(p, max_new_tokens=6) for p in prompts]
    out = eng.run()
    assert len(eng._jit_prefill) == 1, "one (bucket, rpad) program expected"
    (bucket, rpad), = eng._jit_prefill.keys()
    assert rpad == 8
    for rid, p in zip(rids, prompts):
        assert out[rid] == _oracle(model, params, p, 6)
    assert eng.allocator.num_used == 0


def test_prefix_reclaim_never_evicts_matched_pages():
    """Regression (round-3 advisor, high): _admit must pin the looked-up
    prefix pages BEFORE reclaiming under memory pressure.  The unfixed code
    ran _reclaim() between lookup() and acquire(), so the refcount-0 matched
    pages (parked in LRU) could be evicted and re-allocated as the same
    row's tail pages — page aliasing that corrupts the shared prefix KV."""
    model, params = _model_and_params()
    eng = ServingEngine(
        model, params, max_batch=1, max_context=512, prefix_caching=True,
        total_pages=1 + 4,  # scratch + 4-page pool, sized to force reclaim
    )
    ra = eng.submit(SYSTEM_PROMPT, max_new_tokens=5)
    out_a = eng.run()[ra]
    assert out_a == _oracle(model, params, SYSTEM_PROMPT, 5, 512)
    assert eng.prefix_cache.num_cached == 2  # both full pages parked
    decoy = [(7 * i) % 120 + 1 for i in range(130)]  # 1 cacheable page
    rd = eng.submit(decoy, max_new_tokens=4)
    assert eng.run()[rd] == _oracle(model, params, decoy, 4, 512)
    assert eng.prefix_cache.num_cached == 3
    assert eng.allocator.num_free == 1
    # B: matches BOTH system-prompt pages, needs 2 more with only 1 free —
    # reclaim must evict the decoy's idle page, never the matched ones
    tail = [(5 * i) % 120 + 1 for i in range(90)]
    pb = SYSTEM_PROMPT + tail  # 390 tokens -> 4 page slots, 2 cached
    rb = eng.submit(pb, max_new_tokens=5)
    out_b = eng.run()[rb]
    assert eng.prefix_cache.hit_tokens == 256, "prefix hit expected"
    assert out_b == _oracle(model, params, pb, 5, 512)
    # pool accounting stayed coherent: every allocated page is cache-owned
    assert eng.allocator.num_used == eng.prefix_cache.num_cached


def test_decode_block_spanning_multiple_new_pages():
    """Regression (round-3 advisor, medium): when one _ensure_pages call
    allocates 2+ pages (decode_block_steps > page_size), EACH new page must
    get its own page-table slot — the unfixed code wrote every page to the
    final slot, leaving intermediate slots on the scratch page."""
    model, params = _model_and_params()
    eng = ServingEngine(
        model, params, max_batch=1, max_context=512,
        decode_block_steps=260,  # lookahead spans 2 fresh 128-token pages
    )
    prompt = PROMPTS[2]
    rid = eng.submit(prompt, max_new_tokens=260)
    out = eng.run()[rid]
    assert out == _oracle(model, params, prompt, 260, 512)
    assert eng.allocator.num_used == 0


# ---------------- per-request sampling ----------------


def test_per_request_sampling_mixed_batch():
    """Two requests with DIFFERENT sampling params share one batch: the
    greedy request must still match its solo greedy oracle exactly, and the
    sampled request's (seed, position)-keyed stream must be identical to
    what it produces running alone — batch-composition invariance."""
    from vats_tpu.inference.serving import SamplingParams

    model, params = _model_and_params()
    greedy = SamplingParams(temperature=0.0)
    sampled = SamplingParams(temperature=1.0, top_k=8, seed=1234)

    eng = ServingEngine(
        model, params, max_batch=2, max_context=256,
        per_request_sampling=True,
    )
    ra = eng.submit(PROMPTS[0], max_new_tokens=10, sampling=greedy)
    rb = eng.submit(PROMPTS[2], max_new_tokens=12, sampling=sampled)
    out = eng.run()
    assert out[ra] == _oracle(model, params, PROMPTS[0], 10)
    # the sampled row really sampled (emitted some non-greedy token)
    assert len(out[rb]) == 12

    solo = ServingEngine(
        model, params, max_batch=2, max_context=256,
        per_request_sampling=True,
    )
    rs = solo.submit(PROMPTS[2], max_new_tokens=12, sampling=sampled)
    assert solo.run()[rs] == out[rb], (
        "seeded stream must not depend on batchmates"
    )


def test_per_request_sampling_defaults_and_validation():
    from vats_tpu.inference.serving import SamplingParams

    model, params = _model_and_params()
    # engine-wide greedy default flows into rows submitted without params
    eng = ServingEngine(
        model, params, max_batch=2, max_context=256,
        per_request_sampling=True,
    )
    rids = [eng.submit(p, max_new_tokens=6) for p in PROMPTS[:2]]
    out = eng.run()
    for rid, p in zip(rids, PROMPTS[:2]):
        assert out[rid] == _oracle(model, params, p, 6)
    # SamplingParams on a uniform-sampling engine is an error
    eng2 = ServingEngine(model, params, max_batch=1, max_context=256)
    with pytest.raises(ValueError):
        eng2.submit(PROMPTS[0], max_new_tokens=4, sampling=SamplingParams())
    # spec decode is greedy-only: per-request sampling is rejected
    with pytest.raises(ValueError):
        ServingEngine(
            model, params, max_batch=1, max_context=256, spec_k=2,
            per_request_sampling=True,
        )


# ---------------- overlapped (pipelined) host scheduling ----------------


def test_overlap_scheduling_bitexact_greedy():
    """overlap_scheduling pipelines block N+1's dispatch ahead of block N's
    fetch; every request must still reproduce its solo generate_paged
    tokens exactly — across mixed budgets, EOS mid-block, retirement and
    re-admission into freed rows."""
    model, params = _model_and_params()
    toks = _oracle(model, params, PROMPTS[0], 9)
    eos = toks[5]
    outs = {}
    for overlap in (False, True):
        eng = ServingEngine(
            model, params, max_batch=2, max_context=256, eos_token_id=eos,
            decode_block_steps=4, overlap_scheduling=overlap,
        )
        for i, p in enumerate(PROMPTS):
            eng.submit(p, max_new_tokens=7 + i)
        outs[overlap] = eng.run()
        assert eng.allocator.num_used == 0
        assert eng._inflight is None or not overlap
    assert outs[False] == outs[True]
    # and the overlapped outputs equal each request's solo oracle
    # (truncated at the first EOS occurrence, like the engine stops)
    for i, p in enumerate(PROMPTS):
        want = [int(t) for t in _oracle(model, params, p, 7 + i)]
        if eos in want:
            want = want[: want.index(eos) + 1]
        assert outs[True][i] == want


def test_overlap_scheduling_seeded_sampling_reproducible():
    """Seeded per-request rows draw by (seed, position): the pipelined
    engine must produce the same streams as the sequential one."""
    from vats_tpu.inference.serving import SamplingParams

    model, params = _model_and_params()
    outs = {}
    for overlap in (False, True):
        eng = ServingEngine(
            model, params, max_batch=2, max_context=256,
            decode_block_steps=4, per_request_sampling=True,
            overlap_scheduling=overlap,
        )
        for i, p in enumerate(PROMPTS):
            eng.submit(
                p, max_new_tokens=9,
                sampling=SamplingParams(temperature=0.8, top_k=20, seed=100 + i),
            )
        outs[overlap] = eng.run()
    assert outs[False] == outs[True]


def test_overlap_scheduling_preemption_parity():
    """Pool pressure mid-pipeline: preemption + requeue must still
    reproduce greedy solo outputs (the in-flight block keeps decoding the
    victim's stale lane; its results are dropped by request identity)."""
    model, params = _model_and_params()
    eng = ServingEngine(
        model, params, max_batch=3, max_context=256, total_pages=5,
        decode_block_steps=2, overlap_scheduling=True,
    )
    rids = {}
    for p in PROMPTS[:4]:
        rids[eng.submit(p, max_new_tokens=40)] = p
    outs = eng.run()
    assert eng.allocator.num_used == 0
    for rid, p in rids.items():
        assert outs[rid] == _oracle(model, params, p, 40)

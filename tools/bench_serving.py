#!/usr/bin/env python
"""Benchmark: the continuous-batching ServingEngine on one chip.

Measures the engine (vats_tpu/inference/serving.py) — the runtime that
replaces the reference's fixed-batch eager loop
(/root/reference/src/transformers/nlp/inference/generate.py:92-236) — at the
headline medium MoE tier (d1440/20L E=8 top-2, 4.19B params bf16):

  * Poisson-arrival throughput + per-request p50/p99 latency
    (decode_block_steps=4, per-request sampling)
  * decode_block_steps sweep k in {1, 4, 8} (host-sync amortization)
  * automatic prefix caching: cold vs warm wave with a shared 256-token
    system prompt, hit rate
  * speculative decoding (prompt-lookup drafts, greedy): acceptance rate
    and tokens/s vs the same engine without drafts

Prints a JSON line after EVERY scenario (cumulative dict; the caller —
bench.py — parses the last line, so a timeout records partial results).
Internal wall-clock budget: env BENCH_SERVING_BUDGET_S (default 420 s).

Env: BENCH_SERVING_SMOKE=1 runs tiny shapes on CPU.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T0 = time.monotonic()
BUDGET_S = float(os.environ.get("BENCH_SERVING_BUDGET_S", "420"))

RESULTS = {}


def remaining():
    return BUDGET_S - (time.monotonic() - T0)


def emit():
    print(json.dumps(RESULTS), flush=True)


def main():
    import jax
    import numpy as np

    smoke = os.environ.get("BENCH_SERVING_SMOKE", "") == "1"
    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache_cpu" if smoke else ".jax_cache",
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001
        pass
    if smoke:
        jax.config.update("jax_platforms", "cpu")

    from vats_tpu.configs import nlp_medium, nlp_xsmall
    from vats_tpu.inference.serving import SamplingParams, ServingEngine
    from vats_tpu.models import TextLM

    rng = np.random.default_rng(0)

    if smoke:
        cfg = nlp_xsmall(
            d_model=64, num_heads=4, query_groups=2, d_ffn=128, num_layers=2,
            vocab_size=128, dropout=0.0, num_experts=1, top_k=1,
            max_seq_len=512, use_mqa=False, gradient_checkpointing=False,
            dtype="float32", param_dtype="float32",
        )
        max_batch, n_req, max_new = 4, 10, 12
        sys_prompt_len, arrival_gap_s = 128, 0.01
    else:
        cfg = nlp_medium(
            dropout=0.0, num_experts=8, top_k=2, param_dtype="bfloat16",
            capacity_factor=1.25, gradient_checkpointing=False,
            max_seq_len=384, left_window=-1, use_mqa=False,
        )
        # B=128 rows + blocked decode amortize the per-sync host cost —
        # through this container's remote-TPU relay every scheduler sync
        # costs ~60 ms of round trip on top of the ~20 ms device step, so
        # un-amortized scenarios are relay-bound, not chip-bound (the
        # block-steps sweep quantifies exactly this)
        max_batch, n_req, max_new = 128, 192, 96
        sys_prompt_len, arrival_gap_s = 256, 0.015

    model = TextLM(cfg)
    import jax.numpy as jnp

    params = model.init(jax.random.PRNGKey(1), jnp.ones((1, 8), jnp.int32))
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    RESULTS["config"] = (
        f"d{cfg.d_model}/{cfg.num_layers}L E{cfg.num_experts}top{cfg.top_k} "
        f"({n_params/1e9:.2f}B bf16), max_batch={max_batch}, "
        f"max_context={cfg.max_seq_len}, page_size=128"
    )

    def prompt(n):
        return [int(x) for x in rng.integers(1, cfg.vocab_size, size=n)]

    def make_engine(**kw):
        eng = ServingEngine(
            model, params, max_batch=max_batch,
            max_context=cfg.max_seq_len, page_size=128,
            prompt_buckets=(128, 384), **kw,
        )
        eng.MAX_PREFILL_GROUP = 4  # bound rpad programs to {1, 2, 4}
        return eng

    sp = SamplingParams(temperature=0.8, top_k=50, seed=7)

    # overlap_scheduling: block N+1 dispatches before block N's fetch, so
    # the ~60-100 ms relay round-trip + host scheduling hide behind device
    # compute (VERDICT r4 next-step #6)
    eng = make_engine(prefix_caching=True, per_request_sampling=True,
                      overlap_scheduling=True)

    # ---- warmup: compile each scenario's programs just before it runs, so
    # an expired budget still records the earlier scenarios (cold compiles
    # at this tier run minutes each through the remote-TPU relay)
    def drain(e):
        done = {}
        while e.queue or any(r is not None for r in e.row_request):
            for req in e.step():
                done[req.rid] = req
        return done

    def warm(e, k, plens):
        e.decode_block_steps = k
        for n in (1, 2, 4):
            for _ in range(n):
                e.submit(prompt(plens), max_new_tokens=4, sampling=sp)
            drain(e)

    # scenario 1's programs: prefill rpads {1,2,4} + its decode block size
    warm(eng, 8 if not smoke else 4, 100)
    RESULTS["warmup_s"] = round(time.monotonic() - T0, 1)
    emit()

    # ---- scenario 1: Poisson arrivals, throughput + latency ----
    def scenario_poisson():
        eng.decode_block_steps = 8 if not smoke else 4
        gaps = rng.exponential(arrival_gap_s, size=n_req)
        arrivals = np.cumsum(gaps)
        plens = rng.integers(90, 128, size=n_req)
        submit_t, finish_t, out_toks = {}, {}, {}
        t_start = time.perf_counter()
        i = 0
        while len(finish_t) < n_req:
            now = time.perf_counter() - t_start
            while i < n_req and arrivals[i] <= now:
                rid = eng.submit(
                    prompt(int(plens[i])), max_new_tokens=max_new,
                    sampling=SamplingParams(temperature=0.8, top_k=50, seed=i),
                )
                submit_t[rid] = time.perf_counter()
                i += 1
            if eng.queue or any(r is not None for r in eng.row_request):
                for req in eng.step():
                    finish_t[req.rid] = time.perf_counter()
                    out_toks[req.rid] = len(req.output_ids)
            elif i < n_req:
                time.sleep(max(0.0, arrivals[i] - (time.perf_counter() - t_start)))
        total_tokens = sum(out_toks.values())
        wall = max(finish_t.values()) - t_start
        lats = sorted(finish_t[r] - submit_t[r] for r in finish_t)
        RESULTS["poisson"] = {
            "tokens_per_sec": round(total_tokens / wall, 1),
            "p50_latency_s": round(lats[len(lats) // 2], 3),
            "p99_latency_s": round(lats[min(len(lats) - 1, int(len(lats) * 0.99))], 3),
            "n_requests": n_req,
            "max_new_tokens": max_new,
            "mean_arrival_gap_s": arrival_gap_s,
            "preemptions": eng.preemptions,
        }

    if remaining() > 30:
        scenario_poisson()
        emit()

    # ---- scenario 2: decode_block_steps sweep (host-sync amortization) ----
    def scenario_blocks():
        sweep = {}
        for k in (1, 8, 16):
            if remaining() < 20:
                break
            # compile this k's decode program off the clock
            eng.decode_block_steps = k
            eng.submit(prompt(100), max_new_tokens=max(4, k), sampling=sp)
            drain(eng)
            rids = [
                eng.submit(prompt(100), max_new_tokens=max_new,
                           sampling=SamplingParams(0.8, 50, seed=100 + j))
                for j in range(min(64, max_batch))
            ]
            t0 = time.perf_counter()
            done = drain(eng)
            dt = time.perf_counter() - t0
            toks = sum(len(done[r].output_ids) for r in rids)
            sweep[f"k{k}"] = round(toks / dt, 1)
        RESULTS["block_sweep_tokens_per_sec"] = sweep

    if remaining() > 60:
        scenario_blocks()
        emit()

    # ---- scenario 3: prefix caching, cold vs warm wave ----
    def scenario_prefix():
        # 384-bucket prefill programs (the cold wave's 296-token tails)
        warm(eng, 8 if not smoke else 4, 296)
        system = prompt(sys_prompt_len)
        waves = []
        hit0 = eng.prefix_cache.hit_tokens
        q0 = eng.prefix_cache.query_tokens
        n_wave = 32 if not smoke else 8
        for _wave in range(2):
            rids = [
                eng.submit(system + prompt(40), max_new_tokens=max_new,
                           sampling=SamplingParams(0.8, 50, seed=200 + j))
                for j in range(n_wave)
            ]
            t0 = time.perf_counter()
            done = drain(eng)
            dt = time.perf_counter() - t0
            toks = sum(len(done[r].output_ids) for r in rids)
            waves.append(round(toks / dt, 1))
        hit = eng.prefix_cache.hit_tokens - hit0
        q = eng.prefix_cache.query_tokens - q0
        RESULTS["prefix_cache"] = {
            "cold_wave_tokens_per_sec": waves[0],
            "warm_wave_tokens_per_sec": waves[1],
            "hit_rate": round(hit / max(q, 1), 3),
            "system_prompt_tokens": sys_prompt_len,
        }

    if remaining() > 45:
        scenario_prefix()
        emit()

    # ---- scenario 4: speculative decoding on repetitive text ----
    def scenario_spec():
        spec_eng = make_engine(spec_k=4)
        period = prompt(5)
        spec_prompts = [
            (period * 30)[: int(rng.integers(90, 126))] for _ in range(16)
        ]
        # warm both program sets (spec verify + plain decode)
        spec_eng.submit(spec_prompts[0][:100], max_new_tokens=4)
        drain(spec_eng)
        spec_eng.spec_k = 0
        spec_eng.submit(spec_prompts[0][:100], max_new_tokens=4)
        drain(spec_eng)
        res = {}
        for spec in (0, 4):
            if remaining() < 15:
                return
            spec_eng.spec_k = spec
            p0, a0 = spec_eng.spec_proposed, spec_eng.spec_accepted
            rids = [
                spec_eng.submit(p, max_new_tokens=max_new)
                for p in spec_prompts
            ]
            t0 = time.perf_counter()
            done = drain(spec_eng)
            dt = time.perf_counter() - t0
            toks = sum(len(done[r].output_ids) for r in rids)
            res[f"spec{spec}_tokens_per_sec"] = round(toks / dt, 1)
            if spec:
                prop = spec_eng.spec_proposed - p0
                acc = spec_eng.spec_accepted - a0
                res["acceptance_rate"] = round(acc / max(prop, 1), 3)
        res["speedup"] = round(
            res.get("spec4_tokens_per_sec", 0.0)
            / max(res.get("spec0_tokens_per_sec", 1.0), 1e-9), 2,
        )
        RESULTS["spec_decode_greedy_repetitive"] = res

    if remaining() > 60:
        scenario_spec()
        emit()

    RESULTS["wall_s"] = round(time.monotonic() - T0, 1)
    emit()


if __name__ == "__main__":
    main()

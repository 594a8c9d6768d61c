#!/usr/bin/env python
"""Probe: reference-medium-MoE-tier decode throughput on the real chip.

Sizes the round-2 bench (VERDICT item 2): nlp_medium shapes + E=8 top-2
(~4.2B params, bf16) — the largest MoE config that comfortably fits one
v5e's 16 GB HBM with a serving KV cache.  Times:
  * dense-cache generate, exact top-k
  * paged generate (Pallas decode kernel)
  * greedy (no sampling) decode to isolate sampling cost
Prints one JSON line per measurement.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(os.environ.get("PROBE_BATCH", "64"))
PROMPT_LEN = 128
DECODE_STEPS = 256


def timed(label, fn, n_iters=2, extra=None):
    import jax

    t0 = time.perf_counter()
    out = fn(0)
    jax.device_get(out[0])
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(1, n_iters + 1):
        out = fn(i)
        jax.device_get(out[0])
    dt = time.perf_counter() - t0
    toks = BATCH * DECODE_STEPS * n_iters
    rec = {
        "probe": label,
        "toks_per_sec": round(toks / dt, 1),
        "step_ms": round(dt / n_iters / DECODE_STEPS * 1e3, 3),
        "compile_s": round(compile_s, 1),
        "batch": BATCH,
    }
    if extra:
        rec.update(extra)
    print(json.dumps(rec), flush=True)
    return toks / dt


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    )
    from vats_tpu.configs import nlp_medium
    from vats_tpu.inference.generate import generate, generate_paged
    from vats_tpu.models import TextLM

    cfg = nlp_medium(
        dropout=0.0,
        num_experts=8,
        top_k=2,
        param_dtype="bfloat16",
        capacity_factor=1.25,
        gradient_checkpointing=False,
        max_seq_len=PROMPT_LEN + DECODE_STEPS,
        left_window=-1,
        use_mqa=False,
    )
    model = TextLM(cfg)
    rng = jax.random.PRNGKey(0)
    prompt = jax.random.randint(rng, (BATCH, PROMPT_LEN), 1, cfg.vocab_size)
    t0 = time.perf_counter()
    params = model.init(jax.random.PRNGKey(1), prompt[:1, :8])
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    if os.environ.get("PROBE_QUANT", "") == "int8":
        from vats_tpu.inference.quantize import QuantizedModel, quantize_params

        params = quantize_params(params)
        model = QuantizedModel(model)
    print(json.dumps({"probe": "init", "params_b": round(n_params / 1e9, 3),
                      "quant": os.environ.get("PROBE_QUANT", "none"),
                      "init_s": round(time.perf_counter() - t0, 1)}), flush=True)

    common = dict(
        max_new_tokens=DECODE_STEPS,
        pad_token_id=0,
        eos_token_id=None,
        total_len=PROMPT_LEN + DECODE_STEPS,
    )

    def run_dense(seed):
        return generate(model, params, prompt, None, jax.random.PRNGKey(seed),
                        do_sample=True, temperature=0.8, top_k=50, **common)

    def run_dense_greedy(seed):
        return generate(model, params, prompt, None, jax.random.PRNGKey(seed),
                        do_sample=False, temperature=0.0, top_k=None, **common)

    page_size = int(os.environ.get("PROBE_PAGE_SIZE", "16"))

    def run_paged(seed):
        return generate_paged(model, params, prompt, None,
                              jax.random.PRNGKey(seed),
                              do_sample=True, temperature=0.8, top_k=50,
                              page_size=page_size, **common)

    only = os.environ.get("PROBE_ONLY", "")
    if only != "paged":
        timed("dense_exact_topk", run_dense)
        timed("dense_greedy", run_dense_greedy)
    timed("paged_exact_topk", run_paged, extra={"page_size": page_size})


if __name__ == "__main__":
    main()
